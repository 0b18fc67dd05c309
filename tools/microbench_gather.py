#!/usr/bin/env python
"""On-chip microbenchmarks of the HBM gather engine: row width x table
rows, bf16/f32 — the decision data for window-form conv applies.

Questions this answers (PLAN.md round-4):
  * where exactly does the per-row descriptor plateau end (256 B was the
    round-2 estimate) and what is the slope past it — i.e. is a 3-row
    window at C=64 bf16 (384 B) 1.5x a plateau row or 4x?
  * how does the rate fall with TABLE rows (the round-3c cliff: 167 vs
    354 Mrows/s for 6N vs N rows) — the feasibility bound for
    dense-position-grid joins (tens of Mrows tables, 4-12 B rows).

Timing pattern per PLAN.md: the relay memoizes identical (executable,
args) calls, so every timed call varies the payload by seed and forces
host materialization; each timing is min of --reps of a fori_loop of
--iters gathers.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=84992,
                    help="gathered rows per pass (output count)")
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--only", default=None, help="comma list: width,rows")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    m = args.m
    rng = np.random.default_rng(0)

    def timed(name, fn, *fargs):
        jfn = jax.jit(fn)
        out = jfn(jnp.int32(0), *fargs)
        np.asarray(out)
        ts = []
        for s in range(1, args.reps + 1):
            t0 = time.perf_counter()
            out = jfn(jnp.int32(s * 1000), *fargs)
            np.asarray(out)
            ts.append(time.perf_counter() - t0)
        per = min(ts) / args.iters * 1000
        return per

    def loop(body):
        def f(seed, *fargs):
            def it(i, acc):
                return acc + body(seed + i, *fargs)
            return jax.lax.fori_loop(0, args.iters, it, jnp.float32(0))
        return f

    only = set(args.only.split(",")) if args.only else None

    def want(k):
        return only is None or k in only

    if want("width"):
        print(f"# width sweep: {m} random-row gathers from an {m}-row table")
        print(f"# {'dtype':8s} {'lanes':>5s} {'bytes':>5s} {'ms':>8s} "
              f"{'Mrows/s':>8s} {'GB/s':>7s}")
        for dt, isz in (("bfloat16", 2), ("float32", 4)):
            for lanes in (32, 64, 96, 128, 160, 192, 256, 384):
                wbytes = lanes * isz
                tbl = jnp.asarray(
                    rng.standard_normal((m, lanes)), dt)
                idx = jnp.asarray(rng.integers(0, m, m), jnp.int32)

                def body(seed, tbl, idx):
                    t2 = tbl.at[0, 0].add(seed.astype(tbl.dtype) * 1e-6)
                    out = t2[idx]
                    return jnp.sum(out[::1024, :1].astype(jnp.float32))

                def base(seed, tbl, idx):
                    t2 = tbl.at[0, 0].add(seed.astype(tbl.dtype) * 1e-6)
                    return jnp.sum(t2[::1024, :1].astype(jnp.float32))

                ms = timed(f"w{wbytes}", loop(body), tbl, idx) \
                    - timed(f"w{wbytes}b", loop(base), tbl, idx)
                rate = m / ms / 1e3
                bw = m * wbytes / ms / 1e6
                print(f"  {dt:8s} {lanes:5d} {wbytes:5d} {ms:8.3f} "
                      f"{rate:8.0f} {bw:7.1f}")

    if want("rows"):
        print(f"# table-rows sweep: {m} random gathers, 4/16-lane int32 "
              f"rows (dense-position-grid join shapes)")
        print(f"# {'rows':>9s} {'lanes':>5s} {'ms':>8s} {'Mrows/s':>8s}")
        for nrows in (84992, 262144, 1048576, 4194304, 16777216, 41943040):
            for lanes in (4, 16):
                tbl = jnp.asarray(
                    rng.integers(0, 2**20, (nrows, lanes)), jnp.int32)
                idx = jnp.asarray(rng.integers(0, nrows, m), jnp.int32)

                def body(seed, tbl, idx):
                    t2 = tbl.at[0, 0].add(seed % 2)
                    out = t2[idx]
                    return jnp.sum(out[::1024, :1]).astype(jnp.float32)

                def base(seed, tbl, idx):
                    t2 = tbl.at[0, 0].add(seed % 2)
                    return jnp.sum(t2[::1024, :1]).astype(jnp.float32)

                ms = timed(f"n{nrows}", loop(body), tbl, idx) \
                    - timed(f"n{nrows}b", loop(base), tbl, idx)
                rate = m / ms / 1e3
                print(f"  {nrows:9d} {lanes:5d} {ms:8.3f} {rate:8.0f}")


if __name__ == "__main__":
    main()
