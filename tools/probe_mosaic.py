#!/usr/bin/env python
"""Probe Mosaic/Pallas capabilities of the CURRENT toolchain on the real chip.

Round-2/3 concluded (on the then-current jaxlib) that no in-VMEM vector row
gather exists: `jnp.take(X(N,C), idx(Q,), axis=0)` beyond an 8-sublane tile
crashed the remote compiler, which left every sparse-conv formulation on the
~400-550 Mrows/s HBM gather-descriptor engine (PLAN.md roofline). This script
re-probes each capability empirically so the conclusion tracks the toolchain,
plus measures the achievable rates of every gather mechanism:

  A  in-kernel 2-D row gather  jnp.take(X, idx, axis=0), X in VMEM
  B  in-kernel 1-D gather      jnp.take(t, idx) (known-good, rate check)
  C  one-hot MXU gather        onehot(idx) @ X inside one kernel
  D  DMA issue rate            per-row / per-slab async copies HBM->VMEM
  E  XLA descriptor gather     x[idx] baseline for the same shapes

Each probe is wrapped so a compiler rejection is reported, not fatal.
"""

import argparse
import functools
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("jax", jax.__version__, "devices", jax.devices())

    only = set(args.only.split(",")) if args.only else None

    def want(k):
        return only is None or k in only

    def timed(name, fn, *fargs, rows=None, bytes_=None):
        """fn(seed, *fargs) -> scalar; returns ms per iter."""
        try:
            jfn = jax.jit(fn)
            out = jfn(jnp.int32(0), *fargs)
            np.asarray(out)
        except Exception as e:
            msg = str(e).split("\n")[0][:200]
            print(f"{name:58s} FAIL {type(e).__name__}: {msg}")
            return None
        ts = []
        for s in range(1, args.reps + 1):
            t0 = time.perf_counter()
            out = jfn(jnp.int32(s * 1000), *fargs)
            np.asarray(out)
            ts.append(time.perf_counter() - t0)
        per = min(ts) / args.iters * 1000
        extra = ""
        if rows:
            extra += f"  {rows / per / 1e3:9.1f} Mrows/s"
        if bytes_:
            extra += f"  {bytes_ / per / 1e6:7.1f} GB/s"
        print(f"{name:58s} {per:8.3f} ms{extra}")
        return per

    def loop(body):
        def f(seed, *fargs):
            def it(i, acc):
                return acc + body(seed + i, *fargs)
            return jax.lax.fori_loop(0, args.iters, it, jnp.float32(0))
        return f

    rng = np.random.default_rng(0)

    # ------------------------------------------------------------------ A
    # In-kernel 2-D row gather with the table pinned in VMEM.
    def probe_row_gather(n, c, q, dtype):
        x = jnp.asarray(rng.standard_normal((n, c)), dtype)
        idx = jnp.asarray(rng.integers(0, n, size=(q,)), jnp.int32)

        def kern(idx_ref, x_ref, o_ref):
            o_ref[:] = jnp.take(x_ref[:], idx_ref[:], axis=0)

        def call(seed, idx, x):
            idx2 = (idx + seed) % n
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((q, c), dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(idx2, x)
            return jnp.sum(out[::512, 0]).astype(jnp.float32)

        nb = np.dtype(dtype).itemsize * c * q * args.iters
        timed(f"A row-gather take(N={n},C={c},Q={q},{dtype})",
              loop(call), idx, x, rows=q * args.iters, bytes_=nb)

    # Correctness check first on one small case (compiled, on-chip).
    def check_row_gather():
        n, c, q = 4096, 128, 4096
        x = jnp.asarray(rng.standard_normal((n, c)), jnp.float32)
        idxn = rng.integers(0, n, size=(q,))
        idx = jnp.asarray(idxn, jnp.int32)

        def kern(idx_ref, x_ref, o_ref):
            o_ref[:] = jnp.take(x_ref[:], idx_ref[:], axis=0)
        try:
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((q, c), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(idx, x)
            ok = np.allclose(np.asarray(out), np.asarray(x)[idxn])
            print(f"A row-gather correctness (4096x128): "
                  f"{'OK' if ok else 'WRONG RESULTS'}")
            return ok
        except Exception as e:
            print("A row-gather 4096x128 FAIL "
                  f"{type(e).__name__}: {str(e).splitlines()[0][:200]}")
            return False

    if want("A"):
        if check_row_gather():
            for n in (8192, 32768, 86016):
                for dtype in ("float32", "bfloat16"):
                    probe_row_gather(n, 128, 32768, dtype)
            probe_row_gather(32768, 256, 32768, "bfloat16")
            probe_row_gather(86016, 64, 86016, "float32")

    # ------------------------------------------------------------------ B
    if want("B"):
        n, q = 86016, 86016
        t = jnp.asarray(rng.integers(0, 1 << 30, size=(n,)), jnp.int32)
        idx = jnp.asarray(rng.integers(0, n, size=(q,)), jnp.int32)

        def kern1d(idx_ref, t_ref, o_ref):
            o_ref[:] = jnp.take(t_ref[:], idx_ref[:], axis=0)

        def call(seed, idx, t):
            idx2 = (idx + seed) % n
            out = pl.pallas_call(
                kern1d,
                out_shape=jax.ShapeDtypeStruct((q,), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(idx2, t)
            return jnp.sum(out[::512]).astype(jnp.float32)

        timed(f"B 1-D gather take(N={n},Q={q},int32)", loop(call), idx, t,
              rows=q * args.iters)

    # ------------------------------------------------------------------ C
    # One-hot gather through the MXU: block of Q rows gathered from an
    # L-row window by onehot(Q,L) @ X(L,C).
    def probe_onehot(l, c, qb, dtype):
        x = jnp.asarray(rng.standard_normal((l, c)), dtype)
        idx = jnp.asarray(rng.integers(0, l, size=(qb,)), jnp.int32)

        def kern(idx_ref, x_ref, o_ref):
            cols = jax.lax.broadcasted_iota(jnp.int32, (qb, l), 1)
            oh = (cols == idx_ref[:].reshape(qb, 1)).astype(dtype)
            o_ref[:] = jnp.dot(oh, x_ref[:],
                               preferred_element_type=jnp.float32
                               ).astype(dtype)

        def call(seed, idx, x):
            idx2 = (idx + seed) % l
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((qb, c), dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(idx2, x)
            return jnp.sum(out[::64, 0]).astype(jnp.float32)

        timed(f"C one-hot MXU gather(L={l},C={c},Qb={qb},{dtype})",
              loop(call), idx, x, rows=qb * args.iters)

    if want("C"):
        for l in (2048, 8192):
            probe_onehot(l, 128, 2048, "bfloat16")
        probe_onehot(2048, 64, 4096, "bfloat16")

    # ------------------------------------------------------------------ D
    # DMA issue rate: G-row slab copies HBM->VMEM at dynamic offsets.
    def probe_dma(n, c, g, nslabs, dtype):
        x = jnp.asarray(rng.standard_normal((n, c)), dtype)
        offs = jnp.asarray(rng.integers(0, n - g, size=(nslabs,)), jnp.int32)

        def kern(offs_ref, x_hbm, o_ref, scratch, sem):
            def body(i, acc):
                off = offs_ref[i]
                cp = pltpu.make_async_copy(
                    x_hbm.at[pl.ds(off, g), :], scratch, sem)
                cp.start()
                cp.wait()
                return acc + scratch[0, 0].astype(jnp.float32)
            o_ref[0, 0] = jax.lax.fori_loop(0, nslabs, body, jnp.float32(0))

        def call(seed, offs, x):
            offs2 = (offs + seed) % (n - g)
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                scratch_shapes=[pltpu.VMEM((g, c), dtype),
                                pltpu.SemaphoreType.DMA],
            )(offs2, x)
            return out[0, 0]

        nb = np.dtype(dtype).itemsize * c * g * nslabs * args.iters
        timed(f"D DMA slabs(N={n},C={c},G={g},S={nslabs},{dtype})",
              loop(call), offs, x,
              rows=g * nslabs * args.iters, bytes_=nb)

    if want("D"):
        for g in (8, 64, 512):
            probe_dma(86016, 64, g, 512, "float32")

    # ------------------------------------------------------------------ E
    # XLA descriptor-engine gather baseline, same shapes as A.
    def probe_xla(n, c, q, dtype):
        x = jnp.asarray(rng.standard_normal((n, c)), dtype)
        idx = jnp.asarray(rng.integers(0, n, size=(q,)), jnp.int32)

        def call(seed, idx, x):
            idx2 = (idx + seed) % n
            out = x[idx2]
            return jnp.sum(out[::512, 0]).astype(jnp.float32)

        nb = np.dtype(dtype).itemsize * c * q * args.iters
        timed(f"E XLA gather(N={n},C={c},Q={q},{dtype})", loop(call), idx, x,
              rows=q * args.iters, bytes_=nb)

    if want("E"):
        probe_xla(86016, 128, 32768, "float32")
        probe_xla(86016, 64, 86016, "float32")
        probe_xla(86016, 64, 86016, "bfloat16")


if __name__ == "__main__":
    main()
