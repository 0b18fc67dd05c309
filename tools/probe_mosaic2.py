#!/usr/bin/env python
"""Probe round 2: shape-correct Mosaic gather forms + prefetch-driven DMA.

Probe 1 (tools/probe_mosaic.py) on jax 0.9.0 found:
  * in-kernel jnp.take raises "Only 2D gather is supported" -> a 2-D
    dynamic gather DOES exist on this toolchain; find its exact contract.
  * manual make_async_copy loops still HTTP-500 the remote compiler.
  * ~0.4 ms/call fixed overhead swamps small probes -> use big workloads.

This probes:
  A2  take_along_axis(x(N,C), idx(Q,C), axis=0)  various N,C,Q, dtypes
  A3  same but gather along lanes axis=1
  G   scalar-prefetch BlockSpec index_map dynamic block fetch (the
      pipelined-DMA gather: grid over Q blocks, each block's input offset
      comes from a prefetched index vector)
  O   per-pallas_call overhead (empty kernel, same loop harness)
  E2  XLA descriptor gather at 2.3M rows (round-3 comparable number)
"""

import argparse
import functools
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
        try:
            jfn = jax.jit(fn)
            out = jfn(jnp.int32(0), *fargs)
            np.asarray(out)
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
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
            extra += f"  {rows / args.iters / per / 1e3:9.1f} Mrows/s"
        if bytes_:
            extra += f"  {bytes_ / args.iters / per / 1e6:7.1f} GB/s"
        print(f"{name:58s} {per:8.3f} ms{extra}")
        return per

    def loop(body):
        def f(seed, *fargs):
            def it(i, acc):
                return acc + body(seed + i, *fargs)
            return jax.lax.fori_loop(0, args.iters, it, jnp.float32(0))
        return f

    rng = np.random.default_rng(0)

    # ------------------------------------------------------------------ O
    if want("O"):
        def kern(x_ref, o_ref):
            o_ref[:] = x_ref[:]
        x = jnp.zeros((8, 128), jnp.float32)

        def call(seed, x):
            out = pl.pallas_call(
                kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x + seed)
            return out[0, 0]
        timed("O empty pallas_call", loop(call), x)

        def call2(seed, x):
            return (x + seed)[0, 0]
        timed("O no kernel at all (loop floor)", loop(call2), x)

    # ----------------------------------------------------------------- A2
    def probe_tal(n, c, q, dtype, check=False):
        x = jnp.asarray(rng.standard_normal((n, c)), dtype)
        idxn = rng.integers(0, n, size=(q,))
        idx = jnp.asarray(idxn, jnp.int32)

        def kern(idx_ref, x_ref, o_ref):
            idx2d = jnp.broadcast_to(idx_ref[:].reshape(-1, 1),
                                     (idx_ref.shape[0], x_ref.shape[1]))
            o_ref[:] = jnp.take_along_axis(x_ref[:], idx2d, axis=0)

        def run(i):
            return pl.pallas_call(
                kern, out_shape=jax.ShapeDtypeStruct((q, c), dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(i, x)

        if check:
            try:
                out = np.asarray(jax.jit(run)(idx))
            except Exception as e:
                first = (str(e).splitlines() or ["<no message>"])[0][:160]
                print(f"A2 tal(N={n},C={c},Q={q},{dtype}) FAIL "
                      f"{type(e).__name__}: {first}")
                return False
            ok = np.allclose(out, np.asarray(x)[idxn])
            print(f"A2 tal(N={n},C={c},Q={q},{dtype}) correctness: "
                  f"{'OK' if ok else 'WRONG'}")
            return ok

        def call(seed, idx):
            out = run((idx + seed) % n)
            return jnp.sum(out[::512, 0]).astype(jnp.float32)

        nb = np.dtype(dtype).itemsize * c * q * args.iters
        timed(f"A2 tal(N={n},C={c},Q={q},{dtype})", loop(call), idx,
              rows=q * args.iters, bytes_=nb)
        return True

    if want("A2"):
        if probe_tal(4096, 128, 4096, "float32", check=True):
            probe_tal(32768, 128, 32768, "float32")
            probe_tal(32768, 128, 262144, "float32")
            probe_tal(86016, 128, 262144, "bfloat16")
            probe_tal(86016, 64, 262144, "float32")
            probe_tal(86016, 8, 262144, "float32")
        # known-edge shapes
        probe_tal(8, 128, 8, "float32", check=True)
        probe_tal(16, 128, 2048, "float32", check=True)

    # ----------------------------------------------------------------- A3
    if want("A3"):
        n, q = 2048, 2048
        x = jnp.asarray(rng.standard_normal((8, n)), jnp.float32)
        idxn = rng.integers(0, n, size=(8, q))
        idx = jnp.asarray(idxn, jnp.int32)

        def kern(idx_ref, x_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)

        def run(i):
            return pl.pallas_call(
                kern, out_shape=jax.ShapeDtypeStruct((8, q), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(i, x)
        try:
            out = np.asarray(jax.jit(run)(idx))
            ok = np.allclose(out, np.take_along_axis(
                np.asarray(x), idxn, axis=1))
            print(f"A3 lane-gather (8,{n}) axis=1: {'OK' if ok else 'WRONG'}")
        except Exception as e:
            print(f"A3 lane-gather FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}")

    # ------------------------------------------------------------------ G
    # Pipelined dynamic block fetch: grid over Q//BQ output blocks; the
    # input block index for step i comes from a scalar-prefetched vector.
    # This is the "contiguous window slot" DMA form: each output block
    # reads one (BW, C) input window starting at a dynamic block offset.
    def probe_pref(n, c, bw, q, bq, dtype):
        x = jnp.asarray(rng.standard_normal((n, c)), dtype)
        nblk = q // bq
        # window block index per output block (block units of bw rows)
        wb = jnp.asarray(rng.integers(0, n // bw, size=(nblk,)), jnp.int32)

        def kern(wb_ref, xw_ref, o_ref):
            o_ref[:] = xw_ref[0:bq, :]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblk,),
            in_specs=[pl.BlockSpec((bw, c), lambda i, wb_ref: (wb_ref[i], 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bq, c), lambda i, wb_ref: (i, 0),
                                   memory_space=pltpu.VMEM),
        )

        def call(seed, wb, x):
            wb2 = (wb + seed) % (n // bw)
            out = pl.pallas_call(
                kern, out_shape=jax.ShapeDtypeStruct((q, c), dtype),
                grid_spec=grid_spec,
            )(wb2, x)
            return jnp.sum(out[::512, 0]).astype(jnp.float32)

        nb = np.dtype(dtype).itemsize * c * bw * nblk * args.iters
        timed(f"G prefetch-fetch(N={n},C={c},BW={bw},blocks={nblk},{dtype})",
              loop(call), wb, x, rows=bw * nblk * args.iters, bytes_=nb)

    if want("G"):
        for bw in (8, 32, 128, 512):
            probe_pref(86016, 64, bw, 86016, 8, "float32")
        probe_pref(86016, 64, 512, 86016, 512, "float32")

    # ----------------------------------------------------------------- E2
    if want("E2"):
        n, c = 86016, 64
        reps_in = 27
        x = jnp.asarray(rng.standard_normal((n, c)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, n, size=(reps_in, n)), jnp.int32)

        def call(seed, idx, x):
            def tap(k, acc):
                out = x[(idx[k] + seed) % n]
                return acc + jnp.sum(out[::512, 0]).astype(jnp.float32)
            return jax.lax.fori_loop(0, reps_in, tap, jnp.float32(0))

        nb = 4 * c * n * reps_in * args.iters
        timed(f"E2 XLA gather 27x{n} rows f32", loop(call), idx, x,
              rows=reps_in * n * args.iters, bytes_=nb)


if __name__ == "__main__":
    main()
