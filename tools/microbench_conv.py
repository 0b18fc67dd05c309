#!/usr/bin/env python
"""On-chip microbenchmarks of the sparse-conv primitives: old vs new paths.

Times, at stem scale (N voxels, C channels, ks3 = 27 taps):
  * build_table           sorted fast path vs sort path
  * plan build (join)     bracketed search vs full binary search
  * conv apply            windowed-gather form vs per-tap gather scan
  * end-to-end conv3d     sorted vs unsorted tensor

Pattern per PLAN.md: the TPU relay memoizes identical (executable, args)
calls and its block_until_ready is unreliable, so every timed call varies
an input seed and the timing forces host materialization. Each timing is
the min of --reps outer reps of a lax.fori_loop of --iters iterations.
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
    ap.add_argument("--n", type=int, default=81920)
    ap.add_argument("--c", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--only", default=None,
                    help="comma list: table,join,apply,conv")
    ap.add_argument("--sample", type=int, default=None,
                    help="override coords.BRACKET_SAMPLE")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from link_tpu.data.semantic_kitti import SyntheticSemanticKITTI
    from link_tpu.data.collate import collate_scans
    from link_tpu.sparse import coords as coordlib
    from link_tpu.sparse import conv as C
    from link_tpu.sparse.tensor import make_sparse_tensor

    if args.sample:
        coordlib.BRACKET_SAMPLE = args.sample

    n, ch = args.n, args.c
    ds = SyntheticSemanticKITTI(length=1, num_points=n - 512,
                                n_raw_points=int(n * 1.5), voxel_size=0.1,
                                split="train")
    b = collate_scans([ds[0]], n)
    coords = jnp.asarray(b["coords"])
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((n, ch)), args.dtype)
    w = jnp.asarray(
        np.random.default_rng(1).standard_normal((27, ch, ch)) * 0.1,
        args.dtype)
    offsets = coordlib.kernel_offsets_np(3, stride=1)

    def timed(name, fn, *fargs):
        jfn = jax.jit(fn)
        out = jfn(jnp.int32(0), *fargs)
        jax.tree_util.tree_map(
            lambda x: np.asarray(x) if hasattr(x, "shape") else x, out)
        ts = []
        for s in range(1, args.reps + 1):
            t0 = time.perf_counter()
            out = jfn(jnp.int32(s * 1000), *fargs)
            jax.tree_util.tree_map(
                lambda x: np.asarray(x) if hasattr(x, "shape") else x, out)
            ts.append(time.perf_counter() - t0)
        per = min(ts) / args.iters * 1000
        print(f"{name:44s} {per:8.2f} ms")
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

    if want("table"):
        def tbl(sorted_):
            def body(seed, coords):
                c2 = coords.at[0, 0].add(seed % 1)   # vary input
                t = coordlib.build_table(c2, assume_sorted=sorted_)
                return jnp.sum(t.rows[::1024, 2]).astype(jnp.float32)
            return body
        timed("build_table sort", loop(tbl(False)), coords)
        timed("build_table assume_sorted", loop(tbl(True)), coords)

    if want("join"):
        def join(sorted_q, ident, direct):
            def body(seed, coords):
                c2 = coords.at[0, 0].add(seed % 1)
                t = coordlib.build_table(c2, assume_sorted=ident,
                                         direct=direct)
                idx, bp, sl = coordlib.grouped_window_query(
                    t, c2, offsets, 1, queries_sorted=sorted_q,
                    identity_perm=ident, self_query=ident)
                return jnp.sum(idx[:, ::512]).astype(jnp.float32)
            return body
        timed("join full-search", loop(join(False, False, False)), coords)
        timed("join bracketed+identity",
              loop(join(True, True, False)), coords)
        timed("join direct+identity", loop(join(True, True, True)), coords)

        # query-only: table + index prebuilt OUTSIDE the loop; queries
        # jittered per iteration (defeats the relay memoizer)
        def joinq(direct):
            table = coordlib.build_table(coords, assume_sorted=True,
                                         direct=direct)
            def body(seed, coords):
                c2 = coords.at[0, 0].add(seed % 1)
                idx, bp, sl = coordlib.grouped_window_query(
                    table, c2, offsets, 1, queries_sorted=not direct,
                    identity_perm=False)
                return jnp.sum(idx[:, ::512]).astype(jnp.float32)
            return body
        timed("joinq bracketed (prebuilt)", loop(joinq(False)), coords)
        timed("joinq direct (prebuilt)", loop(joinq(True)), coords)

        def buildonly(direct):
            def body(seed, coords):
                c2 = coords.at[0, 0].add(seed % 1)
                t = coordlib.build_table(c2, assume_sorted=True,
                                         direct=direct)
                probe = t.direct.winlp[::512, 0] if direct \
                    else t.rows[::512, 2]
                return jnp.sum(probe).astype(jnp.float32)
            return body
        timed("build table (no index)", loop(buildonly(False)), coords)
        timed("build table + direct index", loop(buildonly(True)), coords)

    if want("apply"):
        table = coordlib.build_table(coords, assume_sorted=True)
        in_idx, base_pos, slot = coordlib.grouped_window_query(
            table, coords, offsets, 1, queries_sorted=True,
            identity_perm=True)
        groups = tuple(tuple(t for _, t in taps)
                       for _, taps in coordlib.offset_groups(offsets))
        from link_tpu.sparse.tensor import ConvPlan
        plan_old = ConvPlan(in_idx=in_idx, out_coords=coords,
                            out_nnz=jnp.int32(n), in_capacity=n,
                            out_capacity=n)
        mir = C.mirror_perm(offsets)
        plan_win = ConvPlan(in_idx=in_idx, out_coords=coords,
                            out_nnz=jnp.int32(n), in_capacity=n,
                            out_capacity=n, base_pos=base_pos, slot=slot,
                            groups=groups, mirror=mir)

        def apply_body(plan, train=False):
            def body(seed, feats, w):
                f2 = feats * (1 + seed.astype(feats.dtype) * 0)
                f2 = f2.at[0, 0].add(seed.astype(feats.dtype) * 1e-6)
                if not train:
                    out = C.apply_conv_plan(f2, w, plan)
                    return jnp.sum(out[::1024].astype(jnp.float32))

                def lo(f3):
                    out = C.apply_conv_plan(f3, w, plan)
                    return jnp.sum(out.astype(jnp.float32) ** 2)
                return jnp.sum(jax.grad(lo)(f2)[::1024].astype(jnp.float32))
            return body
        # plan_old: no mirror -> per-tap _gm_impl; plan_win: windowed
        # custom-VJP path when gfit >= G (narrow channels), else per-tap
        timed("apply per-tap scan", loop(apply_body(plan_old)), feats, w)
        timed("apply windowed", loop(apply_body(plan_win)), feats, w)
        # mirror without window form -> _gm per-tap custom VJP
        plan_mir = ConvPlan(in_idx=in_idx, out_coords=coords,
                            out_nnz=jnp.int32(n), in_capacity=n,
                            out_capacity=n, mirror=mir)
        timed("fwd+vjp per-tap", loop(apply_body(plan_mir, True)), feats, w)
        timed("fwd+vjp windowed", loop(apply_body(plan_win, True)), feats, w)

    if want("conv"):
        def conv(sorted_):
            def body(seed, feats, coords, w):
                c2 = coords.at[0, 0].add(seed % 1)
                st = make_sparse_tensor(feats, c2, nnz=jnp.int32(n - 512),
                                        base_sorted=sorted_)
                out = C.conv3d(st, w, kernel_size=3)
                return jnp.sum(out.feats[::1024].astype(jnp.float32))
            return body
        timed("conv3d e2e unsorted", loop(conv(False)), feats, coords, w)
        timed("conv3d e2e sorted+windowed", loop(conv(True)), feats,
              coords, w)


if __name__ == "__main__":
    main()
