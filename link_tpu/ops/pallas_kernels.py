"""Pallas TPU kernels for the sparse hot path.

Rationale (see SURVEY.md §7 phase 3): the XLA fallback implements joins and
sparse convs with random HBM gathers — the conv reads ~K*N*C*4 bytes of
random rows per layer and the join does log2(N) gather rounds over the
table. At LinK's sizes both tables fit in VMEM:

  * coord key table: 2 x int32 x 128k rows  = 1 MB
  * feature table:   64ch x 128k rows bf16  = 16 MB (f32 tiled by channel)

so these kernels pin the table in VMEM once and stream query/output tiles
through it, turning HBM-latency-bound code into VPU/MXU-bound code.

All kernels support interpret mode for CPU tests.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lower_bound_in_vmem(t_hi, t_lo, q_hi, q_lo, n_table: int):
    """Vectorized lower bound; t_* are (N,) arrays resident in VMEM."""
    steps = max(1, int(np.ceil(np.log2(n_table + 1))))
    lo = jnp.zeros(q_hi.shape, jnp.int32)
    hi = jnp.full(q_hi.shape, n_table, jnp.int32)

    def body(_, carry):
        lo_i, hi_i = carry
        mid = (lo_i + hi_i) >> 1
        mid_c = jnp.minimum(mid, n_table - 1)
        th = jnp.take(t_hi, mid_c, axis=0)
        tl = jnp.take(t_lo, mid_c, axis=0)
        less = (th < q_hi) | ((th == q_hi) & (tl < q_lo))
        return jnp.where(less, mid + 1, lo_i), jnp.where(less, hi_i, mid)

    lo, _ = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo


def _join_kernel(t_hi_ref, t_lo_ref, perm_ref, q_hi_ref, q_lo_ref, out_ref):
    t_hi = t_hi_ref[:]
    t_lo = t_lo_ref[:]
    n = t_hi.shape[0]
    q_hi = q_hi_ref[:]
    q_lo = q_lo_ref[:]
    pos = _lower_bound_in_vmem(t_hi, t_lo, q_hi, q_lo, n)
    pos_c = jnp.minimum(pos, n - 1)
    hit = ((jnp.take(t_hi, pos_c, axis=0) == q_hi)
           & (jnp.take(t_lo, pos_c, axis=0) == q_lo)
           & (q_hi != np.int32(2**31 - 1)))
    out_ref[:] = jnp.where(hit, jnp.take(perm_ref[:], pos_c, axis=0), -1)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def pallas_join(t_hi: jnp.ndarray, t_lo: jnp.ndarray, perm: jnp.ndarray,
                q_hi: jnp.ndarray, q_lo: jnp.ndarray,
                block_q: int = 32768, interpret: bool = False) -> jnp.ndarray:
    """Sorted-table join: queries (Q,) against table (N,), table pinned in
    VMEM across all query tiles. Returns row index or -1."""
    q = q_hi.shape[0]
    pad = (-q) % block_q
    if pad:
        q_hi = jnp.concatenate([q_hi, jnp.full((pad,), 2**31 - 1, jnp.int32)])
        q_lo = jnp.concatenate([q_lo, jnp.full((pad,), 2**31 - 1, jnp.int32)])
    grid = (q_hi.shape[0] // block_q,)
    out = pl.pallas_call(
        _join_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # table hi (whole)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # table lo
            pl.BlockSpec(memory_space=pltpu.VMEM),   # perm
            pl.BlockSpec((block_q,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_q,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q_hi.shape[0],), jnp.int32),
        interpret=interpret,
    )(t_hi, t_lo, perm, q_hi, q_lo)
    return out[:q]


def _conv_kernel(idx_ref, feats_ref, w_ref, out_ref):
    """One output tile: out[m] = sum_k feats[idx[k, m]] @ W[k].

    feats (N+1, C) stays whole in VMEM (misses point at row N, all-zero);
    idx tile (K, TM); W (K, C, Co)."""
    k = idx_ref.shape[0]
    feats = feats_ref[:]

    def body(kk, acc):
        rows = jnp.take(feats, idx_ref[kk, :], axis=0)       # (TM, C)
        return acc + jnp.dot(rows, w_ref[kk],
                             preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(
        0, k, body,
        jnp.zeros((idx_ref.shape[1], w_ref.shape[2]), jnp.float32))
    out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def pallas_sparse_conv(feats: jnp.ndarray, idx: jnp.ndarray,
                       weight: jnp.ndarray, block_m: int = 1024,
                       interpret: bool = False) -> jnp.ndarray:
    """Gather-matmul sparse conv with the feature table pinned in VMEM.

    feats: (N, C); idx: (K, M) int32 with -1 miss; weight: (K, C, Co).
    Returns (M, Co) in feats.dtype. Requires (N+1)*C*itemsize to fit VMEM —
    callers fall back to the XLA path otherwise.
    """
    n, c = feats.shape
    k, m = idx.shape
    co = weight.shape[2]
    feats_ext = jnp.concatenate([feats, jnp.zeros((1, c), feats.dtype)])
    idx = jnp.where(idx >= 0, idx, n).astype(jnp.int32)
    pad = (-m) % block_m
    if pad:
        idx = jnp.concatenate([idx, jnp.full((k, pad), n, jnp.int32)], axis=1)
    grid = (idx.shape[1] // block_m,)
    out = pl.pallas_call(
        _conv_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, block_m), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # feats whole
            pl.BlockSpec(memory_space=pltpu.VMEM),   # weights whole
        ],
        out_specs=pl.BlockSpec((block_m, co), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((idx.shape[1], co), feats.dtype),
        interpret=interpret,
    )(idx, feats_ext, weight)
    return out[:m]


def vmem_conv_fits(n: int, c: int, co: int, k: int,
                   itemsize: int = 4, budget: int = 100 * 2**20) -> bool:
    """Whether the whole-table conv kernel fits the VMEM budget."""
    need = (n + 1) * c * itemsize + k * c * co * 4
    return need < budget


# ---------------------------------------------------------------------------
# One-hot window conv: the descriptor-free formulation.
#
# The XLA path is bound by gather-descriptor throughput (~250M rows/s,
# PLAN.md). This kernel replaces every gather with an MXU matmul against a
# one-hot matrix over CONTIGUOUS table slabs:
#
#   rows are sorted (pack-key invariant), so the inputs feeding one output
#   tile cluster in table-row space. Each (tile, tap-group) DMAs TWO
#   window slabs — one anchored at the tile's min base position, one at
#   its max — which covers both clusters around a density cliff (z-plane
#   boundaries make single windows insufficient: measured spreads are
#   p99 ~1k rows but max ~40k). Tap k's gather becomes
#   onehot_k (TM, W) @ slab (W-on-lanes) — pure MXU, zero descriptors.
#
# The feature table is consumed TRANSPOSED (C, N): the DMA minor dim is
# then the 128-aligned window axis, and narrow channel counts (C = 32/64)
# avoid lane padding. Replaces convolution_cuda.cu:14-164's
# gather-GEMM-scatter the TPU way. A caller-side overflow flag (rows
# outside BOTH windows) gates a fallback to the XLA path.
# ---------------------------------------------------------------------------

WINDOW_ALIGN = 128   # manual DMA slices: minor-dim offsets 128-lane aligned


def onehot_window_conv(feats: jnp.ndarray, base_pos: jnp.ndarray,
                       slot: jnp.ndarray, groups, weight: jnp.ndarray,
                       block_m: int = 128, window: int = 1024,
                       interpret: bool = False) -> jnp.ndarray:
    """feats (N, C); base_pos (Gg, M) int32 (clamped to [0, N-1]); slot
    (K, M) int8 (-1 miss); groups: static tuple of tap-id tuples; weight
    (K, C, Co). Returns (M, Co) in feats.dtype.

    The caller must have verified two-window coverage (window_overflow)."""
    n, c = feats.shape
    k, m = slot.shape
    co = weight.shape[2]
    gg = base_pos.shape[0]
    assert m % block_m == 0, "pad M to a block_m multiple at plan time"
    assert n % WINDOW_ALIGN == 0, "capacities are power-of-two multiples"

    lo_s, hi_s = window_starts(base_pos, n, block_m, window)
    starts = jnp.stack([lo_s, hi_s], axis=1)      # (Gg, 2, T)
    feats_t = feats.T                             # (C, N) window on lanes

    grid = (m // block_m,)

    def kernel(starts_ref, base_ref, slot_ref, w_ref, feats_hbm, out_ref,
               slab, sem):
        t_idx = pl.program_id(0)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (block_m, window), 1)

        def start_dma(gi):
            for wi in range(2):
                ws = pl.multiple_of(starts_ref[gi, wi, t_idx], WINDOW_ALIGN)
                pltpu.make_async_copy(
                    feats_hbm.at[:, pl.ds(ws, window)],
                    slab.at[gi % 2, wi], sem.at[gi % 2, wi]).start()

        def wait_dma(gi):
            for wi in range(2):
                ws = pl.multiple_of(starts_ref[gi, wi, t_idx], WINDOW_ALIGN)
                pltpu.make_async_copy(
                    feats_hbm.at[:, pl.ds(ws, window)],
                    slab.at[gi % 2, wi], sem.at[gi % 2, wi]).wait()

        # double-buffered slabs: group gi+1's DMAs overlap group gi's MXU
        start_dma(0)
        acc = jnp.zeros((block_m, co), jnp.float32)
        for gi, taps in enumerate(groups):
            if gi + 1 < len(groups):
                start_dma(gi + 1)
            wait_dma(gi)
            ws1 = starts_ref[gi, 0, t_idx]
            ws2 = starts_ref[gi, 1, t_idx]
            for t in taps:
                sl = slot_ref[t, :].astype(jnp.int32)      # (TM,)
                row = jnp.where(sl >= 0, base_ref[gi, :] + sl, -1)
                rel1 = row - ws1
                in1 = (row >= ws1) & (rel1 < window) & (sl >= 0)
                rel2 = row - ws2
                # exclusive: window 2 only picks rows window 1 missed
                # (windows may overlap when the tile's span is small)
                oh1 = (jnp.where(in1, rel1, -1)[:, None] == iota_w)
                oh2 = (jnp.where(~in1 & (sl >= 0), rel2, -1)[:, None]
                       == iota_w)
                dtype = w_ref.dtype
                # gathered rows: contraction over the window axis of the
                # TRANSPOSED slab (C, W) -> (TM, C)
                x = jax.lax.dot_general(
                    oh1.astype(dtype), slab[gi % 2, 0],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                x = x + jax.lax.dot_general(
                    oh2.astype(dtype), slab[gi % 2, 1],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = acc + jnp.dot(x.astype(dtype), w_ref[t],
                                    preferred_element_type=jnp.float32)
        out_ref[:, :] = acc.astype(out_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),        # starts (Gg,2,T)
            pl.BlockSpec((gg, block_m), lambda i: (0, i),
                         memory_space=pltpu.VMEM),        # base_pos tile
            pl.BlockSpec((k, block_m), lambda i: (0, i),
                         memory_space=pltpu.VMEM),        # slot tile
            pl.BlockSpec(memory_space=pltpu.VMEM),        # weight whole
            pl.BlockSpec(memory_space=pltpu.HBM),         # feats.T in HBM
        ],
        out_specs=pl.BlockSpec((block_m, co), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, co), feats.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2, c, window), feats.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(starts, base_pos, slot, weight, feats_t)
    return out


def window_starts(base_pos: jnp.ndarray, n_rows: int, block_m: int,
                  window: int):
    """Per-(group, tile) slab starts for the TWO windows: anchored at the
    tile's min base (rounded down to the 128-lane DMA alignment) and at
    its max (window end pinned past the highest row), both clamped to
    full-width slabs. Returns (lo (Gg, T), hi (Gg, T)) int32."""
    gg, m = base_pos.shape
    t = m // block_m
    bp = base_pos[:, :t * block_m].reshape(gg, t, block_m)
    lo = (jnp.min(bp, axis=2) // WINDOW_ALIGN) * WINDOW_ALIGN
    lo = jnp.clip(lo, 0, max(n_rows - window, 0)).astype(jnp.int32)
    # hi window: floor-aligned at the smallest base the LO window misses,
    # so the second cluster is covered from its bottom (anchoring at the
    # tile max would clip the cluster's lower rows)
    in_lo = (bp >= lo[:, :, None]) & (bp - lo[:, :, None] < window)
    min2 = jnp.min(jnp.where(in_lo, np.int32(2**31 - 1), bp), axis=2)
    hi = (jnp.minimum(min2, n_rows) // WINDOW_ALIGN) * WINDOW_ALIGN
    hi = jnp.clip(hi, 0, max(n_rows - window, 0)).astype(jnp.int32)
    return lo, hi


def window_overflow(base_pos: jnp.ndarray, slot: jnp.ndarray,
                    n_rows: int, block_m: int = 128,
                    window: int = 1024) -> jnp.ndarray:
    """True when some row of some tile falls outside BOTH of its windows —
    the caller then uses the XLA path. Rows are base_pos + slot (< G <=
    the WINDOW_ALIGN slack built into the hi window)."""
    gg, m = base_pos.shape
    t = m // block_m
    bp = base_pos[:, :t * block_m].reshape(gg, t, block_m)
    lo, hi = window_starts(base_pos, n_rows, block_m, window)
    max_slot = jnp.max(slot.astype(jnp.int32), initial=0)
    top = bp + max_slot                   # highest row a tap can touch
    in_lo = (bp >= lo[:, :, None]) & (top - lo[:, :, None] < window)
    in_hi = (bp >= hi[:, :, None]) & (top - hi[:, :, None] < window)
    return jnp.any(~(in_lo | in_hi))
