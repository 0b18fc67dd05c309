"""Sparse 3D convolution: kernel-map planning + gather-matmul-scatter.

TPU-native re-design of torchsparse-u's conv engine (reference:
nn/functional/conv.py:83-147 for the kernel-map builder,
backend/convolution/convolution_cuda.cu:14-164 for gather-GEMM-scatter).

Instead of per-tap variable-length (nbmaps, nbsizes) driving dynamic GEMMs,
we keep a dense gather-form plan `in_idx[K, M_out]` over the fixed output
capacity and run one `lax.scan` over taps:

    forward:    y[j]  = sum_k feats[in_idx[k, j]] @ W[k]      (miss -> 0)
    transposed: y[i] += sum_k sum_{j: in_idx[k,j]==i} x[j] @ W[k]

Every tap is a full (M, Ci) x (Ci, Co) matmul on the MXU; misses gather a
zero row instead of branching, and the transposed scatter is a
deterministic indexed add (no atomics, unlike scatter_kernel at
convolution_cuda.cu:36-48). Matmuls accumulate in fp32 via
`preferred_element_type` regardless of the feature dtype.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import coords as coordlib
from . import ops as spops
from .tensor import ConvPlan, SparseTensor

# Windowed (chunked sub-window) forward apply: measured round 3 at stem
# scale 10.0 ms vs 7.8 ms for the per-tap scan — the slot-select where
# chains cost more VPU bandwidth than the saved gather descriptors, even
# with every chunk on the 256 B plateau. Kept behind a flag for A/B runs.
WINDOWED_APPLY = False

# Full-window-per-descriptor apply (gfit >= G) at narrow channels — a
# CALLER preference, not a byte rule: det's backbone wins end-to-end
# (+18% fps with its 16- and 32-ch levels windowed; nuScenes density)
# while seg LOSES at the same widths (bench 5.64 -> 5.40/5.43 with the
# 32-ch stem / even just the 4-ch input conv windowed; apply microbench
# at seg density 8.55 vs 7.67 ms) — the hit-pattern density differs, so
# each model family opts in (scn.py: prefer_window=True). Env override
# for A/B runs: "auto" follows the caller, "0" forces off everywhere,
# a positive int N forces on for rows <= N bytes.
import os as _os
WINDOW_FULL_DESC = _os.environ.get("WINDOW_FULL_DESC", "auto")
if WINDOW_FULL_DESC != "auto":
    # validate at import: a typo'd value must fail HERE, not as a bare
    # ValueError from inside a jit trace ~30 conv applies later
    try:
        WINDOW_FULL_DESC = int(WINDOW_FULL_DESC)
    except ValueError as e:
        raise ValueError(
            "WINDOW_FULL_DESC must be 'auto', '0' (force off) or a "
            f"positive byte limit, got {WINDOW_FULL_DESC!r}") from e


def _window_pref(prefer_window: bool, row_bytes: int) -> bool:
    if WINDOW_FULL_DESC == "auto":
        return prefer_window
    return WINDOW_FULL_DESC > 0 and row_bytes <= WINDOW_FULL_DESC

# Route the gather-matmul apply through a custom VJP whose feature
# backward is itself a gather-form apply (mirrored taps / inverse map)
# instead of the K scatter-adds AD emits — f32 scatter-adds are ~16x a
# row gather on TPU (PLAN.md measurements). Flag for A/B only.
CUSTOM_VJP = True


def mirror_perm(offsets: np.ndarray):
    """Static tap permutation m with offsets[m[k]] == -offsets[k], or None
    if the offset set is not symmetric (even kernels / strided taps)."""
    offs = np.asarray(offsets)
    lut = {tuple(o): i for i, o in enumerate(offs.tolist())}
    perm = []
    for o in offs.tolist():
        j = lut.get((-o[0], -o[1], -o[2]))
        if j is None:
            return None
        perm.append(j)
    return tuple(perm)


def build_conv_plan(in_coords: jnp.ndarray,
                    out_coords: jnp.ndarray,
                    out_nnz: jnp.ndarray,
                    offsets,
                    in_capacity: int,
                    quantum: int = 0,
                    in_sorted: bool = False,
                    out_sorted: bool = False,
                    table=None,
                    x_lattice: int = 0) -> ConvPlan:
    """Build the kernel map: for each output row and tap, the input row at
    out_coord + offset (or -1). Mirrors conv.py:103-122 (offsets -> hash ->
    query) with an exact sorted-table join instead of hashing.

    When the taps' x-offsets form quantum-step runs (every LinK kernel),
    the join uses one binary search per (dy, dz) group plus consecutive-row
    compares (grouped_window_query) — ~3x less search traffic.
    `in_sorted` (input rows in pack-key order) skips the table sort and
    produces the window-form plan the apply uses for per-GROUP gathers;
    `out_sorted` enables the coarse+bracket search (~2x fewer rounds)."""
    if table is None:
        table = coordlib.build_table(in_coords, assume_sorted=in_sorted)
    offs_np = np.asarray(offsets)
    mir = mirror_perm(offs_np) if out_coords is in_coords else None
    if quantum and coordlib.can_group_offsets(offs_np, quantum):
        # submanifold convs query the table's own rows: the center
        # (dy,dz) group then needs no search (see _grouped_query_direct)
        self_query = in_sorted and out_coords is in_coords
        in_idx, base_pos, slot = coordlib.grouped_window_query(
            table, out_coords, offs_np, quantum,
            queries_sorted=out_sorted, identity_perm=in_sorted,
            self_query=self_query)
        groups = None
        self_gi = None
        if base_pos is not None:
            glist = coordlib.offset_groups(offs_np)
            groups = tuple(tuple(t for _, t in taps) for _, taps in glist)
            if self_query:
                self_gi = next(
                    (gi for gi, ((ox0, oy, oz), _) in enumerate(glist)
                     if oy == 0 and oz == 0 and ox0 in (0, -quantum)), None)
        fact_idx = fact_adj = None
        if (FACTORED_APPLY != "0"
                and base_pos is not None and groups is not None
                and quantum == x_lattice
                and all(len(t) <= 3 for t in groups)
                and any(len(t) >= 2 for t in groups)):
            # x-factored apply plan: valid because occupied x cells at this
            # level are multiples of the lattice step (== quantum when
            # dilation is 1), so a group's run cells, when occupied, are
            # CONSECUTIVE table rows
            fact_idx, fact_adj = build_fact_index(
                in_idx, groups, table.rows, quantum, in_capacity)
        return ConvPlan(in_idx=in_idx, out_coords=out_coords,
                        out_nnz=out_nnz, in_capacity=in_capacity,
                        out_capacity=out_coords.shape[0],
                        base_pos=base_pos, slot=slot, groups=groups,
                        self_group=self_gi, mirror=mir,
                        fact_idx=fact_idx, fact_adj=fact_adj)
    offs = jnp.asarray(offs_np, jnp.int32)                 # (K, 3)
    qxyz = out_coords[None, :, :3] + offs[:, None, :]      # (K, M, 3)
    qb = jnp.broadcast_to(out_coords[None, :, 3:],
                          (offs.shape[0],) + out_coords[:, 3:].shape)
    queries = jnp.concatenate([qxyz, qb], axis=-1)         # (K, M, 4)
    in_idx = table.query(queries)                          # (K, M)
    return ConvPlan(in_idx=in_idx, out_coords=out_coords, out_nnz=out_nnz,
                    in_capacity=in_capacity, out_capacity=out_coords.shape[0],
                    mirror=mir)


# x-FACTORED apply: MEASURED NEGATIVE on v5e — default OFF ("auto"
# enables it for A/B runs and tests). The idea: pre-combine each
# (dy, dz) group's x-run taps densely so the apply gathers 1 row/group
# instead of 3 (27 -> 8/9 descriptors per output). Measured (round 4,
# tools/profile_fwd.py): the single gather reads from a 3N-row case
# array, which falls off the gather engine's table-size cliff (round-3c:
# 167 vs 354 Mrows/s for the same bytes in a larger table) — the
# per-group gather costs 156 ms/scan vs the ~97 ms of per-tap gathers it
# replaced, plus 94 ms of section concats and 66 ms of full-table
# matmuls. End-to-end: seg 4.11 vs 6.07 scans/s, det 1.45 vs 2.93 fps.
# Kept (tested, exact) because the formulation wins on any hardware
# whose gather cost is per-descriptor and table-size-flat.
FACTORED_APPLY = _os.environ.get("FACTORED_APPLY", "0")
if FACTORED_APPLY not in ("auto", "0"):
    raise ValueError(f"FACTORED_APPLY must be 'auto' or '0', got "
                     f"{FACTORED_APPLY!r}")


def build_fact_index(in_idx: jnp.ndarray, groups, table_rows: jnp.ndarray,
                     quantum: int, n: int):
    """Plan tensors for the x-factored apply (see _fact_apply_impl).

    The reference engine gathers one input row per tap (27 descriptors per
    output for a 3^3 kernel, convolution_cuda.cu:101-126). On TPU the
    gather DESCRIPTOR rate is the measured wall (~400-550 Mrows/s
    regardless of row width, PLAN.md roofline), so we exploit sorted-key
    adjacency instead: within one (dy, dz) group the 2-3 x-taps hit
    *consecutive table rows*, which a dense pre-combination (masked row
    shifts + MXU matmuls) can merge BEFORE the gather — one descriptor
    per group instead of one per tap.

    For each group (taps ordered by x, cells c0 < c1 [< c2] at lattice
    step `quantum`) the apply gathers ONE row from the per-group case
    array F (sections of `n` rows):

      3-run: F = [Ybar | E | C | 0]; center c1 hit at row r -> Ybar[r]
             (Ybar[i] = B[i-1]*adjm + M[i] + C[i+1]*adjp covers all three
             taps: if c0/c2 exist they are EXACTLY rows r-1/r+1, since
             occupied x cells are lattice multiples); else c0 hit at row
             r -> E[r] = B[r] + C[r+1]*gap2 (c2, if present, is the next
             row iff the key gap is exactly 2q); else c2 hit -> C; else
             the zero row.
      2-run: F = [Y2 | C | 0] with Y2[i] = B[i] + C[i+1]*adjp.

    Requires identity_perm (feature rows == table rows). Returns
    (fact_idx (G, M) int32, fact_adj (3, N) bool = [adjm, adjp, gap2]).
    """
    hi, lo = table_rows[:, 0], table_rows[:, 1]
    same = hi[1:] == hi[:-1]
    d = lo[1:] - lo[:-1]
    # x lives in lo's low bits; a lo-delta of q within equal hi can only
    # be an x step (y boundaries jump by SPAN_X >> any real x extent) —
    # the same invariant grouped_window_query's `t_lo = q_lo + dx` uses.
    adj_next = same & (d == quantum)
    gap2_next = same & (d == 2 * quantum)
    f1 = jnp.zeros((1,), bool)
    adjm = jnp.concatenate([f1, adj_next])       # row i-1 is my x-q cell
    adjp = jnp.concatenate([adj_next, f1])       # row i+1 is my x+q cell
    gap2 = jnp.concatenate([gap2_next, f1])      # row i+1 is my x+2q cell
    fact = []
    for taps in groups:
        cs = [in_idx[t] for t in taps]
        if len(taps) == 3:
            gi = jnp.where(cs[1] >= 0, cs[1],
                           jnp.where(cs[0] >= 0, n + cs[0],
                                     jnp.where(cs[2] >= 0, 2 * n + cs[2],
                                               3 * n)))
        elif len(taps) == 2:
            gi = jnp.where(cs[0] >= 0, cs[0],
                           jnp.where(cs[1] >= 0, n + cs[1], 2 * n))
        else:
            gi = jnp.where(cs[0] >= 0, cs[0], n)
        fact.append(gi)
    return (coordlib.checkpoint_name(jnp.stack(fact), coordlib.PLAN_TAG),
            coordlib.checkpoint_name(jnp.stack([adjm, adjp, gap2]),
                                     coordlib.PLAN_TAG))


def _fact_apply_impl(feats: jnp.ndarray, weight: jnp.ndarray,
                     fact_idx: jnp.ndarray, adj: jnp.ndarray,
                     groups, self_group) -> jnp.ndarray:
    """x-factored forward: per (dy, dz) group, pre-combine the x-run taps
    with dense MXU matmuls + masked row shifts, then gather ONE row per
    group from the case array (build_fact_index). 3^3 submanifold convs
    drop from 27 to 8 gather descriptors per output (the self group's
    center always hits its own row — direct add, no gather); strided 3^3
    from 27 to 9; 2^3 from 8 to 4. The dense pre-combination is ~2KC_iC_o
    extra FLOPs per row — noise on the MXU (<5% of the gather time saved;
    PLAN.md: conv matmuls were <5% of the forward while gathers were ~51%).
    """
    n = feats.shape[0]
    co = weight.shape[2]
    dt = feats.dtype
    adjm = adj[0][:, None]
    adjp = adj[1][:, None]
    gap2 = adj[2][:, None]
    zrow_f = jnp.zeros((1, co), jnp.float32)
    acc = jnp.zeros((fact_idx.shape[1], co), jnp.float32)
    for gi, taps in enumerate(groups):
        mats = [jnp.dot(feats, weight[t].astype(dt),
                        preferred_element_type=jnp.float32) for t in taps]
        if len(taps) == 3:
            b, mm, c = mats
            c_up = jnp.concatenate([c[1:], zrow_f])
            b_dn = jnp.concatenate([zrow_f, b[:-1]])
            ybar = jnp.where(adjm, b_dn, 0.0) + mm + jnp.where(adjp, c_up,
                                                               0.0)
            if gi == self_group:
                # center cell == own row: contribution is Ybar at the own
                # index — no gather; mask padding rows (center miss)
                mask = (fact_idx[gi] < n)[:, None]
                acc = acc + jnp.where(mask, ybar, 0.0)
                continue
            e = b + jnp.where(gap2, c_up, 0.0)
            secs = [ybar, e, c]
        elif len(taps) == 2:
            b, c = mats
            c_up = jnp.concatenate([c[1:], zrow_f])
            secs = [b + jnp.where(adjp, c_up, 0.0), c]
        else:
            secs = mats
        # sections cast to the feature dtype: one extra rounding per
        # group-sum in bf16 runs (goldens run f32 — exact there); keeps
        # the gather operand at feature width
        f = jnp.concatenate([s.astype(dt) for s in secs]
                            + [jnp.zeros((1, co), dt)])
        acc = acc + f[fact_idx[gi]].astype(jnp.float32)
    return acc.astype(dt)


def _gm_fact_factory(groups, self_group):
    """custom-VJP x-factored apply. Backward = the standard one-pass
    inverse-map backward (_gm_bwd_core) over the plan's per-tap maps —
    same cost as the non-factored path's backward; the factoring buys its
    3x on the forward (which the remat policy also replays in training)."""
    key = (groups, self_group)
    fn = _GM_FACT_CACHE.get(key)
    if fn is not None:
        return fn

    @jax.custom_vjp
    def f(feats, weight, fact_idx, adj, bwd_idx):
        return _fact_apply_impl(feats, weight, fact_idx, adj, groups,
                                self_group)

    def fwd(feats, weight, fact_idx, adj, bwd_idx):
        return (_fact_apply_impl(feats, weight, fact_idx, adj, groups,
                                 self_group),
                (feats, weight, fact_idx, adj, bwd_idx))

    def bwd(res, g):
        feats, weight, fact_idx, adj, bwd_idx = res
        d_feats, d_w = _gm_bwd_core(feats, weight, bwd_idx, g)
        zero = lambda a: np.zeros(a.shape, jax.dtypes.float0)
        return (d_feats.astype(feats.dtype), d_w.astype(weight.dtype),
                zero(fact_idx), zero(adj), zero(bwd_idx))

    f.defvjp(fwd, bwd)
    _GM_FACT_CACHE[key] = f
    return f


_GM_FACT_CACHE = {}


def invert_plan(plan: ConvPlan) -> jnp.ndarray:
    """Inverse kernel map: inv[k, i] = output row j with in_idx[k, j] == i
    (or -1). Well-defined because j -> in_idx[k, j] is injective per tap
    (distinct output coords shift to distinct input coords). One int32
    scatter per tap at plan time turns every later TRANSPOSED apply into
    a gather+matmul scan — the reference's scatter kernel
    (convolution_cuda.cu:36-48) inverted the TPU way."""
    k, m = plan.in_idx.shape
    n = plan.in_capacity
    tgt = jnp.where(plan.in_idx >= 0, plan.in_idx, n)
    inv = jnp.full((k, n + 1), -1, jnp.int32)
    inv = inv.at[jnp.arange(k)[:, None], tgt].set(
        jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32), (k, m)),
        mode="drop")
    return coordlib.checkpoint_name(inv[:, :n], coordlib.PLAN_TAG)


def _window_table(feats: jnp.ndarray, g: int) -> jnp.ndarray:
    """Shifted-concat view: row p of the result holds input rows p..p+g-1
    side by side, so one row gather fetches a whole g-row window. Rows past
    the end read zeros. Costs one sequential (bandwidth-bound) copy — the
    gathers it replaces are descriptor-bound, ~40x more expensive per row
    (PLAN.md measurements)."""
    n, c = feats.shape
    pad = jnp.zeros((g, c), feats.dtype)
    ext = jnp.concatenate([feats, pad], axis=0)            # (N+G, C)
    return jnp.concatenate([ext[j:j + n] for j in range(g)], axis=1)


def window_chunk(g: int, c: int, itemsize: int) -> int:
    """Rows per window gather that stay on the ~256 B descriptor-rate
    plateau (PLAN.md: random-row reads are rate-constant to 256 B; wider
    rows fall to ~30 GB/s — the measured round-2 negative for full-G
    windows at C=64 bf16 = 384 B)."""
    return max(1, min(g, 256 // (c * itemsize)))


def _apply_windowed(feats: jnp.ndarray, weight: jnp.ndarray,
                    plan: ConvPlan) -> jnp.ndarray:
    """Forward conv in window form: each (dy, dz) tap group's G-row window
    is fetched in ceil(G / gfit) row gathers of gfit*C <= 256 B (the
    descriptor-rate plateau), then VPU mask-selects route each tap's slot
    into its MXU matmul. The self-query center group skips gathers
    entirely: its base is provably the own row or its predecessor, so the
    window reduces to shifted slices + one select (round 3).

    Selects are written as where/add chains — plain elementwise ops XLA
    fuses into the matmul operands (an einsum over the slot axis compiles
    to per-row micro-matmuls and giant intermediates)."""
    g = plan.window
    m = plan.out_capacity
    c = feats.shape[1]
    co = weight.shape[2]
    gfit = window_chunk(g, c, feats.dtype.itemsize)
    featsw = _window_table(feats, gfit)                    # (N, gfit*C)

    acc = jnp.zeros((m, co), jnp.float32)
    i_arr = jnp.arange(m, dtype=jnp.int32)
    for gi, tap_ids in enumerate(plan.groups):
        base = plan.base_pos[gi]
        wins = []
        for c0 in range(0, g, gfit):                       # chunk starts
            if gi == plan.self_group:
                # base is provably i or i-1 (self-query): the window is a
                # select of two shifted slices — no gather descriptors
                wins.append(jnp.where((base == i_arr - 1)[:, None],
                                      _shift_rows(featsw, c0 - 1),
                                      _shift_rows(featsw, c0)))
            else:
                wins.append(featsw[base + c0])             # one row gather
        for t in tap_ids:
            sl = plan.slot[t]                              # (M,) int8
            x = jnp.zeros((m, c), feats.dtype)
            for j in range(g):
                win = wins[j // gfit]
                jj = j % gfit
                x = x + jnp.where((sl == j)[:, None],
                                  win[:, jj * c:(jj + 1) * c], 0)
            acc = acc + jnp.dot(x, weight[t].astype(feats.dtype),
                                preferred_element_type=jnp.float32)
    return acc.astype(feats.dtype)


def _apply_windowed_transposed(feats: jnp.ndarray, weight: jnp.ndarray,
                               plan: ConvPlan) -> jnp.ndarray:
    """Transposed conv in window form: per-group contributions land in a
    (N, G*Co) window buffer with ONE scatter-add per group (vs one per
    tap), then fold the G diagonals back: out[p+j] += buf[p, j]."""
    g = plan.window
    m = plan.out_capacity
    n = plan.in_capacity
    co = weight.shape[2]
    buf = jnp.zeros((n, g * co), jnp.float32)
    for gi, tap_ids in enumerate(plan.groups):
        per_slot = jnp.zeros((m, g * co), jnp.float32)
        for t in tap_ids:
            contrib = jnp.dot(feats, weight[t].astype(feats.dtype),
                              preferred_element_type=jnp.float32)  # (M, Co)
            sl = plan.slot[t]
            for j in range(g):
                mask = (sl == j)[:, None]
                per_slot = per_slot.at[:, j * co:(j + 1) * co].add(
                    jnp.where(mask, contrib, 0.0))
        buf = buf.at[plan.base_pos[gi]].add(per_slot)
    out = buf[:, :co]
    for j in range(1, g):
        out = out.at[j:].add(buf[:n - j, j * co:(j + 1) * co])
    return out.astype(feats.dtype)


def _shift_rows(a: jnp.ndarray, d: int) -> jnp.ndarray:
    """Row i -> a[i + d], zero-padded (a plain slice — no gather)."""
    if d == 0:
        return a
    z = jnp.zeros((abs(d), a.shape[1]), a.dtype)
    return (jnp.concatenate([a[d:], z]) if d > 0
            else jnp.concatenate([z, a[:d]]))


def _win_tap_rows(feats, base_pos, slot, groups, self_group):
    """Assemble each tap's input rows (M, C) from per-GROUP window gathers:
    one plateau-width descriptor fetches a whole G-row window (G taps),
    then VPU selects route each tap's slot. Used when the full window fits
    one descriptor (gfit >= G) — at narrow channels (C*itemsize <= 85 B,
    e.g. the det backbone's 16/32-channel levels) this cuts gather
    descriptors ~3x, the measured per-ROW wall (PLAN.md: descriptor cost
    is per row regardless of width below 256 B). Yields (tap_id, x)."""
    c = feats.shape[1]
    m = slot.shape[1]
    g = max(len(t) for t in groups)
    gfit = window_chunk(g, c, feats.dtype.itemsize)
    featsw = _window_table(feats, gfit)
    i_arr = jnp.arange(m, dtype=jnp.int32)
    for gi, tap_ids in enumerate(groups):
        base = base_pos[gi]
        wins = []
        for c0 in range(0, g, gfit):
            if gi == self_group:
                # self-query center group: base is provably i or i-1 —
                # shifted slices + one select, no gather descriptors
                wins.append(jnp.where((base == i_arr - 1)[:, None],
                                      _shift_rows(featsw, c0 - 1),
                                      _shift_rows(featsw, c0)))
            else:
                wins.append(featsw[base + c0])          # one row gather
        for t in tap_ids:
            sl = slot[t]                                # (M,) int8
            x = jnp.zeros((m, c), feats.dtype)
            for j in range(g):
                win = wins[j // gfit]
                jj = j % gfit
                x = x + jnp.where((sl == j)[:, None],
                                  win[:, jj * c:(jj + 1) * c], 0)
            yield t, x


def _win_apply_impl(feats, weight, base_pos, slot, groups, self_group):
    co = weight.shape[2]
    m = slot.shape[1]
    acc = jnp.zeros((m, co), jnp.float32)
    for t, x in _win_tap_rows(feats, base_pos, slot, groups, self_group):
        acc = acc + jnp.dot(x, weight[t].astype(x.dtype),
                            preferred_element_type=jnp.float32)
    return acc.astype(feats.dtype)


def _gm_win_factory(groups, self_group, mirror):
    """custom-VJP windowed apply for SUBMANIFOLD plans (self-query, mirror
    symmetry). Backward w.r.t. features is the SAME windowed apply with
    mirror-permuted transposed weights (d_feats[i] = sum_k g[in_idx[k', i]]
    @ W[mirror k']^T over the plan's own windows); dW re-assembles each
    tap's rows from the windows (remat-cheap) and runs per-tap einsums.
    Cached per static (groups, self_group, mirror) so jit tracing reuses
    one function identity per plan shape."""
    key = (groups, self_group, mirror)
    fn = _GM_WIN_CACHE.get(key)
    if fn is not None:
        return fn

    @jax.custom_vjp
    def f(feats, weight, base_pos, slot):
        return _win_apply_impl(feats, weight, base_pos, slot, groups,
                               self_group)

    def fwd(feats, weight, base_pos, slot):
        return (_win_apply_impl(feats, weight, base_pos, slot, groups,
                                self_group),
                (feats, weight, base_pos, slot))

    def bwd(res, gout):
        """One window-assembly pass over gout serves both cotangents:
        x_t(gout) = gout rows at tap t's targets, so

            d_feats       += x_t(gout) @ W[mirror t]^T
            d_W[mirror t]  = feats^T @ x_t(gout)

        (x_t(gout) IS gout gathered by the inverse of tap mirror(t) —
        the same regrouping as _gm_bwd). No second pass over feats."""
        feats, weight, base_pos, slot = res
        w_t = jnp.swapaxes(weight, 1, 2)
        k = weight.shape[0]
        d_feats = jnp.zeros(feats.shape, jnp.float32)
        dws = [None] * k
        for t, xg in _win_tap_rows(gout, base_pos, slot, groups,
                                   self_group):
            d_feats = d_feats + jnp.dot(
                xg, w_t[mirror[t]].astype(xg.dtype),
                preferred_element_type=jnp.float32)
            dws[mirror[t]] = jnp.dot(feats.T, xg.astype(feats.dtype),
                                     preferred_element_type=jnp.float32)
        d_w = jnp.stack(dws).astype(weight.dtype)
        zero = lambda a: np.zeros(a.shape, jax.dtypes.float0)
        return d_feats.astype(feats.dtype), d_w, zero(base_pos), zero(slot)

    f.defvjp(fwd, bwd)
    _GM_WIN_CACHE[key] = f
    return f


_GM_WIN_CACHE = {}


def _gm_impl(feats: jnp.ndarray, weight: jnp.ndarray,
             idx: jnp.ndarray) -> jnp.ndarray:
    """out[j] = sum_k feats[idx[k, j]] @ W[k], miss (idx < 0) -> zero row.
    Unrolled over taps so the gathers pipeline against the matmuls."""
    n_in = feats.shape[0]
    ci, co = weight.shape[1], weight.shape[2]
    feats_ext = jnp.concatenate(
        [feats, jnp.zeros((1, ci), feats.dtype)], axis=0)
    safe = jnp.where(idx >= 0, idx, n_in)
    acc = jnp.zeros((idx.shape[1], co), jnp.float32)
    for kk in range(idx.shape[0]):
        x = feats_ext[safe[kk]]
        acc = acc + jnp.dot(x, weight[kk].astype(x.dtype),
                            preferred_element_type=jnp.float32)
    return acc.astype(feats.dtype)


# residual tag for the remat policy: saving each conv's OUTPUT means the
# backward recompute of a block never re-runs its gather chains — only
# the elementwise BN/ReLU segments between saved outputs (~10.9 MB bf16
# per conv at the 85k cap; ~30 convs ≈ 350 MB, well inside HBM)
CONV_OUT_TAG = "conv_out"


@jax.custom_vjp
def _gm(feats, weight, idx, bwd_idx):
    """Gather-matmul apply with a gather-form backward.

    `bwd_idx` is the inverse kernel map of `idx` (idx[k, j] == i iff
    bwd_idx[k, i] == j): mirrored taps for submanifold plans, invert_plan
    otherwise. AD of the plain apply turns each forward tap gather into
    an f32 scatter-add (~16x a row gather, the round-3 train profile's
    dominant cost); with the inverse map the feature backward is the same
    descriptor-plateau gather+MXU loop as the forward:

        d_feats[i] = sum_k g[bwd_idx[k, i]] @ W[k]^T
        d_W[k]     = gather(feats, idx[k])^T @ g
    """
    return _gm_impl(feats, weight, idx)


def _gm_fwd(feats, weight, idx, bwd_idx):
    return _gm_impl(feats, weight, idx), (feats, weight, idx, bwd_idx)


def _gm_bwd(res, g):
    """ONE gather pass serves both cotangents: with the per-tap-injective
    inverse map, g_hat_k = g[bwd_idx[k]] (miss -> 0) gives

        d_feats   = sum_k g_hat_k @ W[k]^T
        d_W[k]    = feats^T @ g_hat_k

    (dW via the inverse: sum_j feats[idx[k,j]] (x) g[j] regroups over input
    rows i as feats[i] (x) g[inv[k,i]] — padding/miss rows contribute the
    zero row). Halves the backward's gather descriptors vs gathering g for
    d_feats AND re-gathering feats for dW (round-3 profile: the backward
    was ~2/3 of all conv gather time)."""
    feats, weight, idx, bwd_idx = res
    d_feats, d_w = _gm_bwd_core(feats, weight, bwd_idx, g)
    zero = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return (d_feats.astype(feats.dtype), d_w.astype(weight.dtype),
            zero(idx), zero(bwd_idx))


def _gm_bwd_core(feats, weight, bwd_idx, g):
    m_out = g.shape[0]
    co = weight.shape[2]
    g_ext = jnp.concatenate([g, jnp.zeros((1, co), g.dtype)], axis=0)
    safe = jnp.where(bwd_idx >= 0, bwd_idx, m_out)
    d_feats = jnp.zeros((feats.shape[0], weight.shape[1]), jnp.float32)
    dws = []
    for kk in range(bwd_idx.shape[0]):
        gk = g_ext[safe[kk]]                                   # (N_in, Co)
        d_feats = d_feats + jnp.dot(
            gk, jnp.swapaxes(weight[kk], 0, 1).astype(gk.dtype),
            preferred_element_type=jnp.float32)
        dws.append(jnp.dot(feats.T, gk.astype(feats.dtype),
                           preferred_element_type=jnp.float32))
    return d_feats, jnp.stack(dws)


_gm.defvjp(_gm_fwd, _gm_bwd)


def apply_conv_plan(feats: jnp.ndarray, weight: jnp.ndarray, plan: ConvPlan,
                    transposed: bool = False,
                    prefer_window: bool = False) -> jnp.ndarray:
    """Execute the plan. `weight` is (K, Ci, Co), reference layout
    (nn/modules/conv.py:36-38)."""
    k = weight.shape[0]
    ci = weight.shape[1]
    co = weight.shape[2]

    # Window gathers only pay while each row stays on the ~256 B
    # descriptor-rate plateau (PLAN.md). Round 3 chunks each G-row window
    # into ceil(G / gfit) plateau-width gathers, so the window form wins
    # whenever gfit >= 2 (i.e. at least two slots share a descriptor).
    gfit = (window_chunk(plan.window, feats.shape[1], feats.dtype.itemsize)
            if plan.groups else 0)
    if plan.base_pos is not None and gfit >= 2 and WINDOWED_APPLY:
        if transposed:
            if plan.inv_idx is None:   # inverse-map gather beats scatter
                return _apply_windowed_transposed(feats, weight, plan)
        else:
            return _apply_windowed(feats, weight, plan)

    if not transposed:
        # x-FACTORED apply: one gather per (dy, dz) group (the x-run taps
        # are pre-combined densely — build_fact_index). Strictly fewer
        # descriptors than both the per-tap scan (3x) and the
        # full-window form, so it takes precedence when the plan has it.
        if plan.fact_idx is not None and FACTORED_APPLY != "0":
            bwd_idx = None
            if CUSTOM_VJP:
                if plan.mirror is not None:
                    bwd_idx = plan.in_idx[jnp.asarray(plan.mirror)]
                elif plan.inv_idx is not None:
                    bwd_idx = plan.inv_idx
            if bwd_idx is not None:
                fn = _gm_fact_factory(plan.groups, plan.self_group)
                return coordlib.checkpoint_name(
                    fn(feats, weight, plan.fact_idx, plan.fact_adj,
                       bwd_idx), CONV_OUT_TAG)
            # no inverse map (det inference keeps EAGER_INVERT off):
            # plain impl — AD through it would scatter, but inference
            # never differentiates
            return coordlib.checkpoint_name(
                _fact_apply_impl(feats, weight, plan.fact_idx,
                                 plan.fact_adj, plan.groups,
                                 plan.self_group), CONV_OUT_TAG)
        # Full-window-per-descriptor apply: when a whole G-row window fits
        # one 256 B gather (narrow channels — det's 16/32-ch levels), one
        # descriptor serves G taps. Distinct from the measured-negative
        # CHUNKED case (gfit < G, round-3: 10.0 vs 7.8 ms) which stays
        # behind WINDOWED_APPLY. Submanifold-only: the custom VJP needs
        # the mirror symmetry for the windowed backward.
        row_bytes = feats.shape[1] * feats.dtype.itemsize
        if (CUSTOM_VJP and _window_pref(prefer_window, row_bytes)
                and plan.base_pos is not None
                and plan.mirror is not None and plan.window > 0
                and gfit >= plan.window):
            fn = _gm_win_factory(plan.groups, plan.self_group, plan.mirror)
            return coordlib.checkpoint_name(
                fn(feats, weight, plan.base_pos, plan.slot), CONV_OUT_TAG)
        # UNROLLED tap loop (not lax.scan): the scan's sequential carry
        # serializes the per-tap gathers; unrolled they pipeline against
        # the matmuls (measured 8.35 vs 8.76 ms at stem scale, round 2)
        if CUSTOM_VJP:
            bwd_idx = None
            if plan.mirror is not None:      # submanifold: inv == mirror
                bwd_idx = plan.in_idx[jnp.asarray(plan.mirror)]
            elif plan.inv_idx is not None:   # strided: eager invert_plan
                bwd_idx = plan.inv_idx
            if bwd_idx is not None:
                return coordlib.checkpoint_name(
                    _gm(feats, weight, plan.in_idx, bwd_idx), CONV_OUT_TAG)
        return coordlib.checkpoint_name(
            _gm_impl(feats, weight, plan.in_idx), CONV_OUT_TAG)
    else:
        # feats live on the plan's *output* side; result on its input side.
        m_in = plan.in_capacity

        if plan.inv_idx is not None:
            # gather form over the inverse map: out[i] = sum_k
            # feats[inv[k, i]] @ W[k] — replaces K scatter-adds with K
            # gathers (~4x cheaper, PLAN.md round-2 profile); the backward
            # w.r.t. features is the plan's FORWARD gather form
            if CUSTOM_VJP:
                return coordlib.checkpoint_name(
                    _gm(feats, weight, plan.inv_idx, plan.in_idx),
                    CONV_OUT_TAG)
            return coordlib.checkpoint_name(
                _gm_impl(feats, weight, plan.inv_idx), CONV_OUT_TAG)

        def body(acc, xs):
            idx_k, w_k = xs                                    # (M_out,), (Ci, Co)
            contrib = jnp.dot(feats, w_k.astype(feats.dtype),
                              preferred_element_type=jnp.float32)
            safe = jnp.where(idx_k >= 0, idx_k, m_in)
            acc = acc.at[safe].add(contrib)
            return acc, None

        init = jnp.zeros((m_in + 1, co), jnp.float32)
        acc, _ = jax.lax.scan(body, init, (plan.in_idx, weight))
        return acc[:m_in].astype(feats.dtype)


def conv3d(x: SparseTensor,
           weight: jnp.ndarray,
           kernel_size: Union[int, Tuple[int, ...]],
           bias: Optional[jnp.ndarray] = None,
           stride: Union[int, Tuple[int, ...]] = 1,
           dilation: Union[int, Tuple[int, ...]] = 1,
           transposed: bool = False,
           out_capacity: Optional[int] = None,
           prefer_window: bool = False) -> SparseTensor:
    """Sparse conv with functional kmap caching, mirroring
    nn/functional/conv.py:86-147 semantics:

      * 1x1x1 stride-1: plain matmul, no coords change;
      * submanifold (stride 1): out coords == in coords;
      * strided: coords downsampled, new coord map registered in cmaps;
      * transposed: reuses the forward plan of the matching down conv and
        restores the cached finer coord map.

    `out_capacity` bounds the downsampled coordinate set (defaults to the
    input capacity — always safe, tune per level for speed).
    """
    kernel_size = coordlib.make_ntuple(kernel_size)
    stride = coordlib.make_ntuple(stride)
    dilation = coordlib.make_ntuple(dilation)

    if kernel_size == (1, 1, 1) and stride == (1, 1, 1) and dilation == (1, 1, 1):
        feats = jnp.dot(x.feats, weight.astype(x.feats.dtype),
                        preferred_element_type=jnp.float32)
        feats = feats.astype(x.feats.dtype)
        if bias is not None:
            feats = feats + bias
        return x.replace(feats=feats)

    if not transposed:
        # str-tagged like ("table", ...)/("spconv", ...): pytree dict-key
        # sorting requires homogeneous comparable keys
        key = ("plan", x.stride, kernel_size, stride, dilation)
        strided = any(s > 1 for s in stride)
        # strided outputs come from unique_coords (sorted); submanifold
        # outputs keep the input's order
        out_sorted = True if strided else x.coords_sorted
        plan = x.kmaps.get(key)
        if plan is None:
            offsets = coordlib.kernel_offsets_np(kernel_size, stride=x.stride,
                                                 dilation=dilation)
            if strided:
                cap = out_capacity or x.capacity
                out_coords, out_nnz = spops.spdownsample(
                    x.coords, cap, stride, kernel_size, x.stride)
            else:
                out_coords, out_nnz = x.coords, x.nnz
            # one key table + direct index per coordinate map, shared by
            # every plan built at this level (submanifold + down convs)
            tkey = ("table", x.stride)
            table = x.kmaps.get(tkey)
            if table is None:
                # grid_extent (static base-domain bound from collate)
                # unlocks the RankGrid join index at levels whose lattice
                # (extent / stride) fits the cell budget — the seg
                # stride-8/16 levels; finer levels fall back to
                # DirectIndex inside build_table. Isotropic strides only:
                # the grid divides every axis by one quantum.
                iso = x.stride[0] == x.stride[1] == x.stride[2]
                table = coordlib.build_table(
                    x.coords, assume_sorted=x.coords_sorted,
                    grid_shape=x.grid_extent if iso else None,
                    grid_quantum=x.stride[0])
                x.kmaps[tkey] = table
            plan = build_conv_plan(x.coords, out_coords, out_nnz, offsets,
                                   in_capacity=x.capacity,
                                   quantum=x.stride[0] * dilation[0],
                                   in_sorted=x.coords_sorted,
                                   out_sorted=out_sorted, table=table,
                                   x_lattice=x.stride[0])
            if strided and plan.mirror is None:
                # eager inverse map: the U-Net's matching deconv needs it
                # anyway (net-zero there), and the custom-vjp backward of
                # THIS conv needs it at apply time, before the deconv runs
                plan = plan.replace(inv_idx=invert_plan(plan))
            x.kmaps[key] = plan

        feats = apply_conv_plan(x.feats, weight, plan, transposed=False,
                                prefer_window=prefer_window)
        if bias is not None:
            feats = feats + bias
        new_stride = tuple(x.stride[k] * stride[k] for k in range(3))
        out = SparseTensor(feats=feats, coords=plan.out_coords,
                           nnz=plan.out_nnz, stride=new_stride,
                           cmaps=x.cmaps, kmaps=x.kmaps,
                           base_sorted=x.base_sorted,
                           coords_sorted=out_sorted,
                           grid_extent=x.grid_extent)
    else:
        tensor_stride = tuple(x.stride[k] // stride[k] for k in range(3))
        tkey = ("plan", tensor_stride, kernel_size, stride, dilation)
        plan = x.kmaps[tkey]
        if plan.inv_idx is None:
            # build the inverse map once per plan (trace-time cache) so
            # the transposed apply runs gather-form
            plan = plan.replace(inv_idx=invert_plan(plan))
            x.kmaps[tkey] = plan
        feats = apply_conv_plan(x.feats, weight, plan, transposed=True)
        if bias is not None:
            feats = feats + bias
        fine_coords, fine_nnz = x.cmaps[tensor_stride]
        # restored map: strided-conv products are sorted (unique_coords);
        # the creation-stride map carries the creation flag
        fine_sorted = (tensor_stride != (1, 1, 1)) or x.base_sorted
        out = SparseTensor(feats=feats, coords=fine_coords, nnz=fine_nnz,
                           stride=tensor_stride, cmaps=x.cmaps,
                           kmaps=x.kmaps, base_sorted=x.base_sorted,
                           coords_sorted=fine_sorted,
                           grid_extent=x.grid_extent)

    out.cmaps.setdefault(out.stride, (out.coords, out.nnz))
    return out
