"""Coordinate keys, sorting, dedup and joins for sparse voxel tensors.

TPU-native replacement for the reference's FNV-1a hashing + GPU cuckoo hash
table (reference: segmentation/torchsparse-u/torchsparse/backend/hash/
hash_cuda.cu:11-55, backend/hashmap/hashmap_cuda.cu). Instead of 64-bit
hashes resolved through a probabilistic hash table, we linearize integer
voxel coordinates into an exact *pair* of int32 keys (JAX default int width
is 32 bits; a pair gives us 60 usable bits) and use

  * multi-key `lax.sort` for deduplication (`torch.unique(dim=0)`), and
  * vectorized binary search (lower bound) for joins (`sphashquery`).

Both are deterministic and collision-free, unlike the reference hash path.

Coordinate layout convention matches torchsparse: `coords[:, :4] = (x, y, z,
batch)`, int32. Padding rows use `INVALID_COORD` which packs to a key pair
that sorts after every real key and never joins.

Bit budget (static): x, y in [-OFFSET, 2^14 - OFFSET), z in [-OFFSET_Z,
2^12 - OFFSET_Z), batch in [0, 2^17). This covers SemanticKITTI at 0.05 m
(spans ~3300) and nuScenes detection grids (1440 x 1440 x 40) with margin
for kernel-offset probes that step outside the populated range.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.ad_checkpoint import checkpoint_name

# Residual tag for the integer planning work (sorts, joins, unique
# maps). Under nn.remat with policy save_only_these_names(PLAN_TAG)
# these tensors are SAVED instead of recomputed in the backward --
# plan building is roughly half the forward cost and is pure int work
# with no gradient, so re-running it in the bwd pass is pure waste.
PLAN_TAG = "coord_plan"

Int3 = Tuple[int, int, int]

X_BITS = 14
Y_BITS = 14
Z_BITS = 12
OFFSET_XY = 512  # shift applied so slightly-negative probes stay packable
OFFSET_Z = 512
SPAN_X = 1 << X_BITS
SPAN_Y = 1 << Y_BITS
SPAN_Z = 1 << Z_BITS

INT32_MAX = np.int32(2**31 - 1)
# Sentinel coordinate value marking padding rows (never packs to a valid key).
INVALID_COORD = np.int32(-(2**20))


def make_ntuple(x: Union[int, Sequence[int]], ndim: int = 3) -> Tuple[int, ...]:
    if isinstance(x, (list, tuple, np.ndarray)):
        assert len(x) == ndim
        return tuple(int(v) for v in x)
    return (int(x),) * ndim


def pack_coords(coords: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pack (N, 4) int32 (x, y, z, b) coords into an order-preserving int32
    key pair (hi, lo). Out-of-range / sentinel coords map to (INT32_MAX,
    INT32_MAX), which sorts last and never equals a valid key.

    Sort order of (hi, lo) is lexicographic (b, z, y, x).
    """
    x = coords[:, 0] + OFFSET_XY
    y = coords[:, 1] + OFFSET_XY
    z = coords[:, 2] + OFFSET_Z
    b = coords[:, 3]
    valid = (
        (x >= 0) & (x < SPAN_X)
        & (y >= 0) & (y < SPAN_Y)
        & (z >= 0) & (z < SPAN_Z)
        & (b >= 0)
    )
    hi = (b << Z_BITS) | (z & (SPAN_Z - 1))
    lo = (y << X_BITS) | (x & (SPAN_X - 1))
    hi = jnp.where(valid, hi, INT32_MAX)
    lo = jnp.where(valid, lo, INT32_MAX)
    return hi.astype(jnp.int32), lo.astype(jnp.int32)


def key_is_valid(hi: jnp.ndarray) -> jnp.ndarray:
    return hi != INT32_MAX


def sort_by_key(hi, lo, *payloads):
    """Stable lexicographic sort by (hi, lo); payloads carried along."""
    out = jax.lax.sort((hi, lo) + tuple(payloads), num_keys=2, is_stable=True)
    return out


def lower_bound(table_hi: jnp.ndarray, table_lo: jnp.ndarray,
                q_hi: jnp.ndarray, q_lo: jnp.ndarray) -> jnp.ndarray:
    """Vectorized lower-bound binary search over a (hi, lo)-sorted table.

    Returns for every query the first table position whose key is >= the
    query key. Table must be sorted (padding keys INT32_MAX at the end are
    fine). Works for arbitrary query shapes.
    """
    n = table_hi.shape[0]
    steps = max(1, int(np.ceil(np.log2(n + 1))))
    lo_idx = jnp.zeros(q_hi.shape, dtype=jnp.int32)
    hi_idx = jnp.full(q_hi.shape, n, dtype=jnp.int32)

    def body(_, carry):
        lo_i, hi_i = carry
        mid = (lo_i + hi_i) >> 1
        mid_c = jnp.minimum(mid, n - 1)
        t_hi = table_hi[mid_c]
        t_lo = table_lo[mid_c]
        less = (t_hi < q_hi) | ((t_hi == q_hi) & (t_lo < q_lo))
        open_ = hi_i > lo_i     # keep converged intervals fixed
        lo_i = jnp.where(less & open_, mid + 1, lo_i)
        hi_i = jnp.where(less, hi_i, jnp.minimum(hi_i, mid))
        return lo_i, hi_i

    lo_idx, _ = jax.lax.fori_loop(0, steps, body, (lo_idx, hi_idx))
    return lo_idx


def _gallop_steps(rows: jnp.ndarray, q_hi: jnp.ndarray, q_lo: jnp.ndarray,
                  start, bound, n_steps: int) -> jnp.ndarray:
    """Unrolled galloping lower bound: pos = start + |{j in [start, bound):
    key[j] < q}|, exact whenever bound - start < 2**n_steps.

    Single carried array (pos), UNROLLED python loop: profiling (PLAN.md
    round 2) showed the lax loop forms spend ~half their device time on
    while-carry buffer copies (~40-80 us per round per carry) — the
    unrolled single-carry form has no loop carries at all. Each probe is
    one packed-row gather (rows[.., :2] = key hi/lo)."""
    n = rows.shape[0]
    pos = jnp.broadcast_to(jnp.asarray(start, jnp.int32), q_hi.shape)
    bound = jnp.broadcast_to(jnp.asarray(bound, jnp.int32), q_hi.shape)
    for k in range(n_steps - 1, -1, -1):
        step = np.int32(1 << k)
        cand = pos + step
        probe = jnp.minimum(cand - 1, n - 1)
        r = rows[probe]                                   # one row gather
        t_hi, t_lo = r[..., 0], r[..., 1]
        less = (t_hi < q_hi) | ((t_hi == q_hi) & (t_lo < q_lo))
        pos = jnp.where((cand <= bound) & less, cand, pos)
    return pos


def lower_bound_rows(rows: jnp.ndarray, q_hi: jnp.ndarray,
                     q_lo: jnp.ndarray) -> jnp.ndarray:
    """Lower bound over a packed (N, >=2) int32 row table [hi | lo | ...].

    TPU-perf-critical form: one row gather per probe (scalar-element
    gathers run ~20x slower), unrolled galloping search (no loop-carry
    copies — see _gallop_steps)."""
    n = rows.shape[0]
    steps = max(1, int(np.ceil(np.log2(n + 1))))
    return _gallop_steps(rows, q_hi, q_lo, 0, n, steps)


# coarse-sample spacing for the bracketed search; tuned on-chip via
# tools/microbench_conv.py --sample. Round 2 at stem scale: 8 -> 7.07 ms,
# 16 -> 6.72, 32 -> 6.98, 64 -> 30.2 (hard-lane capacity overflow ->
# backstop) — but END-TO-END 16 measured 4.19 scans/s vs 4.24 at 32
# (smaller levels pay the denser coarse pass), so 32 stays.
BRACKET_SAMPLE = 32

# --- direct-address index parameters (round 3). The join is reformulated
# from per-query binary search (~5-7 row-gather descriptors each, the
# measured round-2 wall) to a THREE-GATHER pipeline, all three on the
# <=256 B descriptor-rate plateau and all FULL-KEY (hi, lo) so every
# narrowing step is exact for any input:
#   1. fence-1.5 window: 32 full-key fences at S1 = W*FW row spacing,
#      bracketing the lower bound to S1 rows            (256 B row)
#   2. fence-1 window: 32 full-key fences at W row spacing, bracketing
#      to W rows                                        (256 B row)
#   3. key+perm window: WIN consecutive [hi | lo | perm] rows resolving
#      the lower bound AND every tap of a (dy, dz) group
#      (3*WIN int32 cols = 132 B row at WIN=11)
# plus a level-2 broadcast compare against the tiny global fence array
# (one full key every S1*FW = W*FW^2 rows — 8192 at W=8, FW=32) that
# seeds level 1.5 — so the
# join has NO data-dependent control flow at all. The original round-3
# formulation used a dense (b, z, y) -> x-run prefix table here; it was
# replaced because (a) its 6N-row shape sat past the gather engine's
# row-count cliff (measured: (512k, 2) i32 gathers at 167 Mrows/s vs 354
# for the same bytes in fewer rows), and (b) its capacity-overflow
# fallback compared lo-only fences across prefix boundaries — provably
# inexact (tests/test_direct_index.py reproduces both failure modes).
DIRECT_W = 8         # rows per level-1 fence block
DIRECT_WIN = 11      # winlp rows; covers W + max tap-run span 2 — the
#                      widest real kernel anywhere in the stack is ks3 /
#                      r=3 (span 2); wider kernels (ks>=5) take the exact
#                      search fallback (guard in grouped_window_query).
#                      A/B vs W=12/WIN=19 (span-6 coverage) measured FLAT
#                      on the v5e (seg 6.06 vs 6.00 scans/s, det 2.94 vs
#                      2.97 fps — noise): join cost is per-ROW descriptor
#                      count, not row bytes. Kept for the 42% smaller
#                      winlp build/memory (33 vs 57 int32 cols)
DIRECT_FW = 32       # full-key fences per window row (2 x 32 int32 = 256 B)
DIRECT_ENABLED = True  # global kill-switch (microbench A/B comparisons)


def lower_bound_rows_bracketed(rows: jnp.ndarray, q_hi: jnp.ndarray,
                               q_lo: jnp.ndarray, sample: int = None,
                               hard_div: int = 16,
                               refine_extra: int = 0) -> jnp.ndarray:
    """Lower bound for queries SORTED ascending along the last axis.

    Exploits monotonicity of lower-bound positions over sorted queries.
    Three phases, all with unrolled single-carry galloping probes (no
    lax-loop carry copies — PLAN.md round-2 profiling):

      1. coarse exact search on every `sample`-th query — small arrays,
         full log2(N) probes;
      2. static refine: log2(sample)+1 galloping probes finish every
         query whose [coarse_k, coarse_{k+1}] bracket is narrower than
         2*sample — the common case everywhere except density cliffs
         (z-plane boundaries);
      3. hard queries (wide brackets) are COMPACTED into a fixed
         capacity len(q)//hard_div and fully searched there, so cliff
         brackets no longer make every lane pay worst-bracket rounds
         (the old while_loop form averaged ~26 full-width rounds).

    A zero-iteration-in-practice while_loop backstops phase 3's capacity:
    any hard query beyond the compaction capacity still converges, just
    on the slow path, so results are exact for ANY input.
    """
    if sample is None:
        sample = BRACKET_SAMPLE
    n = rows.shape[0]
    m = q_hi.shape[-1]
    lead = q_hi.shape[:-1]
    full_steps = max(1, int(np.ceil(np.log2(n + 1))))

    # --- phase 1: coarse exact pass on every sample-th query
    c_hi = q_hi[..., ::sample]
    c_lo = q_lo[..., ::sample]
    coarse = lower_bound_rows(rows, c_hi, c_lo)              # (..., nseg)

    seg = jnp.arange(m, dtype=jnp.int32) // sample           # (M,)
    lo_i = jnp.broadcast_to(coarse[..., seg], lead + (m,))
    upper = jnp.concatenate(
        [coarse[..., 1:], jnp.full(lead + (1,), n, jnp.int32)], axis=-1)
    hi_i = jnp.broadcast_to(upper[..., seg], lead + (m,))
    # queries at the sampled columns are already exact
    exact = (jnp.arange(m, dtype=jnp.int32) % sample) == 0
    hi_i = jnp.where(exact, lo_i, hi_i)

    # --- phase 2: static refine for narrow brackets
    # log2(sample)+1 probes finish brackets narrower than 2*sample.
    # log2(sample) measured 3.48 scans/s e2e vs 4.41: brackets of width
    # [sample, 2*sample) are common (densities vary ~2x), and dropping
    # them all into the hard pass overflows its capacity into the
    # backstop. Keep the +1.
    # refine_extra: callers whose queries sample the table more coarsely
    # than 1:1 (strided-conv joins: each query advances ~s table rows)
    # deepen the refine so typical brackets still converge statically
    r_steps = max(1, int(np.ceil(np.log2(sample))) + 1 + refine_extra)
    nseg = coarse.shape[-1]
    easy_seg = (upper - coarse) < (1 << r_steps)             # (..., nseg)
    # padding queries (INT32_MAX keys) sort last and form one huge
    # end-bracket per group; their answers are never used (every caller
    # masks hits on key validity), so mark pad-started segments easy and
    # pin their lanes — otherwise padding dominates the hard pass
    pad_seg = c_hi == INT32_MAX
    easy_seg = easy_seg | pad_seg
    easy = jnp.broadcast_to(easy_seg[..., seg], lead + (m,))
    pos = _gallop_steps(rows, q_hi, q_lo, lo_i, hi_i, r_steps)
    pos = jnp.where(q_hi == INT32_MAX, n, pos)
    lo_i = jnp.where(easy, pos, lo_i)
    hi_i = jnp.where(easy, pos, hi_i)

    # --- phase 3: compact hard SEGMENTS (cliff brackets) to a fixed
    # capacity. Segment-level compaction on purpose: an element-level
    # nonzero is a cumsum over every query (measured ~15 ms/forward on
    # chip); over segments it is sample× smaller.
    total = (int(np.prod(lead, dtype=np.int64)) if lead else 1) * m
    total_seg = (total // m) * nseg
    seg_cap = max(8, total_seg // hard_div)
    hs = jnp.nonzero(~easy_seg.reshape(-1), size=seg_cap,
                     fill_value=total_seg)[0]
    valid_s = hs < total_seg
    g_i = jnp.minimum(hs // nseg, max(total // m - 1, 0))
    c_i = hs % nseg
    base = jnp.where(valid_s, g_i * m + c_i * sample, total)
    off = jnp.arange(sample, dtype=jnp.int32)[None, :]
    block = base[:, None] + off
    # mask fill segments and the ragged tail of the LAST segment (those
    # positions belong to the next group's queries)
    in_seg = valid_s[:, None] & (c_i[:, None] * sample + off < m)
    block = jnp.where(in_seg, block, total)
    sent = jnp.asarray([INT32_MAX], jnp.int32)
    qh = jnp.concatenate([q_hi.reshape(-1), sent])[block]
    ql = jnp.concatenate([q_lo.reshape(-1), sent])[block]
    start = jnp.where(valid_s, coarse.reshape(-1)[jnp.minimum(
        hs, total_seg - 1)], 0)[:, None]
    bound = jnp.where(valid_s, upper.reshape(-1)[jnp.minimum(
        hs, total_seg - 1)], 0)[:, None]
    res_h = _gallop_steps(rows, qh, ql, start, bound, full_steps)
    flat_idx = block.reshape(-1)
    lo_i = lo_i.reshape(-1).at[flat_idx].set(
        res_h.reshape(-1), mode="drop").reshape(lead + (m,))
    hi_i = hi_i.reshape(-1).at[flat_idx].set(
        res_h.reshape(-1), mode="drop").reshape(lead + (m,))

    # --- backstop: exact for any input even past phase-3 capacity
    def cond(carry):
        lo_c, hi_c = carry
        return jnp.any(hi_c > lo_c)

    def body(carry):
        lo_c, hi_c = carry
        mid = (lo_c + hi_c) >> 1
        mid_c = jnp.minimum(mid, n - 1)
        r = rows[mid_c]
        t_hi, t_lo = r[..., 0], r[..., 1]
        less = (t_hi < q_hi) | ((t_hi == q_hi) & (t_lo < q_lo))
        lo_c = jnp.where(less & (hi_c > lo_c), mid + 1, lo_c)
        hi_c = jnp.where(less, hi_c, jnp.minimum(hi_c, mid))
        return lo_c, hi_c

    lo_i, _ = jax.lax.while_loop(cond, body, (lo_i, hi_i))
    return lo_i


@struct.dataclass
class CoordTable:
    """Sorted key table over a coordinate set, for repeated joins.

    Equivalent of building the reference's cuckoo hash table once per
    coordinate map (backend/hashmap/hashmap_cuda.cu) and querying it many
    times (`sphashquery`, nn/functional/query.py:8-33). Keys + permutation
    are packed into 8-lane int32 rows so every probe is a single row
    gather. A pytree, so tables can be cached on SparseTensor.kmaps and
    shared by every plan built at the same coordinate map.
    """

    rows: jnp.ndarray                # (N, 8): [hi, lo, perm, pad...]
    direct: Any = None               # optional DirectIndex
    grid: Any = None                 # optional RankGrid (dense levels)
    # identity=True: the table was built assume_sorted, so the perm
    # column is arange — a resolved rank IS the original row index and
    # the rank-grid path can skip its perm gather (measured 68 ms/frame
    # of scalar-element gathers in the det ELK aux joins, round 5)
    identity: bool = struct.field(pytree_node=False, default=False)

    ROW_W = 8

    @property
    def hi(self):
        return self.rows[:, 0]

    @property
    def lo(self):
        return self.rows[:, 1]

    @property
    def perm(self):
        return self.rows[:, 2]

    def lower_bound(self, q_hi, q_lo):
        return lower_bound_rows(self.rows, q_hi, q_lo)

    def query(self, coords: jnp.ndarray,
              queries_sorted: bool = False) -> jnp.ndarray:
        """Return index of each query coord in the original coordinate rows,
        or -1 when absent (mirrors sphashquery's miss convention).
        With a direct-address index the lookup is 3 plateau-rate gathers;
        otherwise `queries_sorted` (coords in pack-key order along the row
        axis) switches to the coarse+bracket search."""
        shape = coords.shape[:-1]
        flat = coords.reshape(-1, coords.shape[-1])
        q_hi, q_lo = pack_coords(flat)
        if self.direct is not None:
            block = _direct_locate(self.direct, q_hi, q_lo)
            res, _, _ = _direct_resolve(self.direct, block, q_hi, q_lo, (0,))
            return checkpoint_name(res[0].reshape(shape), PLAN_TAG)
        if queries_sorted:
            pos = lower_bound_rows_bracketed(self.rows, q_hi, q_lo)
        else:
            pos = self.lower_bound(q_hi, q_lo)
        pos_c = jnp.minimum(pos, self.rows.shape[0] - 1)
        r = self.rows[pos_c]
        hit = (r[:, 0] == q_hi) & (r[:, 1] == q_lo) & key_is_valid(q_hi)
        idx = jnp.where(hit, r[:, 2], -1)
        return checkpoint_name(idx.reshape(shape), PLAN_TAG)


def build_table(coords: jnp.ndarray, assume_sorted: bool = False,
                direct: bool = True, grid_shape=None,
                grid_quantum: int = 1) -> CoordTable:
    """`assume_sorted=True` skips the sort (perm = identity) for coords
    already in pack-key order — the invariant the host collate functions
    and unique_coords/spdownsample maintain. Saves one full-key sort
    (~2 ms at 85k rows) per table build.

    `direct=True` (default) additionally builds the direct-address index
    (DirectIndex) that turns every later join into 3 plateau-rate gathers
    instead of a ~6-probe binary search.

    `grid_shape=(nx, ny, nz, nb)` additionally builds the dense RankGrid
    index (levels whose grid fits RANK_GRID_MAX_CELLS), which resolves a
    whole (dy, dz) tap group with ONE 12-byte gather. `grid_quantum` is
    the level's lattice spacing: coordinates and group x-runs step in
    multiples of it (stride-s seg levels pass s; unit lattices 1), and
    the grid indexes lattice cells coord//quantum.

    RankGrid PRECONDITION (silent-corruption hazard otherwise): every
    pack-valid coord must be UNIQUE, a multiple of `grid_quantum` on
    x/y/z, and inside `grid_shape`. A valid coord outside the grid (or
    misaligned) sets no occupancy bit, desynchronizing base_rank from
    the sorted-table position for every coord after it — wrong joins,
    no error. Callers guarantee this structurally (det: coords clipped
    to in_shape by voxelization; seg: collate drops coords beyond the
    dataset's static extent). Set RANK_GRID_CHECK=1 to verify at
    runtime (adds a popcount-vs-rowcount consistency callback)."""
    hi, lo = pack_coords(coords)
    n = coords.shape[0]
    perm = jnp.arange(n, dtype=jnp.int32)
    if not assume_sorted:
        hi, lo, perm = sort_by_key(hi, lo, perm)
    rows = jnp.zeros((n, CoordTable.ROW_W), jnp.int32)
    rows = rows.at[:, 0].set(hi).at[:, 1].set(lo).at[:, 2].set(perm)
    rows = checkpoint_name(rows, PLAN_TAG)
    grid = None
    if grid_shape is not None and RANK_GRID_ENABLED:
        q = int(grid_quantum)
        lat = [-(-int(v) // q) for v in grid_shape[:3]]
        cells = int(np.prod(np.asarray(lat + [int(grid_shape[3])],
                                       np.int64)))
        if cells <= RANK_GRID_MAX_CELLS:
            grid = build_rank_grid(coords, grid_shape, quantum=q)
    # the grid serves every groupable join at the level, which leaves the
    # DirectIndex unused — skip its (winlp + fence) builds then
    idx = (build_direct_index(rows)
           if (direct and DIRECT_ENABLED and grid is None) else None)
    return CoordTable(rows, direct=idx, grid=grid, identity=assume_sorted)


@struct.dataclass
class DirectIndex:
    """Direct-address join index over a sorted key table (round 3).

    The binary searches of rounds 1-2 cost ~5-7 row-gather descriptors per
    query -- the measured round-2 wall (PLAN.md: searches ~55 ms of a
    236 ms forward; det probes 126 ms). This index resolves a whole
    (dy, dz) tap group with THREE gathers, each on the <=256 B
    descriptor-rate plateau and each comparing FULL (hi, lo) keys, so
    every narrowing step is exact for any input:

      1. `fence15[b2 * FW]` -- 32 full-key fences at S1 = W*FW row
         spacing, narrowing the level-2 bracket to S1 rows. 256 B row,
         ceil(N/S1)-row table.
      2. `fence1[f15 * FW]` -- 32 full-key fences at W-row spacing,
         narrowing to W rows. 256 B row, ceil(N/W)-row table.
      3. `winlp[block]` -- WIN consecutive [hi | lo | perm] table rows;
         masked compares resolve the lower bound AND every tap of the
         group (their candidate x's occupy consecutive rows -- the
         quantum-run invariant of grouped_window_query). 228 B row.

    Level 2 is a broadcast compare against the tiny global fence array
    (`fence2`, one full key every S1*FW rows -- a handful of entries), so
    the join has NO data-dependent control flow anywhere. All tables sit
    far below the gather engine's row-count cliff (measured round 3: the
    per-row gather rate HALVES past a few hundred thousand table rows --
    167 vs 354 Mrows/s for the same bytes -- which is why the original
    dense (b, z, y)->x-run prefix table, 6N rows, was replaced by this
    hierarchy; its capacity-overflow path also compared lo-only keys
    across prefix boundaries, which was provably inexact -- both failure
    modes are pinned in tests/test_direct_index.py).

    Replaces the reference's cuckoo-table O(1) lookup
    (backend/hashmap/hashmap_cuda.cu) with a TPU-shaped O(1) lookup.
    """

    fence1: jnp.ndarray              # (ceil(N/W), 2*FW): [hi x FW|lo x FW]
    fence15: jnp.ndarray             # (ceil(N/(W*FW)), 2*FW)
    fence2: jnp.ndarray              # (2, ceil(N/(W*FW*FW))): broadcast
    winlp: jnp.ndarray               # (N, 3*WIN): [hi | lo | perm] x WIN


def build_direct_index(rows: jnp.ndarray) -> DirectIndex:
    """Build the DirectIndex for a sorted key table. All steps are
    bandwidth-bound (strided slices + window concats) -- no
    descriptor-bound gathers."""
    n = rows.shape[0]
    hi, lo, perm = rows[:, 0], rows[:, 1], rows[:, 2]
    w1, fw, win = DIRECT_W, DIRECT_FW, DIRECT_WIN
    s1 = w1 * fw
    mx = jnp.full((fw,), INT32_MAX, jnp.int32)

    def windows(fhi, flo):
        # row i = [fhi[i : i+FW] | flo[i : i+FW]], padded past the end
        # with never-less-than sentinels
        nf = fhi.shape[0]
        he = jnp.concatenate([fhi, mx])
        le = jnp.concatenate([flo, mx])
        cols = ([he[j:j + nf] for j in range(fw)]
                + [le[j:j + nf] for j in range(fw)])
        return jnp.stack(cols, axis=1)                     # (nf, 2*FW)

    fence1 = windows(hi[::w1], lo[::w1])
    fence15 = windows(hi[::s1], lo[::s1])
    fence2 = jnp.stack([hi[::s1 * fw], lo[::s1 * fw]], axis=0)

    # winlp: WIN consecutive [hi | lo | perm] rows per window position
    hi_ext = jnp.concatenate([hi, jnp.full((win,), INT32_MAX, jnp.int32)])
    lo_ext = jnp.concatenate([lo, jnp.full((win,), INT32_MAX, jnp.int32)])
    pm_ext = jnp.concatenate([perm, jnp.full((win,), -1, jnp.int32)])
    cols = ([hi_ext[j:j + n] for j in range(win)]
            + [lo_ext[j:j + n] for j in range(win)]
            + [pm_ext[j:j + n] for j in range(win)])
    winlp = jnp.stack(cols, axis=1)                        # (N, 3*WIN)

    return DirectIndex(checkpoint_name(fence1, PLAN_TAG),
                       checkpoint_name(fence15, PLAN_TAG),
                       checkpoint_name(fence2, PLAN_TAG), winlp)


def _direct_locate(d: DirectIndex, q_hi: jnp.ndarray, q_lo: jnp.ndarray):
    """Per query key: a `block` row with lower_bound(q) guaranteed in
    [block, block + W]. Three full-key narrowing levels (broadcast ->
    fence-window gather -> fence-window gather); exact for ANY input.
    Each level's window provably contains the next bracket: the fence at
    every block start IS the previous level's bracketing fence (S1 and
    S1*FW are multiples of W), so whenever an earlier level counted a
    fence below q, the next level's first fence is below q too and its
    window of FW fences spans the whole previous bracket."""
    w1, fw = DIRECT_W, DIRECT_FW

    def count_less(fhi, flo):
        less = (fhi < q_hi[..., None]) | ((fhi == q_hi[..., None])
                                          & (flo < q_lo[..., None]))
        return jnp.sum(less.astype(jnp.int32), axis=-1)

    # level 2: broadcast over the global fence array (a handful of keys)
    k2 = count_less(d.fence2[0], d.fence2[1])
    b2 = jnp.maximum(k2 - 1, 0)
    # level 1.5: 32 fences at S1 spacing from the level-2 bracket
    r15 = jnp.minimum(b2 * fw, d.fence15.shape[0] - 1)
    row = d.fence15[r15]
    f15 = r15 + jnp.maximum(count_less(row[..., :fw], row[..., fw:]) - 1, 0)
    # level 1: 32 fences at W spacing from the level-1.5 bracket
    r1 = jnp.minimum(f15 * fw, d.fence1.shape[0] - 1)
    row = d.fence1[r1]
    k1 = count_less(row[..., :fw], row[..., fw:])
    return (r1 + jnp.maximum(k1 - 1, 0)) * w1


def _direct_resolve(d: DirectIndex, block, q_hi, q_lo0,
                    dxs: Sequence[int]):
    """Resolve the taps of one (dy, dz) group from a single winlp window.

    `q_lo0` is the group's smallest-x candidate key (lo part); `dxs` the
    static x-offsets of each tap relative to it (multiples of the
    quantum). Hit compares use FULL keys, so absent coordinates --
    padding, out-of-range probes, coordinates from another (b, z, y)
    prefix -- miss naturally.
    Returns (res, slots, lb):
      res[t]:   original row index of tap t's hit, or -1  (list of arrays)
      slots[t]: hit row - lb (int8, in [0, WIN)), or -1
      lb:       lower bound of (q_hi, q_lo0) -- the group's window base.
    """
    win = DIRECT_WIN
    n = d.winlp.shape[0]
    wrow = d.winlp[jnp.minimum(block, n - 1)]                # (..., 3*WIN)
    whi = wrow[..., :win]
    wlo = wrow[..., win:2 * win]
    wpm = wrow[..., 2 * win:]
    valid = (q_hi != INT32_MAX)[..., None]
    qh = q_hi[..., None]
    less = valid & ((whi < qh) | ((whi == qh)
                                  & (wlo < q_lo0[..., None])))
    lb = block + jnp.sum(less.astype(jnp.int32), axis=-1)
    res, slots = [], []
    for dx in dxs:
        hit = valid & (whi == qh) & (wlo == (q_lo0 + dx)[..., None])
        found = jnp.any(hit, axis=-1)
        pm = jnp.max(jnp.where(hit, wpm, -1), axis=-1)
        jpos = jnp.max(jnp.where(
            hit, block[..., None] + jnp.arange(win, dtype=jnp.int32), 0),
            axis=-1)
        res.append(jnp.where(found, pm, -1))
        slots.append(jnp.where(found, jpos - lb, -1).astype(jnp.int8))
    return res, slots, lb


# --- dense rank-grid join (round 4). For levels whose (b, z, y, x) grid
# fits the cell budget, the join collapses to ONE 12-byte gather per
# (dy, dz) tap group: occupancy is packed 32 x-cells per uint32 WORD
# (x fastest, per-(b, z, y) line padded to a word boundary), and each
# word row stores
#
#     [base_rank, word, next_word]
#
# where base_rank is the exclusive cumsum of popcount(word) in pack-key
# (b, z, y, x)-major order — exactly the sorted-table position of the
# word's first set bit. A group anchor at bit position p reads its word
# row, forms the 32-bit window win = (word >> p) | (next << (32-p)), and
# resolves tap t at run offset dx as
#
#     hit = win bit dx;  pos = base_rank + popcount(word & ((1<<p)-1))
#                              + popcount(win & ((1<<dx)-1))
#
# riding the quantum-run invariant (a group's hits occupy consecutive
# table rows from the lower bound). vs the DirectIndex pipeline this
# replaces 3 gathers + key-compare/reduce VPU work per group with ONE
# gather + popcounts, and — the decisive part vs a per-CELL grid, which
# A/B'd 15% SLOWER end-to-end — the gather table has cells/32 rows
# (det stem: 2.6M, not 83M), staying on the gather engine's table-size
# plateau (round-3c: rates fall ~2x+ from 1M- to 40M-row tables).
# Build cost: one N-row scatter + popcount + words-cumsum — ~raw-sort
# cost, amortized over every conv at the level.
import os as _os
RANK_GRID_MAX_CELLS = int(_os.environ.get("RANK_GRID_MAX_CELLS",
                                          96_000_000))
RANK_GRID_ENABLED = _os.environ.get("RANK_GRID", "1") != "0"
RANK_MARGIN = 4      # low-x anchor margin: covers group bases at
#                      x0 = -pad (strided convs probe below the grid while
#                      their higher taps are still in range)
RANK_MAX_RUN = 16    # max tap-run span (bits) the 32-bit window serves
#                      with margin to spare; runs longer than this fall
#                      back to the DirectIndex/search paths


@struct.dataclass
class RankGrid:
    """Word-packed dense join index over a level grid (see block comment
    above). `rows[nwords]` is a zero sentinel: out-of-grid anchors gather
    it and decode to all-miss. PRECONDITION (see build_table): pack-valid
    coords unique, multiples of `quantum`, inside the grid — violations
    silently desynchronize ranks from sorted-table positions. nx/ny/nz
    are LATTICE extents (raw extent / quantum, ceil)."""

    rows: jnp.ndarray                  # (nwords + 1, 3) int32
    nx: int = struct.field(pytree_node=False)
    ny: int = struct.field(pytree_node=False)
    nz: int = struct.field(pytree_node=False)
    nb: int = struct.field(pytree_node=False)
    nwx: int = struct.field(pytree_node=False)   # words per x line
    quantum: int = struct.field(pytree_node=False, default=1)


def _rank_grid_words(nx: int) -> int:
    return -(-(nx + RANK_MARGIN + RANK_MAX_RUN) // 32)


def _rank_grid_mismatch(total, nvalid):
    if int(total) != int(nvalid):
        raise ValueError(
            f"RankGrid precondition violated: {int(nvalid)} pack-valid "
            f"coords but {int(total)} grid occupancy bits — some valid "
            f"coord is out-of-grid, misaligned, or duplicated; joins at "
            f"this level would be silently wrong (see build_table doc)")


def build_rank_grid(coords: jnp.ndarray, grid_shape,
                    quantum: int = 1) -> RankGrid:
    """grid_shape = (nx, ny, nz, nb) RAW extents; coords (N, 4) =
    (x, y, z, b) int32, unique multiples of `quantum`, padding rows at
    INVALID_COORD. NOT checkpoint-tagged: the query outputs are, so the
    backward never rebuilds it."""
    q = int(quantum)
    nxr, nyr, nzr, nb = (int(v) for v in grid_shape)
    nx, ny, nz = -(-nxr // q), -(-nyr // q), -(-nzr // q)
    nwx = _rank_grid_words(nx)
    nwords = nb * nz * ny * nwx
    x = coords[:, 0] // q
    y = coords[:, 1] // q
    z = coords[:, 2] // q
    b = coords[:, 3]
    valid = ((x >= 0) & (x < nx) & (y >= 0) & (y < ny)
             & (z >= 0) & (z < nz) & (b >= 0) & (b < nb))
    bitpos = x + RANK_MARGIN
    w = ((b * nz + z) * ny + y) * nwx + (bitpos >> 5)
    w = jnp.where(valid, w, nwords)
    bits = jnp.uint32(1) << (bitpos & 31).astype(jnp.uint32)
    # unique coords => unique (word, bit) pairs => add == bitwise-or
    words = jnp.zeros((nwords + 1,), jnp.uint32).at[w].add(bits)
    wcur = words[:nwords]
    pc = jax.lax.population_count(wcur).astype(jnp.int32)
    base = jnp.cumsum(pc) - pc                     # exclusive: lower bound
    if _os.environ.get("RANK_GRID_CHECK", "0") == "1":
        hi_k, _ = pack_coords(coords)
        nvalid = jnp.sum(key_is_valid(hi_k).astype(jnp.int32))
        jax.debug.callback(_rank_grid_mismatch, base[-1] + pc[-1], nvalid)
    wnext = jnp.concatenate([wcur[1:], jnp.zeros((1,), jnp.uint32)])
    i32 = lambda u: jax.lax.bitcast_convert_type(u, jnp.int32)  # noqa:E731
    rows = jnp.stack([base, i32(wcur), i32(wnext)], axis=1)
    rows = jnp.concatenate([rows, jnp.zeros((1, 3), jnp.int32)])
    return RankGrid(rows, nx=nx, ny=ny, nz=nz, nb=nb, nwx=nwx, quantum=q)


def _grouped_query_rank(table: "CoordTable", glist, base_coords,
                        identity_perm: bool, free_gi, k, m, q_hi):
    """Rank-grid body of grouped_window_query: one word-row gather per
    searched (dy, dz) group; the self-query center group keeps the
    zero-gather shifted-compare path. Same return contract."""
    grid = table.grid
    nwx = grid.nwx
    nwords = grid.nb * grid.nz * grid.ny * nwx
    g = len(glist)
    in_idx = [None] * k
    slot = [None] * k if identity_perm else None
    lb_list = [None] * g

    if free_gi is not None:
        _self_group_fill(table, glist, free_gi, q_hi[free_gi], grid.quantum,
                         m, identity_perm, in_idx, slot, lb_list)

    rest = [gi for gi in range(g) if gi != free_gi]
    if rest:
        q = grid.quantum
        # base coords and group offsets are multiples of the lattice
        # quantum (grouped_window_query gate), so // is exact division;
        # INVALID_COORD stays deeply negative and fails the valid mask
        bx = base_coords[:, 0]
        by = base_coords[:, 1]
        bz = base_coords[:, 2]
        bb = base_coords[:, 3]
        cx = jnp.stack([(bx + glist[gi][0][0]) // q for gi in rest])
        cy = jnp.stack([(by + glist[gi][0][1]) // q for gi in rest])
        cz = jnp.stack([(bz + glist[gi][0][2]) // q for gi in rest])
        valid = ((cx >= -RANK_MARGIN) & (cx < grid.nx)
                 & (cy >= 0) & (cy < grid.ny)
                 & (cz >= 0) & (cz < grid.nz)
                 & (bb >= 0)[None] & (bb < grid.nb)[None])
        bitpos = cx + RANK_MARGIN
        w = (((bb[None] * grid.nz + cz) * grid.ny + cy) * nwx
             + (bitpos >> 5))
        w = jnp.where(valid, w, nwords)
        r = grid.rows[w]                                    # (G', M, 3)
        u32 = lambda v: jax.lax.bitcast_convert_type(        # noqa:E731
            v, jnp.uint32)
        base = r[..., 0]
        word = u32(r[..., 1])
        wnxt = u32(r[..., 2])
        bit = (bitpos & 31).astype(jnp.uint32)
        sh = (jnp.uint32(32) - bit) & 31
        win = (word >> bit) | jnp.where(bit == 0, jnp.uint32(0),
                                        wnxt << sh)
        lowmask = (jnp.uint32(1) << bit) - 1
        lb = base + jax.lax.population_count(
            word & lowmask).astype(jnp.int32)
        if identity_perm:
            # pin padding/out-of-grid anchors to the last valid base (the
            # one-hot Pallas kernel tiles windows by base spread; the XLA
            # apply never consumes them — slots are -1)
            last_valid = jnp.max(jnp.where(valid, lb, 0), axis=-1,
                                 keepdims=True)
            lb = jnp.where(valid, lb, last_valid)
        for ci, gi in enumerate(rest):
            (ox0, _, _), taps = glist[gi]
            lb_list[gi] = lb[ci]
            wi = win[ci]
            rank = jnp.zeros(wi.shape, jnp.int32)
            prev = 0
            for ox, t in taps:
                dx = (ox - ox0) // q           # lattice bit offset
                if dx > prev:                  # bits [prev, dx) join rank
                    seg = jax.lax.population_count(
                        (wi >> jnp.uint32(prev))
                        & jnp.uint32((1 << (dx - prev)) - 1))
                    rank = rank + seg.astype(jnp.int32)
                    prev = dx
                hit = ((wi >> jnp.uint32(dx)) & 1) == 1
                pos = lb[ci] + rank
                if identity_perm or table.identity:
                    # identity-perm table: a rank IS the original row
                    # index — skip the rows[pos, 2] perm gather (a
                    # scalar-element gather, the round-5 det profile's
                    # single largest slice at 68 ms/frame)
                    res = pos
                else:
                    res = table.rows[jnp.minimum(pos, table.rows.shape[0]
                                                 - 1), 2]
                in_idx[t] = jnp.where(hit, res, -1)
                if identity_perm:
                    slot[t] = jnp.where(hit, rank, -1).astype(jnp.int8)

    in_idx = checkpoint_name(jnp.stack(in_idx), PLAN_TAG)
    if identity_perm:
        return (in_idx, checkpoint_name(jnp.stack(lb_list), PLAN_TAG),
                checkpoint_name(jnp.stack(slot), PLAN_TAG))
    return in_idx, None, None


def _self_group_fill(table, glist, free_gi, q_hi_g, quantum, m,
                     identity_perm, in_idx, slot, lb_list):
    """Fill the self-query center group's taps via shifted-row key
    compares — zero gather descriptors (factored from the direct path;
    see _grouped_query_direct)."""
    (ox0f, _, _), ftaps = glist[free_gi]
    rows = table.rows
    hi_r, lo_r, pm_r = rows[:, 0], rows[:, 1], rows[:, 2]
    i_arr = jnp.arange(m, dtype=jnp.int32)
    mx = jnp.full((1,), INT32_MAX, jnp.int32)
    m1 = jnp.full((1,), -1, jnp.int32)
    hi_prev = jnp.concatenate([mx, hi_r[:-1]])
    lo_prev = jnp.concatenate([mx, lo_r[:-1]])
    hi_next = jnp.concatenate([hi_r[1:], mx])
    lo_next = jnp.concatenate([lo_r[1:], mx])
    pm_prev = jnp.concatenate([m1, pm_r[:-1]])
    pm_next = jnp.concatenate([pm_r[1:], m1])
    gvalid = q_hi_g != INT32_MAX
    hit_prev = gvalid & (hi_prev == hi_r) & (lo_prev == lo_r - quantum)
    hit_next = gvalid & (hi_next == hi_r) & (lo_next == lo_r + quantum)
    lb = jnp.where(hit_prev, i_arr - 1, i_arr) if ox0f == -quantum \
        else i_arr
    lb_list[free_gi] = lb
    for ox, t in ftaps:
        if ox == 0:
            hit, pos, pm = gvalid, i_arr, pm_r
        elif ox == -quantum:
            hit, pos, pm = hit_prev, i_arr - 1, pm_prev
        elif ox == quantum:
            hit, pos, pm = hit_next, i_arr + 1, pm_next
        else:
            raise AssertionError("self-query group spans one x step")
        in_idx[t] = jnp.where(hit, pm, -1)
        if identity_perm:
            slot[t] = jnp.where(hit, pos - lb, -1).astype(jnp.int8)


def _grouped_query_direct(table: "CoordTable", glist, q_hi, q_lo,
                          quantum: int, identity_perm: bool, free_gi, k, m):
    """Direct-address body of grouped_window_query: one stacked
    locate+resolve (3 gathers per group) for all searched groups, and
    shifted-row compares (ZERO gathers) for the self-query center group.
    Same return contract as grouped_window_query."""
    d = table.direct
    g = len(glist)
    in_idx = [None] * k
    slot = [None] * k if identity_perm else None
    lb_list = [None] * g

    if free_gi is not None:
        # center (dy, dz) == (0, 0) group of a self-query join: targets are
        # the immediately adjacent table rows, so hits reduce to shifted
        # key compares along the table — no gathers at all.
        _self_group_fill(table, glist, free_gi, q_hi[free_gi], quantum, m,
                         identity_perm, in_idx, slot, lb_list)

    rest = [gi for gi in range(g) if gi != free_gi]
    # cluster groups with identical relative-offset patterns: each cluster
    # is one stacked locate + resolve (and one shared while backstop)
    clusters = {}
    for gi in rest:
        (ox0, _, _), taps = glist[gi]
        dxs = tuple(ox - ox0 for ox, _ in taps)
        clusters.setdefault(dxs, []).append(gi)
    for dxs, gis in clusters.items():
        sel = np.asarray(gis)
        qh, ql = q_hi[sel], q_lo[sel]
        block = _direct_locate(d, qh, ql)
        res, sl, lb = _direct_resolve(d, block, qh, ql, dxs)
        if identity_perm:
            # padding queries' bases are never consumed by the XLA apply
            # (slots are -1) but the one-hot Pallas kernel tiles windows
            # by base spread — pin them to the last valid base like the
            # search path did
            valid_q = qh != INT32_MAX
            last_valid = jnp.max(jnp.where(valid_q, lb, 0), axis=-1,
                                 keepdims=True)
            lb = jnp.where(valid_q, lb, last_valid)
        for ci, gi in enumerate(gis):
            lb_list[gi] = lb[ci]
            for ti, (_, t) in enumerate(glist[gi][1]):
                in_idx[t] = res[ti][ci]
                if identity_perm:
                    slot[t] = sl[ti][ci]

    in_idx = checkpoint_name(jnp.stack(in_idx), PLAN_TAG)
    if identity_perm:
        return (in_idx, checkpoint_name(jnp.stack(lb_list), PLAN_TAG),
                checkpoint_name(jnp.stack(slot), PLAN_TAG))
    return in_idx, None, None


def unique_coords(coords: jnp.ndarray, out_capacity: int):
    """Deduplicate coordinate rows into a fixed-capacity output.

    Returns (out_coords, inverse, out_nnz):
      * out_coords: (out_capacity, 4) int32, unique coords in (b, z, y, x)
        lexicographic key order, padded with INVALID_COORD;
      * inverse:    (N,) int32, for each input row the slot of its unique
        coord, or -1 for padding/overflowed rows;
      * out_nnz:    int32 scalar, number of unique coords (clamped).

    Equivalent of `torch.unique(coords, dim=0)` + `sphashquery` inverse in
    voxel_to_aux (segmentation/core/models/utils.py:45-51). Row *order*
    differs from torch.unique (which sorts by the column tuple as given);
    all downstream math is row-order invariant.
    """
    n = coords.shape[0]
    hi, lo = pack_coords(coords)
    idx = jnp.arange(n, dtype=jnp.int32)
    s_hi, s_lo, s_idx = sort_by_key(hi, lo, idx)

    prev_hi = jnp.concatenate([jnp.full((1,), -1, jnp.int32), s_hi[:-1]])
    prev_lo = jnp.concatenate([jnp.full((1,), -1, jnp.int32), s_lo[:-1]])
    valid = key_is_valid(s_hi)
    is_new = ((s_hi != prev_hi) | (s_lo != prev_lo)) & valid

    slot = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # unique slot per sorted row
    out_nnz = jnp.minimum(jnp.sum(is_new.astype(jnp.int32)), out_capacity)

    in_range = valid & (slot < out_capacity)
    slot_or_dump = jnp.where(in_range, slot, out_capacity)

    # Unique coords: first row of each group writes its coords to its slot.
    write_slot = jnp.where(is_new & in_range, slot, out_capacity)
    out_coords = jnp.full((out_capacity + 1, 4), INVALID_COORD, dtype=jnp.int32)
    out_coords = out_coords.at[write_slot].set(coords[s_idx], mode="drop")
    out_coords = out_coords[:out_capacity]

    # Inverse map back to original row order.
    inverse = jnp.zeros((n,), jnp.int32).at[s_idx].set(
        jnp.where(in_range, slot_or_dump, -1).astype(jnp.int32)
    )
    return (checkpoint_name(out_coords, PLAN_TAG),
            checkpoint_name(inverse, PLAN_TAG),
            checkpoint_name(out_nnz, PLAN_TAG))


def offset_groups(offsets: np.ndarray):
    """Group tap offsets by (dy, dz); members ordered by x. Returns
    [((ox0, oy, oz), [(ox, tap_id), ...]), ...] — static metadata."""
    offs = np.asarray(offsets)
    groups = {}
    for t in range(offs.shape[0]):
        groups.setdefault((int(offs[t, 1]), int(offs[t, 2])), []).append(
            (int(offs[t, 0]), t))
    glist = []
    for (oy, oz), taps in groups.items():
        taps = sorted(taps)
        glist.append(((taps[0][0], oy, oz), taps))
    return glist


def _self_group_pos(rows: jnp.ndarray, q_hi: jnp.ndarray, q_lo: jnp.ndarray,
                    identity: bool, m: int) -> jnp.ndarray:
    """Base positions of the (dy, dz) == (0, 0) group when the queries ARE
    the table rows in table order. identity (ox0 == 0): position is the
    own row index — zero probes. ox0 == -quantum: the target key differs
    only in x's low bits, so its lower bound is the immediately preceding
    row iff that row's key >= target, else the own row — ONE row probe."""
    i_arr = jnp.arange(m, dtype=jnp.int32)
    if identity:
        return i_arr
    prev = rows[jnp.maximum(i_arr - 1, 0)]
    p_hi, p_lo = prev[:, 0], prev[:, 1]
    ge = (p_hi > q_hi) | ((p_hi == q_hi) & (p_lo >= q_lo))
    return jnp.where((i_arr > 0) & ge, i_arr - 1, i_arr)


def grouped_window_query(table: "CoordTable", base_coords: jnp.ndarray,
                         offsets: np.ndarray, quantum: int,
                         queries_sorted: bool = False,
                         identity_perm: bool = False,
                         self_query: bool = False,
                         refine_extra: int = 0):
    """Kernel-window join exploiting sorted-key adjacency.

    For each base coordinate and each tap offset (K, 3), find the table row
    of base+offset. Taps sharing (dy, dz) whose x-offsets form an
    arithmetic run with step == `quantum` (the level's x lattice spacing)
    are resolved with ONE binary search (at the run's smallest x) plus G
    consecutive-row key compares: occupied x cells are multiples of the
    quantum, so the G candidate keys can only occupy the G rows following
    the lower bound. Cuts binary-search row traffic ~3x for 3^3 kernels.

    `queries_sorted=True` (base_coords in pack-key order) switches the
    search to the coarse+bracket form (lower_bound_rows_bracketed), ~2x
    fewer gather rounds. `identity_perm=True` (table built with
    assume_sorted over the same row order as the caller's feature rows)
    additionally returns the window-plan arrays that let the conv apply
    gather one G-wide row per GROUP instead of one row per tap:

    Returns (in_idx, base_pos, slot):
      in_idx:   (K, M) int32 table->original row per tap, -1 miss;
      base_pos: (Gg, M) int32 lower-bound row per group (None unless
                identity_perm);
      slot:     (K, M) int8 window slot of each tap's hit relative to its
                group's base_pos, -1 miss (None unless identity_perm).

    `self_query=True` asserts base_coords ARE the table's own coords in
    table-row order, which makes the (dy, dz) == (0, 0) group's search
    algebraically free: the identity tap sits at its own row index, and
    the ks3 center group's base (x - q, y, z) is either the immediately
    preceding row or the row itself — ONE key probe instead of a search.

    Requires every group to be a quantum run — callers check
    `can_group_offsets` first.
    """
    offs = np.asarray(offsets)
    k = offs.shape[0]
    m = base_coords.shape[0]
    glist = offset_groups(offs)
    g = len(glist)
    gmax = max(len(taps) for _, taps in glist)

    # one lower_bound over all group-base queries
    base_xyz = base_coords[:, :3]
    b_col = base_coords[:, 3:]
    q_all = []
    for (ox, oy, oz), _ in glist:
        off = jnp.asarray([ox, oy, oz], jnp.int32)
        q_all.append(jnp.concatenate([base_xyz + off, b_col], axis=1))
    q_all = jnp.stack(q_all)                       # (G, M, 4)
    q_hi, q_lo = pack_coords(q_all.reshape(-1, 4))
    q_hi = q_hi.reshape(g, m)
    q_lo = q_lo.reshape(g, m)

    # self-query shortcut: the (dy,dz)=(0,0) group needs no search
    free_gi = None
    if self_query:
        for gi, ((ox0, oy, oz), _) in enumerate(glist):
            if oy == 0 and oz == 0 and ox0 in (0, -quantum):
                free_gi = gi
                break

    # rank-grid path: one word-row gather resolves a whole tap run, for
    # levels on the grid's lattice (quantum == grid.quantum: unit det
    # spconv levels, stride-s seg levels) whose runs fit the 32-bit
    # window and whose anchors stay inside the low-x margin
    if table.grid is not None and quantum == table.grid.quantum:
        gq = table.grid.quantum
        gspan = max((max(ox for ox, _ in taps) - ox0) // gq + 1
                    for (ox0, _, _), taps in glist)
        min_ox0 = min(ox0 for (ox0, _, _), _ in glist)
        if gspan <= RANK_MAX_RUN and min_ox0 >= -RANK_MARGIN * gq:
            return _grouped_query_rank(table, glist, base_coords,
                                       identity_perm, free_gi, k, m, q_hi)

    # winlp coverage: the group window must fit LB-block (<= W) plus the
    # tap run's row span (gmax - 1 on-lattice rows). Wider kernels fall
    # back to the exact search path below (same results, more probes).
    if table.direct is not None and gmax - 1 <= DIRECT_WIN - DIRECT_W - 1:
        return _grouped_query_direct(table, glist, q_hi, q_lo, quantum,
                                     identity_perm, free_gi, k, m)

    if free_gi is not None:
        free_pos = _self_group_pos(table.rows, q_hi[free_gi], q_lo[free_gi],
                                   glist[free_gi][0][0] == 0, m)

    search_gis = np.asarray([gi for gi in range(g) if gi != free_gi])
    if queries_sorted:
        pos_s = lower_bound_rows_bracketed(table.rows, q_hi[search_gis],
                                           q_lo[search_gis],
                                           refine_extra=refine_extra)
    else:
        pos_s = table.lower_bound(
            q_hi[search_gis].reshape(-1),
            q_lo[search_gis].reshape(-1)).reshape(len(search_gis), m)
    if free_gi is None:
        pos = pos_s
    else:
        parts = []
        si = 0
        for gi in range(g):
            if gi == free_gi:
                parts.append(free_pos)
            else:
                parts.append(pos_s[si])
                si += 1
        pos = jnp.stack(parts)

    n = table.rows.shape[0]
    # shifted-concat key window: one (M, 3*gmax) gather per group replaces
    # gmax (M, 8) gathers — window row j holds [hi, lo, perm] of table row
    # base+j (padded past the end with never-matching sentinels)
    pad = jnp.full((gmax, 3), INT32_MAX, jnp.int32)
    keys3 = jnp.concatenate([table.rows[:, :3], pad], axis=0)   # (N+gmax, 3)
    keysW = jnp.concatenate([keys3[j:j + n] for j in range(gmax)],
                            axis=1)                             # (N, 3*gmax)

    in_idx = [None] * k
    slot = [None] * k if identity_perm else None
    base_list = []
    for gi, ((ox0, oy, oz), taps) in enumerate(glist):
        gsize = len(taps)
        base = jnp.minimum(pos[gi], n - 1)
        if identity_perm:
            # padding queries (sorted last) would clamp to n-1 and blow up
            # the per-tile window spread of the one-hot conv kernel; their
            # slots are -1 (miss) so pin them to the last VALID query's
            # position instead
            valid_g = q_hi[gi] != INT32_MAX
            last_valid = jnp.max(jnp.where(valid_g, base, 0))
            base = jnp.where(valid_g, base, last_valid)
        base_list.append(base)
        win = keysW[base]                           # (M, 3*gmax)
        for ti, (ox, t) in enumerate(taps):
            dx = ox - ox0
            t_hi = q_hi[gi]
            t_lo = q_lo[gi] + dx                   # x lives in lo's low bits
            valid_q = t_hi != INT32_MAX
            res = jnp.full((m,), -1, jnp.int32)
            sl = jnp.full((m,), -1, jnp.int8) if identity_perm else None
            for r in range(gsize):
                hit = ((win[:, 3 * r] == t_hi) & (win[:, 3 * r + 1] == t_lo)
                       & valid_q)
                res = jnp.where(hit, win[:, 3 * r + 2], res)
                if identity_perm:
                    sl = jnp.where(hit, jnp.int8(r), sl)
            in_idx[t] = res
            if identity_perm:
                slot[t] = sl
    in_idx = checkpoint_name(jnp.stack(in_idx), PLAN_TAG)
    if identity_perm:
        return (in_idx, checkpoint_name(jnp.stack(base_list), PLAN_TAG),
                checkpoint_name(jnp.stack(slot), PLAN_TAG))
    return in_idx, None, None


def can_group_offsets(offsets: np.ndarray, quantum: int) -> bool:
    """True when every (dy, dz) tap group's x-offsets form an arithmetic
    run with step == quantum (the grouped_window_query precondition)."""
    offs = np.asarray(offsets)
    groups = {}
    for t in range(offs.shape[0]):
        groups.setdefault((int(offs[t, 1]), int(offs[t, 2])), []).append(
            int(offs[t, 0]))
    for xs in groups.values():
        xs = sorted(xs)
        for a, b in zip(xs, xs[1:]):
            if b - a != quantum:
                return False
    return True


@functools.lru_cache(maxsize=None)
def kernel_offsets_np(size: Union[int, Int3], stride: Union[int, Int3] = 1,
                      dilation: Union[int, Int3] = 1) -> np.ndarray:
    """Enumerate kernel tap offsets, replicating the reference's weight
    layout exactly (torchsparse nn/utils/kernel.py:11-32): odd kernel
    volumes are z-major (MinkowskiEngine compatible), even are x-major.
    """
    size = make_ntuple(size)
    stride = make_ntuple(stride)
    dilation = make_ntuple(dilation)
    axes = [
        np.arange(-size[k] // 2 + 1, size[k] // 2 + 1) * stride[k] * dilation[k]
        for k in range(3)
    ]
    if int(np.prod(size)) % 2 == 1:
        offs = [[x, y, z] for z in axes[2] for y in axes[1] for x in axes[0]]
    else:
        offs = [[x, y, z] for x in axes[0] for y in axes[1] for z in axes[2]]
    return np.asarray(offs, dtype=np.int32)
