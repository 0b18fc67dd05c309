"""DirectIndex exactness pins (round 3).

The original round-3 direct join (dense (b,z,y)->x-run prefix table +
lo-only level-1 fences) had two provable failure modes, both reproduced
here against the hierarchical full-key redesign that fixed them:

  1. dense-capacity overflow fell back to a full-range run compared with
     lo-only fences across (b, z) prefix boundaries -> FALSE hits
     (4743/5000 wrong on the identical-lo stack below);
  2. x-runs longer than the fence spacing with wide kernels (ks >= 5)
     pushed hits past the winlp window -> MISSED hits at exactly the
     LB-block == W lanes (744 wrong on the 3000-row line below, every
     24th query).

Exactness contract now: full (hi, lo) compares at every narrowing level
and in the hit test, so the join is exact for ANY packable input; kernels
whose tap-run span exceeds the winlp coverage fall back to the exact
search path (guard in grouped_window_query).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

from link_tpu.sparse import coords as C


def test_identical_lo_stack_exact():
    """3500 rows with identical lo (x=y=0) and distinct hi (z): every
    x-run is one row; all narrowing decisions ride the hi key."""
    n = 3500                      # z + 512 < 4096 (the packing budget)
    coords = np.zeros((n, 4), np.int32)
    coords[:, 2] = np.arange(n)
    table = C.build_table(jnp.asarray(coords), assume_sorted=True)
    idx = np.asarray(table.query(jnp.asarray(coords)))
    np.testing.assert_array_equal(idx, np.arange(n))


def test_long_run_wide_kernel_exact():
    """One (b, z, y) line of 3000 consecutive x's: runs far longer than
    every fence spacing; ks7 taps span 6 rows past the lower bound."""
    n = 3000
    coords = np.zeros((n, 4), np.int32)
    coords[:, 0] = np.arange(n)
    cj = jnp.asarray(coords)
    table = C.build_table(cj, assume_sorted=True)
    offs = C.kernel_offsets_np((7, 7, 7), stride=(1, 1, 1),
                               dilation=(1, 1, 1))
    in_idx, base, slot = C.grouped_window_query(
        table, cj, offs, 1, queries_sorted=True,
        identity_perm=True, self_query=True)
    in_idx = np.asarray(in_idx)
    offs = np.asarray(offs)
    for k in range(offs.shape[0]):
        ox, oy, oz = offs[k]
        if oy or oz:
            assert (in_idx[k] == -1).all()
            continue
        want = np.arange(n) + ox
        want = np.where((want >= 0) & (want < n), want, -1)
        np.testing.assert_array_equal(in_idx[k], want, err_msg=f"tap {k}")


def test_wide_kernel_guard_falls_back():
    """Tap runs wider than the winlp coverage must not take the direct
    path (ks9 -> gmax 9 > WIN - W); results still exact via the search
    fallback."""
    assert 9 - 1 > C.DIRECT_WIN - C.DIRECT_W - 1     # guard is active
    n = 500
    coords = np.zeros((n, 4), np.int32)
    coords[:, 0] = np.arange(n)
    cj = jnp.asarray(coords)
    table = C.build_table(cj, assume_sorted=True)
    offs = C.kernel_offsets_np((9, 1, 1), stride=(1, 1, 1),
                               dilation=(1, 1, 1))
    in_idx, _, _ = C.grouped_window_query(
        table, cj, offs, 1, queries_sorted=True, identity_perm=True,
        self_query=True)
    in_idx = np.asarray(in_idx)
    offs = np.asarray(offs)
    for k in range(offs.shape[0]):
        ox = offs[k][0]
        want = np.arange(n) + ox
        want = np.where((want >= 0) & (want < n), want, -1)
        np.testing.assert_array_equal(in_idx[k], want, err_msg=f"tap {k}")


def test_random_probes_vs_dict():
    rng = np.random.default_rng(7)
    n = 20000
    coords = np.stack([rng.integers(0, 50, n), rng.integers(0, 400, n),
                       rng.integers(0, 300, n), rng.integers(0, 3, n)],
                      axis=1).astype(np.int32)
    coords = np.unique(coords, axis=0)
    hi, lo = [np.asarray(v) for v in C.pack_coords(jnp.asarray(coords))]
    coords = coords[np.lexsort((lo, hi))]
    table = C.build_table(jnp.asarray(coords), assume_sorted=True)
    probes = coords.copy()
    probes[:, :3] += rng.integers(-2, 3, (coords.shape[0], 3))
    idx = np.asarray(table.query(jnp.asarray(probes)))
    lut = {tuple(c): i for i, c in enumerate(coords.tolist())}
    want = np.asarray([lut.get(tuple(p), -1) for p in probes.tolist()])
    np.testing.assert_array_equal(idx, want)
