"""Pallas kernel tests (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from link_tpu.ops import pallas_kernels as pk
from link_tpu.sparse import coords as coordlib


def test_pallas_join_matches_table_query():
    rng = np.random.default_rng(70)
    n, q = 1000, 700
    hi = np.sort(rng.choice(1 << 20, n, replace=False)).astype(np.int32)
    lo = rng.integers(0, 1 << 20, n).astype(np.int32)
    order = np.lexsort((lo, hi))
    hi, lo = hi[order], lo[order]
    perm = rng.permutation(n).astype(np.int32)

    q_hi = np.concatenate([hi[rng.integers(0, n, q // 2)],
                           rng.integers(0, 1 << 20, q - q // 2)]).astype(np.int32)
    q_lo = np.concatenate([lo[rng.integers(0, n, q // 2)],
                           rng.integers(0, 1 << 20, q - q // 2)]).astype(np.int32)
    sel = rng.permutation(q)
    q_hi, q_lo = q_hi[sel], q_lo[sel]

    got = np.asarray(pk.pallas_join(jnp.asarray(hi), jnp.asarray(lo),
                                    jnp.asarray(perm), jnp.asarray(q_hi),
                                    jnp.asarray(q_lo), block_q=256,
                                    interpret=True))
    lut = {(h, l): perm[i] for i, (h, l) in enumerate(zip(hi, lo))}
    want = np.array([lut.get((h, l), -1) for h, l in zip(q_hi, q_lo)])
    np.testing.assert_array_equal(got, want)


def test_pallas_conv_matches_xla():
    rng = np.random.default_rng(71)
    n, c, co, k, m = 500, 16, 24, 8, 300
    feats = rng.standard_normal((n, c)).astype(np.float32)
    idx = rng.integers(-1, n, (k, m)).astype(np.int32)
    w = rng.standard_normal((k, c, co)).astype(np.float32) * 0.2

    got = np.asarray(pk.pallas_sparse_conv(jnp.asarray(feats),
                                           jnp.asarray(idx), jnp.asarray(w),
                                           block_m=128, interpret=True))
    want = np.zeros((m, co), np.float32)
    for kk in range(k):
        for j in range(m):
            if idx[kk, j] >= 0:
                want[j] += feats[idx[kk, j]] @ w[kk]
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
