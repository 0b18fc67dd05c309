"""Multi-host plumbing (parallel/multihost.py): the same code paths the
multi-host entries take, exercised on the single-process 8-device CPU mesh
(process-count-agnostic by construction) plus injected process counts for
the sharding math."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from link_tpu import parallel as par
from link_tpu.parallel import multihost as mh


def test_process_shard_indices_partition():
    """With an injected 4-process world, per-process shards must be
    disjoint, cover every step's global window, and preserve the
    step-major order (DistributedSampler-equivalent semantics)."""
    idx = np.random.default_rng(0).permutation(103)
    got = [mh.process_shard_indices(idx, samples_per_step=16,
                                    process_index=p, process_count=4)
           for p in range(4)]
    nsteps = 103 // 16
    assert all(len(g) == nsteps * 4 for g in got)
    for s in range(nsteps):
        window = np.concatenate([g[s * 4:(s + 1) * 4] for g in got])
        np.testing.assert_array_equal(np.sort(window),
                                      np.sort(idx[s * 16:(s + 1) * 16]))


def test_process_shard_indices_rejects_indivisible():
    import pytest
    with pytest.raises(ValueError):
        mh.process_shard_indices(np.arange(10), samples_per_step=3,
                                 process_index=0, process_count=2)


def test_make_global_batch_matches_device_put():
    """On one process the multihost assembly must equal the plain
    stack+device_put path bit-for-bit, including nested list leaves
    (det per-task targets)."""
    mesh = par.make_data_mesh(jax.devices())
    ndev = mesh.devices.size
    rng = np.random.default_rng(1)
    per_dev = [{"a": rng.normal(size=(5, 3)).astype(np.float32),
                "nested": [rng.integers(0, 9, size=(4,)),
                           rng.normal(size=(2, 2)).astype(np.float32)]}
               for _ in range(ndev)]
    got = mh.make_global_batch(mesh, per_dev)
    want = jax.device_put(par.stack_device_batches(per_dev),
                          NamedSharding(mesh, P(par.DATA_AXIS)))
    for g, w in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        assert g.shape == w.shape
        assert g.sharding.is_equivalent_to(w.sharding, ndim=g.ndim)
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_make_global_batch_feeds_jit_step():
    """A jitted psum-style reduction over the data axis must consume the
    assembled global array directly (the train-step contract)."""
    mesh = par.make_data_mesh(jax.devices())
    ndev = mesh.devices.size
    per_dev = [{"x": np.full((2, 2), float(i), np.float32)}
               for i in range(ndev)]
    gb = mh.make_global_batch(mesh, per_dev)

    @jax.jit
    def total(b):
        return jnp.sum(b["x"])

    want = sum(float(i) * 4 for i in range(ndev))
    assert float(total(gb)) == want


def test_make_global_batch_wrong_count():
    import pytest
    mesh = par.make_data_mesh(jax.devices())
    with pytest.raises(ValueError):
        mh.make_global_batch(mesh, [{"a": np.zeros(2)}])


def test_allgather_host_single_process():
    out = mh.allgather_host({"c": np.arange(6).reshape(2, 3)})
    assert out["c"].shape == (1, 2, 3)
    np.testing.assert_array_equal(out["c"][0], np.arange(6).reshape(2, 3))


def test_gather_detections_roundtrip():
    ids = np.arange(3)
    boxes = np.random.default_rng(2).normal(size=(3, 4, 9)).astype(np.float32)
    scores = np.random.default_rng(3).random((3, 4)).astype(np.float32)
    labels = np.zeros((3, 4), np.int32)
    counts = np.array([4, 2, 0])
    gi, gb, gs, gl, gc = mh.gather_detections(ids, boxes, scores, labels,
                                              counts)
    np.testing.assert_array_equal(gi, ids)
    np.testing.assert_array_equal(gb, boxes)
    np.testing.assert_array_equal(gc, counts)


def test_maybe_initialize_noop_single():
    """Without a coordinator configured this must be a no-op returning
    process 0 (the single-host CI / bench environment)."""
    assert mh.maybe_initialize() == 0
