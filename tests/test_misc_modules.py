"""Coverage for loader, BEV modules, readers, logging, py-config."""

import json

import numpy as np
import jax
import jax.numpy as jnp

from link_tpu.data.loader import PrefetchLoader, epoch_indices, shard_indices
from link_tpu.nn.bev import (ToDenseBEVConvolution, to_bev_height_compression,
                             to_bev_reduction)
from link_tpu.nn.modules import crop
from link_tpu.models.readers import (PillarFeatureNet, dynamic_voxel_encoder,
                                     point_pillars_scatter)
from link_tpu.sparse.tensor import make_sparse_tensor
from link_tpu.utils.logging import LogBuffer, MetricsLogger
from link_tpu.utils.config import load_py_config
from link_tpu.utils.registry import (BACKBONES, Registry, build_from_cfg,
                                     get_downsample_factor)

import oracles
from test_sparse_core import pad_coords, pad_feats


def test_loader_sharding_deterministic():
    idx = epoch_indices(100, epoch=3, seed=7)
    idx2 = epoch_indices(100, epoch=3, seed=7)
    np.testing.assert_array_equal(idx, idx2)
    shards = shard_indices(idx, 4)
    assert all(len(s) == 25 for s in shards)
    assert len(np.unique(np.concatenate(shards))) == 100
    seen = []
    loader = PrefetchLoader(lambda step: step * 2, 5, depth=2)
    for item in loader:
        seen.append(item)
    assert seen == [0, 2, 4, 6, 8]


def test_bev_modules():
    rng = np.random.default_rng(1)
    coords, feats = oracles.random_cloud(rng, 100, span=(8, 8, 4), channels=6)
    st = make_sparse_tensor(pad_feats(feats, 128), pad_coords(coords, 128),
                            nnz=len(coords))
    red = to_bev_reduction(st)
    assert int(red.nnz) <= len(coords)
    assert (np.asarray(red.coords[:int(red.nnz), 2]) == 0).all()

    mod = ToDenseBEVConvolution(6, 8, shape=(8, 8, 4), batch_size=1)
    v = mod.init(jax.random.PRNGKey(0), st)
    out = mod.apply(v, st)
    assert out.shape == (1, 8, 8, 8)

    hc = to_bev_height_compression(st, (8, 8, 4), batch_size=1)
    assert hc.shape == (1, 6 * 4, 8, 8)


def test_crop():
    rng = np.random.default_rng(2)
    coords, feats = oracles.random_cloud(rng, 80, span=(10, 10, 4))
    st = make_sparse_tensor(pad_feats(feats, 96), pad_coords(coords, 96),
                            nnz=len(coords))
    out = crop(st, (0, 0, 0), (5, 5, 4))
    inside = ((coords[:, :3] >= 0) & (coords[:, :3] < [5, 5, 4])).all(1)
    assert int(out.nnz) == inside.sum()


def test_pillar_reader_and_scatter():
    rng = np.random.default_rng(3)
    n, p = 64, 10
    voxels = rng.standard_normal((n, p, 5)).astype(np.float32)
    npts = rng.integers(1, p + 1, n).astype(np.int32)
    coords = np.concatenate(
        [rng.integers(0, 16, (n, 3)).astype(np.int32),
         np.zeros((n, 1), np.int32)], 1)
    net = PillarFeatureNet(num_input_features=5, num_filters=(32,),
                           voxel_size=(0.5, 0.5), pc_range=(-4, -4))
    v = net.init(jax.random.PRNGKey(0), jnp.asarray(voxels),
                 jnp.asarray(npts), jnp.asarray(coords), False)
    feats = net.apply(v, jnp.asarray(voxels), jnp.asarray(npts),
                      jnp.asarray(coords), False)
    assert feats.shape == (n, 32)
    bev = point_pillars_scatter(feats, jnp.asarray(coords), jnp.int32(n),
                                (16, 16), 1)
    assert bev.shape == (1, 32, 16, 16)


def test_dynamic_voxel_encoder():
    rng = np.random.default_rng(4)
    pts = rng.uniform(-4, 4, (500, 5)).astype(np.float32)
    feats, coords, nnz = dynamic_voxel_encoder(
        jnp.asarray(pts), jnp.ones(500, bool), (0.5, 0.5, 0.5),
        (-4, -4, -4, 4, 4, 4), (16, 16, 16), capacity=512)
    assert int(nnz) > 0
    assert np.isfinite(np.asarray(feats)[:int(nnz)]).all()


def test_logging(tmp_path):
    buf = LogBuffer()
    buf.update({"loss": 1.0})
    buf.update({"loss": 3.0})
    assert buf.average()["loss"] == 2.0
    ml = MetricsLogger(str(tmp_path), interval=2)
    ml.log_step({"loss": 1.0})
    ml.log_step({"loss": 3.0})
    lines = open(ml.path).read().strip().split("\n")
    assert len(lines) == 1
    assert json.loads(lines[0])["loss"] == 2.0


def test_py_config_and_registry(tmp_path):
    cfg_file = tmp_path / "cfg.py"
    cfg_file.write_text(
        "model = dict(type='Foo', width=3)\n"
        "neck = dict(ds_layer_strides=[1, 2], us_layer_strides=[1, 2])\n"
        "backbone = dict(ds_factor=8)\n"
        "total_epochs = 20\n")
    cfg = load_py_config(str(cfg_file))
    assert cfg.total_epochs == 20
    assert cfg.model.width == 3
    assert "model = dict" in cfg.text

    reg = Registry("test")

    @reg.register_module
    class Foo:
        def __init__(self, width):
            self.width = width

    obj = build_from_cfg({"type": "Foo", "width": 5}, reg)
    assert obj.width == 5
    assert get_downsample_factor(
        {"neck": {"ds_layer_strides": [1, 2], "us_layer_strides": [1, 2]},
         "backbone": {"ds_factor": 8}}) == 8
