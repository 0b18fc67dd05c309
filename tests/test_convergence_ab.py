"""Convergence A/B vs the torch reference (VERDICT r3 next #7).

tools/make_goldens_train_ab.py trains the ACTUAL reference ELKUNet for
40 SGD steps (CPU backend, trainers.py:41-81 loss shaping, builder.py
SGD nesterov + coupled wd) on fixed synthetic scans and records the
loss curve. This test replays the identical schedule — translated
initial weights, same scans, same step order — through seg_train_step
and asserts per-step agreement: the optimizer + CE/Lovász + BN + model
system reproduces the reference's training dynamics, not merely "loss
decreases"."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from link_tpu.models.linkunet import ELKUNet
from link_tpu.sparse.tensor import make_sparse_tensor
from link_tpu.train import trainer as T
from link_tpu.utils.torch_import import translate_elkunet

pytestmark = pytest.mark.slow           # full-model train-step compile

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "train_ab.npz")
CAPS = (1024, 640, 256, 128, 64)


@pytest.mark.skipif(not os.path.exists(GOLDEN),
                    reason="no train A/B golden generated")
def test_training_matches_reference_curve():
    g = np.load(GOLDEN)
    sd = {k[3:].replace("__", "."): g[k] for k in g.files
          if k.startswith("sd_")}
    variables = translate_elkunet(sd)
    n_scans = int(g["n_scans"])
    lr = float(g["lr"])
    ref_losses = np.asarray(g["losses"])
    ref_ces = np.asarray(g["ces"])
    ref_lovs = np.asarray(g["lovs"])

    batches = []
    for i in range(n_scans):
        coords = g[f"scan{i}_coords"]
        feats = g[f"scan{i}_feats"]
        labels = g[f"scan{i}_labels"]
        # seg_train_step builds its SparseTensor with base_sorted=True (the
        # collate pipeline's pack-key invariant); the golden scans are in
        # np.unique (x, y, z)-lex order, so sort rows into (b, z, y, x)
        # pack-key order first. CE/Lovász are row-permutation-invariant, so
        # the reference curve is unaffected.
        order = np.lexsort((coords[:, 0], coords[:, 1],
                            coords[:, 2], coords[:, 3]))
        coords, feats, labels = coords[order], feats[order], labels[order]
        n = len(coords)
        cap = CAPS[0]
        cpad = np.full((cap, 4), -(2 ** 20), np.int32)
        fpad = np.zeros((cap, feats.shape[1]), np.float32)
        lpad = np.zeros((cap,), np.int32)
        cpad[:n], fpad[:n], lpad[:n] = coords, feats, labels
        batches.append({"feats": jnp.asarray(fpad),
                        "coords": jnp.asarray(cpad),
                        "labels": jnp.asarray(lpad),
                        "nnz": jnp.int32(n)})

    model = ELKUNet(num_classes=20, cr=float(g["cr"]), capacities=CAPS)
    tx = T.make_sgd(lambda s: lr, momentum=0.9, weight_decay=1e-4,
                    nesterov=True)
    # exercise init only to shape-check the translated trees
    st0 = make_sparse_tensor(batches[0]["feats"], batches[0]["coords"],
                             nnz=batches[0]["nnz"])
    init = model.init(jax.random.PRNGKey(0), st0, True)
    jax.tree_util.tree_map(lambda a, b: None, init["params"],
                           variables["params"])

    state = T.TrainState(step=jnp.int32(0), params=variables["params"],
                         batch_stats=variables["batch_stats"],
                         opt_state=tx.init(variables["params"]))

    @jax.jit
    def step(s, batch):
        return T.seg_train_step(model, tx, s, batch)

    losses, ces, lovs = [], [], []
    for it in range(len(ref_losses)):
        state, metrics = step(state, batches[it % n_scans])
        losses.append(float(metrics["loss"]))
        ces.append(float(metrics["loss_ce"]))
        lovs.append(float(metrics["loss_lovasz"]))

    losses, ces, lovs = map(np.asarray, (losses, ces, lovs))
    # step-0 losses are pre-update: pure forward+loss parity, tight
    assert abs(losses[0] - ref_losses[0]) < 2e-3, (losses[0], ref_losses[0])
    assert abs(ces[0] - ref_ces[0]) < 2e-3
    assert abs(lovs[0] - ref_lovs[0]) < 2e-3
    # trajectory: f32 accumulation-order drift compounds through
    # backward+momentum, so tolerance widens with step index
    tol = 5e-3 + 0.02 * np.maximum(ref_losses, 0.2) \
        + 2.5e-3 * np.arange(len(ref_losses))
    err = np.abs(losses - ref_losses)
    assert (err <= tol).all(), (
        f"loss curve diverged: max err {err.max():.4f} at step "
        f"{err.argmax()}; ours {losses[err.argmax()]:.4f} vs ref "
        f"{ref_losses[err.argmax()]:.4f}")
    # end state: both must land in the same overfit basin
    assert abs(losses[-1] - ref_losses[-1]) < 0.1 + 0.15 * ref_losses[-1]
