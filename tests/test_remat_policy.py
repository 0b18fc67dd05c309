"""Remat with the plan-saving checkpoint policy: the integer plan
tensors (sorts/joins, coords.PLAN_TAG) are saved rather than recomputed
in the backward. This must (a) compile, (b) produce the SAME grads as
the non-remat model, (c) actually shrink the recompute set (smoke-level:
a train step runs and the loss is finite and decreasing)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from link_tpu.data.collate import collate_scans
from link_tpu.data.semantic_kitti import SyntheticSemanticKITTI
from link_tpu.models.linkunet import ELKUNet
from link_tpu.sparse.tensor import make_sparse_tensor
from link_tpu.train import trainer as T

pytestmark = pytest.mark.slow

CAPS = (384, 192, 96, 48, 24)


def _batch():
    ds = SyntheticSemanticKITTI(length=1, num_points=CAPS[0] - 64,
                                n_raw_points=3000, voxel_size=0.4,
                                split="train", seed=11)
    return collate_scans([ds[0]], CAPS[0])


def test_remat_policy_grads_match_no_remat():
    b = _batch()
    st = make_sparse_tensor(b["feats"], b["coords"], nnz=b["nnz"])

    base = ELKUNet(num_classes=20, cr=0.125, capacities=CAPS, remat=False)
    rmt = ELKUNet(num_classes=20, cr=0.125, capacities=CAPS, remat=True)
    variables = base.init(jax.random.PRNGKey(0), st, False)

    def loss_of(model):
        def f(params):
            logits, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                st, True, mutable=["batch_stats"])
            lab = jnp.asarray(b["labels"])
            valid = jnp.arange(logits.shape[0]) < jnp.asarray(b["nnz"]).reshape(-1)[0]
            lp = jax.nn.log_softmax(logits.astype(jnp.float32))
            nll = -jnp.take_along_axis(lp, lab[:, None], axis=1)[:, 0]
            return jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.sum(valid)
        return f

    g_base = jax.jit(jax.grad(loss_of(base)))(variables["params"])
    g_rmt = jax.jit(jax.grad(loss_of(rmt)))(variables["params"])
    flat_b, _ = jax.flatten_util.ravel_pytree(g_base)
    flat_r, _ = jax.flatten_util.ravel_pytree(g_rmt)
    np.testing.assert_allclose(np.asarray(flat_r), np.asarray(flat_b),
                               atol=1e-4, rtol=1e-3)


def test_remat_policy_train_step_runs():
    b = _batch()
    st = make_sparse_tensor(b["feats"], b["coords"], nnz=b["nnz"])
    model = ELKUNet(num_classes=20, cr=0.125, capacities=CAPS, remat=True)
    variables = model.init(jax.random.PRNGKey(0), st, False)
    tx = T.make_sgd(lambda s: 0.02, momentum=0.9, weight_decay=1e-4)
    state = T.TrainState(step=jnp.int32(0), params=variables["params"],
                         batch_stats=variables["batch_stats"],
                         opt_state=tx.init(variables["params"]))

    @jax.jit
    def step(s, batch):
        return T.seg_train_step(model, tx, s, batch)

    losses = []
    for _ in range(8):
        state, metrics = step(state, b)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
