"""Det convergence A/B vs the torch reference (VERDICT r4 next #4).

tools/make_goldens_det_ab.py trains the reference dense det composite
(det3d RPN + CenterHead — the CPU-trainable det modules) for 40 steps
with the PUBLISHED det optimizer stack: fastai OptimWrapper true wd with
bn_wd=True (apis/train.py:154-171), per-iteration OneCycle lr/momentum
(trainer.py:410-414), Adam betas (0.9, 0.99), grad-clip 35
(hooks/optimizer.py:16-22), loss = FastFocal + 0.25 * code-weighted L1
(center_head.py:252-293) — and records the loss curve on fixed synthetic
BEV maps + CenterNet targets.

This test replays the identical schedule — translated initial weights,
same frames, same step order — through make_one_cycle_adam +
center_head_loss and asserts per-step agreement: the det twin of
tests/test_convergence_ab.py. It pins the whole training-dynamics
system (optimizer chain incl. decay placement and clip, focal/L1 loss,
BN-in-train-mode statistics, conv/deconv translation) rather than any
single function.

Both sides run in float64: in f32 the Adam + focal dynamics are
chaotic — a first-run f32 A/B measured ~x1.5/step error growth from
1e-6 accumulation-order seeds (torch-CPU vs XLA-CPU conv reduction
order), reaching 20% of loss by step 28 with step-0 parity at 7.6e-6 —
so only f64 keeps the 40-step curve a sharp pin (envelope ~1e-4)
instead of a statistical one.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow          # full composite train-step compile

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "det_train_ab.npz")

TASKS = (("car",), ("truck", "bus"))
CODE_W = (1.0,) * 6 + (0.2, 0.2, 1.0, 1.0)


@pytest.mark.skipif(not os.path.exists(GOLDEN),
                    reason="no det train A/B golden generated")
def test_det_training_matches_reference_curve():
    import jax

    g = np.load(GOLDEN)
    assert str(g["dtype"]) == "float64", "regenerate the golden in f64"
    steps = int(g["steps"])
    n_frames = int(g["n_frames"])
    ref_losses = np.asarray(g["losses"])
    ref_lrs = np.asarray(g["lrs"])
    ref_moms = np.asarray(g["moms"])

    with jax.enable_x64(True):
        import jax.numpy as jnp
        import optax
        from flax import linen as nn

        from link_tpu.models.center_head import CenterHead, center_head_loss
        from link_tpu.models.rpn import RPN
        from link_tpu.train import schedules
        from link_tpu.train.det_trainer import make_one_cycle_adam
        from link_tpu.utils.torch_import_det import translate_dense

        sd = {k[3:].replace("__", "."): g[k] for k in g.files
              if k.startswith("sd_")}
        variables = translate_dense(sd, tasks=tuple(len(t) for t in TASKS))

        class Composite(nn.Module):
            """Dense det trainable composite, submodule names matching
            translate_dense's neck/bbox_head key roots."""

            @nn.compact
            def __call__(self, bev, train: bool = False):
                h = RPN(layer_nums=(2, 2), ds_layer_strides=(1, 2),
                        ds_num_filters=(32, 64), us_layer_strides=(1, 2),
                        us_num_filters=(32, 32), num_input_features=32,
                        dtype="float64", name="neck")(bev, train)
                return CenterHead(in_channels=64, tasks=TASKS,
                                  share_conv_channel=32,
                                  code_weights=CODE_W, dtype="float64",
                                  name="bbox_head")(h, train)

        batches = []
        for i in range(n_frames):
            ex = {"bev": jnp.asarray(g[f"frame{i}_bev"], jnp.float64)}
            for k in ("hm", "anno_box", "ind", "mask", "cat"):
                dt = jnp.float64 if k in ("hm", "anno_box", "mask") else None
                ex[k] = [jnp.asarray(g[f"frame{i}_{k}{t}"], dt)[None]
                         for t in range(len(TASKS))]
            batches.append(ex)

        model = Composite()
        # shape-check the translated trees against a fresh init
        init = model.init(jax.random.PRNGKey(0), batches[0]["bev"], True)
        jax.tree_util.tree_map(lambda a, b: None, init["params"],
                               variables["params"])

        # validate our one_cycle against the curves the reference recorded,
        # then feed the recorded f64 curves to the optimizer so schedule
        # arithmetic precision (f32 lr_fn vs the reference's python-f64
        # OneCycle) can't seed trajectory drift
        lr_fn, mom_fn = schedules.one_cycle(
            float(g["lr_max"]), steps, moms=(0.95, 0.85), div_factor=10.0,
            pct_start=0.4)
        got_lrs = np.asarray([float(lr_fn(s)) for s in range(steps)])
        got_moms = np.asarray([float(mom_fn(s)) for s in range(steps)])
        np.testing.assert_allclose(got_lrs, ref_lrs, rtol=2e-5, atol=1e-10)
        np.testing.assert_allclose(got_moms, ref_moms, rtol=2e-5)

        tx = make_one_cycle_adam(lambda s: jnp.asarray(ref_lrs)[s],
                                 lambda s: jnp.asarray(ref_moms)[s],
                                 weight_decay=0.01, grad_clip=35.0)
        params = variables["params"]
        batch_stats = variables["batch_stats"]
        opt_state = tx.init(params)

        @jax.jit
        def step(params, batch_stats, opt_state, ex):
            def loss_fn(p):
                preds, mut = model.apply(
                    {"params": p, "batch_stats": batch_stats}, ex["bev"],
                    True, mutable=["batch_stats"])
                example = {k: ex[k]
                           for k in ("hm", "anno_box", "ind", "mask", "cat")}
                loss, _ = center_head_loss(preds, example, 0.25, CODE_W)
                return loss, mut["batch_stats"]

            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), new_bs, new_opt,
                    loss)

        losses = []
        for it in range(steps):
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state, batches[it % n_frames])
            losses.append(float(loss))
    losses = np.asarray(losses)

    # f64 both sides: residual drift is accumulation-order noise
    # (~1e-13/step) amplified by the chaotic dynamics' ~x1.5/step rate —
    # stays below ~1e-6 relative through step 40
    err = np.abs(losses - ref_losses)
    tol = 1e-7 + 1e-13 * 1.5 ** np.arange(steps) + 1e-6 * ref_losses
    assert (err <= tol).all(), (
        f"det loss curve diverged: max err {err.max():.3e} at step "
        f"{err.argmax()}; ours {losses[err.argmax()]:.8f} vs ref "
        f"{ref_losses[err.argmax()]:.8f}")
