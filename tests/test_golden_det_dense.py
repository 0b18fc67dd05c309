"""Dense det golden parity: our flax RPN + CenterHead vs the reference
torch modules (rpn.py:22-160, center_head.py:170-246) run on CPU.

The golden (tests/goldens/det_dense.npz, tools/make_goldens_det.py
--dense-only) carries the reference state_dict, a random BEV input, the
RPN output and every task head map — so this numerically validates
utils/torch_import_det.translate_dense end-to-end: conv/deconv layout
transposes (incl. the ConvTranspose spatial flip), BN eps/momentum
mapping with nudged running stats, sequential indices, branch wiring.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "det_dense.npz")
pytestmark = pytest.mark.skipif(not os.path.exists(GOLDEN),
                                reason="det_dense golden not generated")


@pytest.fixture(scope="module")
def golden():
    z = np.load(GOLDEN)
    sd = {k[3:].replace("__", "."): z[k] for k in z.files
          if k.startswith("sd_")}
    return z, sd


def test_rpn_matches_reference(golden):
    import jax.numpy as jnp
    from link_tpu.models.rpn import RPN
    from link_tpu.utils.torch_import_det import translate_dense

    z, sd = golden
    tr = translate_dense(sd)
    out = RPN().apply(
        {"params": tr["params"]["neck"],
         "batch_stats": tr["batch_stats"]["neck"]},
        jnp.asarray(z["bev"]), False)
    want = z["rpn_out"]
    err = np.abs(np.asarray(out) - want).max() / (np.abs(want).max() + 1e-9)
    assert err < 1e-5, f"rpn rel err {err}"


def test_center_head_matches_reference(golden):
    import jax.numpy as jnp
    from link_tpu.models.center_head import CenterHead
    from link_tpu.utils.torch_import_det import translate_dense

    z, sd = golden
    tr = translate_dense(sd)
    preds = CenterHead().apply(
        {"params": tr["params"]["bbox_head"],
         "batch_stats": tr["batch_stats"]["bbox_head"]},
        jnp.asarray(z["rpn_out"]), False)
    for t, pd in enumerate(preds):
        for name, v in pd.items():
            want = z[f"task{t}_{name}"]            # torch NCHW
            got = np.transpose(np.asarray(v), (0, 3, 1, 2))
            err = (np.abs(got - want).max()
                   / (np.abs(want).max() + 1e-9))
            assert err < 1e-5, f"task{t}/{name} rel err {err}"
