"""MinkUNet baseline (reference: segmentation/core/models/semantic_kitti/
minkunet.py:91-254): plain sparse UNet, no ELK branch. The reference's
ACTUAL channel plan is cs = [64]*9 * cr (minkunet.py:98 — the stock
SPVNAS [32, 32, 64, 128, 256, 256, 128, 96, 96] list is commented out
there), so that is the default here; pass `channels` for the stock
variant."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
from flax import linen as nn

from ..nn.modules import Linear, SparseBatchNorm, SparseConv3d
from ..sparse.tensor import SparseTensor, cat
from .blocks import BasicConvolutionBlock, BasicDeconvolutionBlock, ResidualBlock
from .linkunet import DEFAULT_CAPACITIES


def _plan_policy():
    """Remat policy: save the integer kernel-map/join tensors
    (coords.PLAN_TAG) so the backward pass does not redo the
    sorts and binary searches -- roughly half the forward
    cost, all gradient-free (PLAN.md round-2 item)."""
    import jax
    from ..sparse.coords import PLAN_TAG
    return jax.checkpoint_policies.save_only_these_names(PLAN_TAG)


class MinkUNet(nn.Module):
    num_classes: int
    cr: float = 1.0
    channels: Tuple[int, ...] = (64,) * 9   # reference minkunet.py:98
    in_channels: int = 4
    capacities: Tuple[int, ...] = DEFAULT_CAPACITIES
    bn_axis: Optional[str] = None
    dtype: str = "float32"  # bf16 halves MXU time + gather bytes
    remat: bool = False      # rematerialize blocks (training memory)

    @nn.compact
    def __call__(self, x: SparseTensor, train: bool = False):
        import jax.numpy as _jnp
        x = x.replace(feats=x.feats.astype(_jnp.dtype(self.dtype)))
        if self.remat:
            _Res = nn.remat(ResidualBlock, static_argnums=(2,), policy=_plan_policy())
            _Down = nn.remat(BasicConvolutionBlock, static_argnums=(2,), policy=_plan_policy())
        else:
            _Res, _Down = ResidualBlock, BasicConvolutionBlock
        cs = [int(self.cr * c) for c in self.channels]
        caps = self.capacities
        ax = self.bn_axis

        st = SparseConv3d(self.in_channels, cs[0], 3, name="stem0")(x)
        st = SparseBatchNorm(cs[0], axis_name=ax, name="stem0_bn")(st, train)
        st = st.replace(feats=jax.nn.relu(st.feats))
        st = SparseConv3d(cs[0], cs[0], 3, name="stem1")(st)
        st = SparseBatchNorm(cs[0], axis_name=ax, name="stem1_bn")(st, train)
        x0 = st.replace(feats=jax.nn.relu(st.feats))

        enc = [x0]
        st = x0
        for lvl in range(4):
            cin, cout = cs[lvl], cs[lvl + 1]
            st = _Down(cin, cin, ks=2, stride=2,
                                       out_capacity=caps[lvl + 1], bn_axis=ax,
                                       name=f"down{lvl+1}")(st, train)
            st = _Res(cin, cout, bn_axis=ax,
                               name=f"stage{lvl+1}_0")(st, train)
            st = _Res(cout, cout, bn_axis=ax,
                               name=f"stage{lvl+1}_1")(st, train)
            enc.append(st)

        _, x1, x2, x3, x4 = enc
        y = x4
        for lvl, skip, cin, cout in ((1, x3, cs[4], cs[5]), (2, x2, cs[5], cs[6]),
                                     (3, x1, cs[6], cs[7]), (4, x0, cs[7], cs[8])):
            y = BasicDeconvolutionBlock(cin, cout, ks=2, stride=2, bn_axis=ax,
                                        name=f"up{lvl}_deconv")(y, train)
            y = cat([y, skip])
            y = _Res(cout + skip.num_channels, cout, bn_axis=ax,
                              name=f"up{lvl}_res0")(y, train)
            y = _Res(cout, cout, bn_axis=ax,
                              name=f"up{lvl}_res1")(y, train)

        return Linear(cs[8], self.num_classes, name="classifier")(y.feats)
