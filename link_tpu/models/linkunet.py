"""LinK U-Net segmentation model (reference: linkunet.py:188-385, ELKUNet).

MinkUNet topology with a parallel ELK branch at each of the 4 encoder
levels: x_l = ReLU(stage_tail(stage(x)) + elk_tail(ELK(x, stride*s, r))).

Static `capacities` bound the voxel count per stride level (index 0 =
stride 1 ... index 4 = stride 16); `aux_capacities` bound ELK aux cells per
level (defaults to the level capacity — always safe).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
from flax import linen as nn

from ..nn.modules import Linear, SparseBatchNorm, SparseConv3d
from ..sparse.tensor import SparseTensor, cat
from .blocks import BasicConvolutionBlock, BasicDeconvolutionBlock, ResidualBlock
from .elk import ELKBlock

# Per-scan voxel capacities by stride level (1, 2, 4, 8, 16) for the 80k
# training cap; calibrated with tools/calibrate_capacities.py (beam-geometry
# synthetic; generous vs real SemanticKITTI whose coarse levels are sparser).
DEFAULT_CAPACITIES = (84992, 62464, 43520, 27648, 14336)


def _plan_policy():
    """Remat policy: save the integer kernel-map/join tensors
    (coords.PLAN_TAG) so the backward pass does not redo the sorts and
    binary searches, AND every conv output (conv.CONV_OUT_TAG, ~10.9 MB
    bf16 each at the 85k cap) so the recompute never re-runs a gather
    chain — only the elementwise BN/ReLU segments between saved conv
    outputs (round-3: the recompute was ~40% of the train step)."""
    import jax
    from ..sparse.conv import CONV_OUT_TAG
    from ..sparse.coords import PLAN_TAG
    return jax.checkpoint_policies.save_only_these_names(
        PLAN_TAG, CONV_OUT_TAG)


class ELKUNet(nn.Module):
    num_classes: int
    cr: float = 1.0
    r: int = 2
    s: int = 3
    groups: int = 1
    baseop: str = "cos_x"
    in_channels: int = 4
    capacities: Tuple[int, ...] = DEFAULT_CAPACITIES
    aux_capacities: Optional[Tuple[int, ...]] = None
    bn_axis: Optional[str] = None
    dtype: str = "float32"  # bf16 halves MXU time + gather bytes
    remat: bool = False      # rematerialize blocks (training memory)
    # static (nx, ny, nz, nb) bound on the stride-1 coord domain (see
    # data/semantic_kitti.grid_extent): unlocks the RankGrid join index
    # at the coarse levels + ELK aux lattices. The matching collate must
    # enforce the bound (collate_scans(grid_extent=...)).
    grid_extent: Optional[Tuple[int, int, int, int]] = None

    @nn.compact
    def __call__(self, x: SparseTensor, train: bool = False):
        import jax.numpy as _jnp
        x = x.replace(feats=x.feats.astype(_jnp.dtype(self.dtype)))
        if self.grid_extent is not None and x.grid_extent is None:
            x = x.replace(grid_extent=tuple(self.grid_extent))
        if self.remat:
            _Res = nn.remat(ResidualBlock, static_argnums=(2,), policy=_plan_policy())
            _Down = nn.remat(BasicConvolutionBlock, static_argnums=(2,), policy=_plan_policy())
            _Elk = nn.remat(ELKBlock, static_argnums=(2, 3, 4), policy=_plan_policy())
        else:
            _Res, _Down = ResidualBlock, BasicConvolutionBlock
            _Elk = ELKBlock
        cs = [int(self.cr * c) for c in [64] * 9]
        caps = self.capacities
        aux_caps = self.aux_capacities or caps[1:]
        ax = self.bn_axis

        def stem(st):
            st = SparseConv3d(self.in_channels, cs[0], 3, name="stem0")(st)
            st = SparseBatchNorm(cs[0], axis_name=ax, name="stem0_bn")(st, train)
            st = st.replace(feats=jax.nn.relu(st.feats))
            st = SparseConv3d(cs[0], cs[0], 3, name="stem1")(st)
            st = SparseBatchNorm(cs[0], axis_name=ax, name="stem1_bn")(st, train)
            return st.replace(feats=jax.nn.relu(st.feats))

        x0 = stem(x)

        feats_list = [x0]
        st = x0
        for lvl in range(4):
            cin, cout = cs[lvl], cs[lvl + 1]
            st_0 = _Down(
                cin, cin, ks=2, stride=2, out_capacity=caps[lvl + 1],
                bn_axis=ax, name=f"down{lvl+1}")(st, train)
            y = _Res(cin, cout, bn_axis=ax,
                              name=f"stage{lvl+1}_0")(st_0, train)
            y = _Res(cout, cout, bn_axis=ax,
                              name=f"stage{lvl+1}_1")(y, train)
            y = SparseConv3d(cout, cout, 3, name=f"stage{lvl+1}_tail")(y)
            y = SparseBatchNorm(cout, axis_name=ax,
                                name=f"stage{lvl+1}_tail_bn")(y, train)
            lk = _Elk(cin, aux_capacity=aux_caps[lvl], groups=self.groups,
                          baseop=self.baseop, name=f"elk{lvl+1}")(
                              st_0, st_0.stride[0] * self.s, self.r, train)
            lk = SparseConv3d(cin, cout, 3, name=f"elk{lvl+1}_tail")(lk)
            lk = SparseBatchNorm(cout, axis_name=ax,
                                 name=f"elk{lvl+1}_tail_bn")(lk, train)
            st = y.replace(feats=jax.nn.relu(y.feats + lk.feats))
            feats_list.append(st)

        x0, x1, x2, x3, x4 = feats_list

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
