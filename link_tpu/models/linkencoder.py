"""LinK encoder-only segmentation model (reference: linkencoder.py:188-389,
ELKEncoder).

Same 4-level ELK encoder as ELKUNet but no transposed-conv decoder: every
level is broadcast back to stem resolution with `upsample_voxel`
(nearest-ancestor join), the 5 scales are channel-concatenated and
classified by a grouped 1x1 conv head (groups=5) -> 120 -> classes
(linkencoder.py:323-328). The encoder's cos_x positional map normalizes
coords by the tensor stride (linkencoder.py:165).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.modules import Linear, SparseBatchNorm, SparseConv3d
from ..ops.elk import upsample_voxel
from ..sparse.tensor import SparseTensor
from .blocks import BasicConvolutionBlock, ResidualBlock
from .elk import ELKBlock
from .linkunet import DEFAULT_CAPACITIES


def _plan_policy():
    """Remat policy: save the integer kernel-map/join tensors
    (coords.PLAN_TAG) + every conv output (conv.CONV_OUT_TAG) so the
    backward recompute skips sorts, searches, and gather chains — see
    linkunet._plan_policy."""
    import jax
    from ..sparse.conv import CONV_OUT_TAG
    from ..sparse.coords import PLAN_TAG
    return jax.checkpoint_policies.save_only_these_names(
        PLAN_TAG, CONV_OUT_TAG)


class GroupedPointConv(nn.Module):
    """1x1 grouped Conv1d over per-voxel features (torch Conv1d semantics:
    weight (Co, Ci/groups, 1), default kaiming-uniform init)."""

    in_features: int
    out_features: int
    groups: int = 1

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        g = self.groups
        ci, co = self.in_features // g, self.out_features // g
        import math
        std = 1.0 / math.sqrt(ci)

        def init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -std, std)

        w = self.param("kernel", init, (g, ci, co))
        b = self.param("bias", init, (g, co))
        x = feats.reshape(feats.shape[0], g, ci)
        y = jnp.einsum("ngi,gio->ngo", x, w,
                       preferred_element_type=jnp.float32) + b
        return y.reshape(feats.shape[0], g * co).astype(feats.dtype)


class ELKEncoder(nn.Module):
    num_classes: int
    cr: float = 1.0
    r: int = 3
    s: int = 7
    groups: int = 2
    baseop: str = "cos"
    in_channels: int = 4
    capacities: Tuple[int, ...] = DEFAULT_CAPACITIES
    aux_capacities: Optional[Tuple[int, ...]] = None
    bn_axis: Optional[str] = None
    dtype: str = "float32"  # bf16 halves MXU time + gather bytes
    remat: bool = False      # rematerialize blocks (training memory)
    # static stride-1 domain bound (see ELKUNet.grid_extent)
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

        st = SparseConv3d(self.in_channels, cs[0], 3, name="stem0")(x)
        st = SparseBatchNorm(cs[0], axis_name=ax, name="stem0_bn")(st, train)
        st = st.replace(feats=jax.nn.relu(st.feats))
        st = SparseConv3d(cs[0], cs[0], 3, name="stem1")(st)
        st = SparseBatchNorm(cs[0], axis_name=ax, name="stem1_bn")(st, train)
        x0 = st.replace(feats=jax.nn.relu(st.feats))

        levels = []
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
                          baseop=self.baseop, normalize_coords=True,
                          name=f"elk{lvl+1}")(
                              st_0, st_0.stride[0] * self.s, self.r, train)
            lk = SparseConv3d(cin, cout, 3, name=f"elk{lvl+1}_tail")(lk)
            lk = SparseBatchNorm(cout, axis_name=ax,
                                 name=f"elk{lvl+1}_tail_bn")(lk, train)
            st = y.replace(feats=jax.nn.relu(y.feats + lk.feats))
            levels.append(st)

        x1, x2, x3, x4 = levels
        y4 = upsample_voxel(x4, x0)
        y3 = upsample_voxel(x3, x0)
        y2 = upsample_voxel(x2, x0)
        y1 = upsample_voxel(x1, x0)

        f_cat = jnp.concatenate(
            [y4.feats, y3.feats, y2.feats, y1.feats, x0.feats], axis=1)
        h = GroupedPointConv(cs[8] * 5, 120, groups=5, name="head0")(f_cat)
        h = jax.nn.relu(h)
        return GroupedPointConv(120, self.num_classes, groups=1,
                                name="head1")(h)
