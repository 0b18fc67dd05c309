"""ELK block: linear large-kernel aggregation via trig reparameterization.

Reference: segmentation/core/models/semantic_kitti/linkunet.py:94-185
(ELKBlock). The position-dependent kernel weight w(p) is reparameterized in
{sin, cos, cos_x} bases so the large-window convolution factorizes as
per-voxel modulation -> block pre-aggregation (voxel_to_aux) -> r^3 window
sum (aux_to_voxel) -> per-voxel demodulation. Cost is linear in voxels and
independent of the (r*s)^3 receptive field.

`normalize_coords=True` reproduces the linkencoder variant which feeds
coords / stride into the cos_x positional map (linkencoder.py:165).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.modules import Linear, SparseConv3d, SparseLayerNorm
from ..ops.elk import aux_to_voxel, voxel_to_aux
from ..sparse.dense_grid import (DenseGrid, block_broadcast, block_pool,
                                 box_sum, cell_coords_xyz)
from ..sparse.tensor import SparseTensor


class ELKBlock(nn.Module):
    """`det_grouping=True` reproduces the detection TSELKBlock's channel
    grouping (detection/det3d/models/utils/ts_elk.py:168): the positional
    Linear has full width (3, inc) but only its first inc/2 columns are
    used, tiled twice."""

    inc: int
    aux_capacity: int
    groups: int = 1
    baseop: str = "cos_x"
    normalize_coords: bool = False
    det_grouping: bool = False

    @nn.compact
    def __call__(self, st: SparseTensor, s: int, r: int,
                 train: bool = False) -> SparseTensor:
        assert self.baseop in ("cos", "sin", "cos_x")
        assert self.inc % self.groups == 0
        cg = self.inc if self.det_grouping else self.inc // self.groups
        dense = isinstance(st, DenseGrid)

        f_input = Linear(self.inc, self.inc, use_bias=False,
                         name="pre_mix")(st.feats)
        f_input = SparseLayerNorm(self.inc, name="pre_mix_norm")(f_input)
        if dense:
            # empty cells must contribute nothing to the block pooling;
            # LayerNorm's affine bias made them nonzero
            f_input = jnp.where(st.mask[..., None], f_input, 0)
        local = SparseConv3d(self.inc, self.inc, 3, name="local_mix")(st)

        if dense:
            c3 = cell_coords_xyz(st)       # (Z, Y, X, 3), broadcasts over B
            assert not self.normalize_coords
        else:
            c3 = st.coords[:, :3].astype(jnp.float32)
            if self.baseop == "cos_x" and self.normalize_coords:
                c3 = c3 / st.stride[0]
        pw = Linear(3, cg, use_bias=False, name="pos_weight")(c3)

        if self.det_grouping:
            half = pw[..., :self.inc // 2]
            pw = jnp.concatenate([half, half], axis=-1)
        elif self.baseop == "cos_x":
            alpha = self.param("alpha", nn.initializers.ones, (1, cg))
            pw = pw * alpha
        else:
            pw = jnp.concatenate([pw] * self.groups, axis=-1)

        pw_sin, pw_cos = jnp.sin(pw), jnp.cos(pw)

        if self.baseop == "sin":
            mod = jnp.concatenate([f_input * pw_sin, f_input * pw_cos],
                                  axis=-1)
        elif self.baseop == "cos":
            mod = jnp.concatenate([f_input * pw_cos, f_input * pw_sin],
                                  axis=-1)
        else:  # cos_x
            f_lin = f_input * pw
            mod = jnp.concatenate(
                [f_input * pw_cos, f_input * pw_sin, f_lin], axis=-1)
        # the f32 trig factors promote mod to f32; cast back so the aux
        # window gathers move model-dtype rows (f32 keeps 2-3C-channel
        # rows at 772-1028 B — off the 256 B descriptor plateau, the det
        # train profile's widest gather slice). Pooling still accumulates
        # f32 inside spvoxelize/spdevoxelize.
        mod = mod.astype(st.feats.dtype)

        if dense:
            # voxel_to_aux / aux_to_voxel collapse to block sums + an r^3
            # box sum over the block grid (sparse/dense_grid.py); the
            # count channel is the mask's block sum — exact equivalent of
            # the reference's count-weighted formulation (utils.py:61-84)
            _, Z, Y, X, _ = st.feats.shape
            sums, counts = block_pool(mod, st.mask, s)
            mean = sums / jnp.maximum(counts, 1.0)[..., None]
            f = jnp.concatenate(
                [mean, jnp.ones(counts.shape + (1,), mean.dtype)], axis=-1)
            win = box_sum(f * counts[..., None], r)
            denom = win[..., -1:]
            blocks = win[..., :-1] / jnp.where(denom == 0, 1, denom)
            agg = block_broadcast(blocks, s, (Z, Y, X)).astype(
                st.feats.dtype)
        else:
            from ..ops.elk import elk_aux_window_dense, use_dense_aux
            gs = use_dense_aux(st, s, r, mod.shape[-1])
            if gs is not None:
                # dense-aux: the aux lattice fits a dense grid (det
                # levels), so the r^3 window sum runs as a reduce_window
                # box sum — no join, no window gathers (round-5 det
                # profile: the sparse aux slice was ~35 ms/frame)
                agg = elk_aux_window_dense(mod, st.coords, s, r, gs)
            else:
                aux, idx, counts = voxel_to_aux(st.replace(feats=mod), s,
                                                self.aux_capacity)
                agg = aux_to_voxel(aux, st.replace(feats=mod), idx, counts,
                                   r).feats

        c = self.inc
        if self.baseop == "sin":
            # sin(a - b) addition theorem (linkunet.py:148)
            new = agg[..., :c] * pw_cos - agg[..., c:] * pw_sin
        elif self.baseop == "cos":
            # cos(a - b) expansion (linkunet.py:162)
            new = agg[..., :c] * pw_cos + agg[..., c:] * pw_sin
        else:
            # cos(a - b) + linear term, self-tap subtracted (linkunet.py:176)
            new = (agg[..., :c] * pw_cos + agg[..., c:2 * c] * pw_sin
                   + (agg[..., 2 * c:] - f_lin))

        new = SparseLayerNorm(self.inc, name="norm")(new)
        local_f = SparseLayerNorm(self.inc, name="norm_local")(local.feats)
        out = jax.nn.relu(new + local_f)
        if dense:
            return st.masked(out)
        return st.replace(feats=out)
