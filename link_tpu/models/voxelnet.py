"""VoxelNet detector: reader -> sparse backbone -> RPN -> CenterHead.

Reference: detection/det3d/models/detectors/voxelnet.py:10-96 (+
readers/voxel_encoder.py:8-25 VoxelFeatureExtractorV3: per-voxel mean over
its points).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .center_head import CenterHead
from .rpn import RPN
from .scn import DET_CAPACITIES, SpMiddleResNetFHDELKv3


def voxel_feature_extractor_v3(voxels: jnp.ndarray,
                               num_points: jnp.ndarray) -> jnp.ndarray:
    """voxels (N, max_pts, F), num_points (N,) -> (N, F) mean over real
    points (readers/voxel_encoder.py:18-25)."""
    s = jnp.sum(voxels, axis=1)
    return s / jnp.maximum(num_points, 1).astype(voxels.dtype)[:, None]


class VoxelNet(nn.Module):
    num_input_features: int = 5
    batch_size: int = 1
    grid_shape: Tuple[int, int, int] = (1440, 1440, 40)
    capacities: Tuple[int, ...] = DET_CAPACITIES
    elk: bool = True
    tasks: Tuple[Tuple[str, ...], ...] = CenterHead.tasks
    bn_axis: Optional[str] = None
    dcn_head: bool = False
    # compute dtype for backbone + neck + head (params and the box decode
    # stay f32); bf16 halves gather bytes / MXU time on the sparse path
    dtype: str = "float32"
    # forward_two_stage parity (detectors/voxelnet.py:74-92): also return
    # the neck output as the second-stage BEV feature map
    return_bev: bool = False
    # hybrid sparse->dense backbone (scn.py dense_from_level): levels >=
    # this index run masked dense convs on the MXU instead of the
    # descriptor-bound sparse path; None = fully sparse
    dense_from_level: Optional[int] = None

    @nn.compact
    def __call__(self, voxels: jnp.ndarray, coords: jnp.ndarray,
                 num_points: jnp.ndarray, nnz: jnp.ndarray,
                 train: bool = False):
        feats = voxel_feature_extractor_v3(voxels, num_points)
        bev, _ = SpMiddleResNetFHDELKv3(
            num_input_features=self.num_input_features, elk=self.elk,
            capacities=self.capacities, batch_size=self.batch_size,
            bn_axis=self.bn_axis, dtype=self.dtype,
            dense_from_level=self.dense_from_level, name="backbone")(
                feats, coords, nnz, self.grid_shape, train)
        x = RPN(bn_axis=self.bn_axis, dtype=self.dtype, name="neck")(
            bev, train)
        preds = CenterHead(tasks=self.tasks, bn_axis=self.bn_axis,
                           dcn_head=self.dcn_head, dtype=self.dtype,
                           name="bbox_head")(x, train)
        if self.return_bev:
            return preds, x
        return preds
