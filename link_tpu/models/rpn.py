"""RPN neck: dense BEV conv pyramid (reference:
detection/det3d/models/necks/rpn.py:22-160).

Per scale i: ZeroPad(1) + Conv3x3(stride s_i, no bias) + BN + ReLU followed
by layer_num more Conv3x3(pad 1) + BN + ReLU; each scale is upsampled by a
ConvTranspose(k = s = us_stride) + BN + ReLU (or strided conv when
us_stride < 1) and the branches are channel-concatenated.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

RPN_NORM = dict(epsilon=1e-3, momentum=0.99)


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    transpose: bool = False
    bn_axis: Optional[str] = None
    dtype: str = "float32"     # compute dtype; params stay f32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = jnp.dtype(self.dtype)
        if self.transpose:
            y = nn.ConvTranspose(self.features,
                                 (self.kernel, self.kernel),
                                 strides=(self.stride, self.stride),
                                 dtype=dt, use_bias=False)(x)
        else:
            y = nn.Conv(self.features, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride),
                        padding=self.padding, dtype=dt, use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train,
                         axis_name=self.bn_axis, dtype=dt, **RPN_NORM)(y)
        return jax.nn.relu(y)


class RPN(nn.Module):
    layer_nums: Sequence[int] = (5, 5)
    ds_layer_strides: Sequence[int] = (1, 2)
    ds_num_filters: Sequence[int] = (128, 256)
    us_layer_strides: Sequence[int] = (1, 2)
    us_num_filters: Sequence[int] = (256, 256)
    num_input_features: int = 256
    bn_axis: Optional[str] = None
    dtype: str = "float32"     # compute dtype; params stay f32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: (B, C, H, W) BEV -> (B, sum(us_filters), H', W'). Internally
        NHWC for flax convs."""
        h = jnp.transpose(x, (0, 2, 3, 1)).astype(jnp.dtype(self.dtype))
        ups = []
        start = len(self.layer_nums) - len(self.us_layer_strides)
        for i, n_layers in enumerate(self.layer_nums):
            h = ConvBNReLU(self.ds_num_filters[i], 3,
                           self.ds_layer_strides[i], padding=1,
                           bn_axis=self.bn_axis, dtype=self.dtype,
                           name=f"block{i}_conv0")(h, train)
            for j in range(n_layers):
                h = ConvBNReLU(self.ds_num_filters[i], 3, 1, padding=1,
                               bn_axis=self.bn_axis, dtype=self.dtype,
                               name=f"block{i}_conv{j+1}")(h, train)
            if i - start >= 0:
                us = self.us_layer_strides[i - start]
                f = self.us_num_filters[i - start]
                if us > 1:
                    up = ConvBNReLU(f, us, us, padding=0, transpose=True,
                                    bn_axis=self.bn_axis, dtype=self.dtype,
                                    name=f"deblock{i-start}")(h, train)
                else:
                    s = int(round(1 / us))
                    up = ConvBNReLU(f, s, s, padding=0, bn_axis=self.bn_axis,
                                    dtype=self.dtype,
                                    name=f"deblock{i-start}")(h, train)
                ups.append(up)
        out = jnp.concatenate(ups, axis=-1) if ups else h
        return jnp.transpose(out, (0, 3, 1, 2))
