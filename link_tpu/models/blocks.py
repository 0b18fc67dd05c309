"""Shared sparse conv blocks (reference: linkunet.py:23-91)."""

from __future__ import annotations

from typing import Optional

import jax
from flax import linen as nn

from ..nn.modules import SparseBatchNorm, SparseConv3d
from ..sparse.tensor import SparseTensor


class BasicConvolutionBlock(nn.Module):
    """Conv3d + BN + ReLU (linkunet.py:23-39)."""

    inc: int
    outc: int
    ks: int = 3
    stride: int = 1
    dilation: int = 1
    out_capacity: Optional[int] = None
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: SparseTensor, train: bool = False) -> SparseTensor:
        x = SparseConv3d(self.inc, self.outc, self.ks, stride=self.stride,
                         dilation=self.dilation,
                         out_capacity=self.out_capacity)(x)
        x = SparseBatchNorm(self.outc, axis_name=self.bn_axis)(x, train)
        return x.replace(feats=jax.nn.relu(x.feats))


class BasicDeconvolutionBlock(nn.Module):
    """Transposed Conv3d + BN + ReLU (linkunet.py:42-58)."""

    inc: int
    outc: int
    ks: int = 3
    stride: int = 1
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: SparseTensor, train: bool = False) -> SparseTensor:
        x = SparseConv3d(self.inc, self.outc, self.ks, stride=self.stride,
                         transposed=True)(x)
        x = SparseBatchNorm(self.outc, axis_name=self.bn_axis)(x, train)
        return x.replace(feats=jax.nn.relu(x.feats))


class ResidualBlock(nn.Module):
    """Two convs + BN with projection shortcut (linkunet.py:61-91)."""

    inc: int
    outc: int
    ks: int = 3
    stride: int = 1
    dilation: int = 1
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: SparseTensor, train: bool = False) -> SparseTensor:
        y = SparseConv3d(self.inc, self.outc, self.ks, stride=self.stride,
                         dilation=self.dilation)(x)
        y = SparseBatchNorm(self.outc, axis_name=self.bn_axis)(y, train)
        y = y.replace(feats=jax.nn.relu(y.feats))
        y = SparseConv3d(self.outc, self.outc, self.ks, stride=1,
                         dilation=self.dilation)(y)
        y = SparseBatchNorm(self.outc, axis_name=self.bn_axis)(y, train)

        if self.inc == self.outc and self.stride == 1:
            sc = x
        else:
            sc = SparseConv3d(self.inc, self.outc, 1, stride=self.stride)(x)
            sc = SparseBatchNorm(self.outc, axis_name=self.bn_axis)(sc, train)
        return y.replace(feats=jax.nn.relu(y.feats + sc.feats))
