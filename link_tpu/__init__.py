"""link_tpu: TPU-native LiDAR 3D perception framework (LinK reimplementation).

A from-scratch JAX/XLA/Pallas rebuild of MCG-NJU/LinK (CVPR 2023): linear
large-kernel (ELK) sparse backbones for SemanticKITTI segmentation and
nuScenes CenterPoint detection, designed for fixed-shape XLA compilation,
MXU-friendly sparse convolution and GSPMD data parallelism.
"""

__version__ = "0.1.0"

from .sparse.tensor import SparseTensor, make_sparse_tensor, cat  # noqa: F401
