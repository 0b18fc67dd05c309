from .modules import (  # noqa: F401
    SparseConv3d, SparseBatchNorm, SparseLayerNorm, Linear, relu,
    GlobalAveragePool, GlobalMaxPool,
)
