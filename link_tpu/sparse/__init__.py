from . import coords, ops, conv  # noqa: F401
from .tensor import SparseTensor, ConvPlan, make_sparse_tensor, cat  # noqa: F401
