from .linkunet import ELKUNet, DEFAULT_CAPACITIES  # noqa: F401
from .linkencoder import ELKEncoder  # noqa: F401
from .minkunet import MinkUNet  # noqa: F401
from .spvcnn import SPVCNN  # noqa: F401
from .elk import ELKBlock  # noqa: F401
from . import builder  # noqa: F401
