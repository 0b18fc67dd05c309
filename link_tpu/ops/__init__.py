from . import elk, point  # noqa: F401
