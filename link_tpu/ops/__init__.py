from . import elk  # noqa: F401
