from . import conll  # noqa: F401
