from . import datasets, config  # noqa: F401
