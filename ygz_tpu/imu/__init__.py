from . import preintegration, navstate  # noqa: F401
