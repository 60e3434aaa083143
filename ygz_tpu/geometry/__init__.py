from . import lie, camera, triangulation, twoview  # noqa: F401
