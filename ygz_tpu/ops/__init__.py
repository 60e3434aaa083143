from . import image, fast, select, orb, matching  # noqa: F401
