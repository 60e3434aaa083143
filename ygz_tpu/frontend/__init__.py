from . import extractor, sparse_align, direct_tracker, tracker  # noqa: F401
