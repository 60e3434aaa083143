"""Test-suite shim: the synthetic renderer lives in ygz_tpu.utils.synthetic
(it is also used by the full-system benchmark, bench.py)."""
from ygz_tpu.utils.synthetic import (  # noqa: F401
    PLANE_Z, TEX_SCALE, make_texture, PlaneScene, SmoothScene, StepScene,
    Nuisance, smooth_depth, step_depth)
