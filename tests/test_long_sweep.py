"""Long out-and-back sweep: map reuse on revisit, bounded drift.

The camera sweeps ~5 units out (original scene leaves the FOV) and returns.
With healthy mapping the return leg re-binds the original map points through
covisibility (implicit loop closure by map reuse); the explicit BoW+Sim3 loop
path (backend/loopclosing.py) is component-tested separately and only fires
when drift prevents re-binding."""
import numpy as np
import jax.numpy as jnp
import pytest

from ygz_tpu.geometry import camera as cam_mod, lie
from ygz_tpu.system import System, Sensor
from ygz_tpu.frontend.tracker import TrackerConfig
from ygz_tpu.eval.ate import ate_rmse

from synthetic import SmoothScene

N = 200
SWEEP = 5.0


def pose(i):
    s = SWEEP * np.sin(np.pi * i / N)
    yaw = 0.02 * np.sin(i * 0.23)
    R = np.asarray(lie.so3_exp(jnp.asarray(
        np.array([0.0, yaw, 0.0], np.float32))))
    c = np.array([s, 0.12 * np.sin(i * 0.11), 0.0], np.float32)
    return R, (-R @ c).astype(np.float32)


@pytest.mark.slow
def test_long_sweep_revisit():
    scene = SmoothScene(seed=31, w=480, h=360, f=600.0, tex_size=2400)
    cam = cam_mod.Camera.make(scene.f, scene.f, scene.cx, scene.cy,
                              scene.w, scene.h)
    sys_ = System(cam, Sensor.MONOCULAR, config=TrackerConfig(kf_max_gap=10))
    states = []
    for i in range(N):
        R, t = pose(i)
        state, _ = sys_.track_monocular(scene.render(R, t), timestamp=i * 0.05)
        states.append(state)

    assert all(s != "LOST" for s in states[5:]), states
    est, gt = [], []
    for i, r in enumerate(sys_.trajectory):
        if r.state != "OK":
            continue
        est.append(-r.R.T @ r.t)
        R, t = pose(i)
        gt.append(-R.T @ t)
    rmse, _ = ate_rmse(np.array(est), np.array(gt), with_scale=True)
    assert rmse < 0.075, f"ATE {rmse:.4f} over a {SWEEP}-unit sweep"

    # the return leg must REUSE old points, not duplicate the whole map:
    # new-point creation on the way back should be below the outbound rate
    smap = sys_.map
    assert smap.n_pt < 8000, smap.n_pt
