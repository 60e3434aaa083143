"""E2E accuracy under photometric nuisances (exposure gain/bias, pixel
noise, motion blur, occluders): the hardened stand-in for real-dataset
validation — real datasets cannot be fetched in this environment (VERDICT
round-1 action 9)."""
import numpy as np
import pytest

from ygz_tpu.geometry import camera as cam_mod
from ygz_tpu.system import System, Sensor
from ygz_tpu.frontend.tracker import TrackerConfig
from ygz_tpu.eval.ate import ate_rmse

from synthetic import SmoothScene, Nuisance
from test_vo_e2e import make_trajectory


@pytest.mark.slow
def test_mono_vo_with_photometric_nuisances():
    scene = SmoothScene(seed=11)
    nuis = Nuisance(seed=3)
    cam = cam_mod.Camera.make(scene.f, scene.f, scene.cx, scene.cy,
                              scene.w, scene.h)
    poses = make_trajectory(50)
    sys_ = System(cam, Sensor.MONOCULAR)

    states = []
    for i, (R, t) in enumerate(poses):
        img = nuis.apply(scene.render(R, t), i)
        state, _ = sys_.track_monocular(img, timestamp=i * 0.05)
        states.append(state)

    n_ok = sum(1 for s in states if s == "OK")
    assert n_ok > 35, f"only {n_ok} frames tracked: {states}"
    assert states[-1] == "OK", states[-10:]

    est, gt = [], []
    for rec, (R, t) in zip(sys_.trajectory, poses):
        if rec.state != "OK":
            continue
        est.append(-rec.R.T @ rec.t)
        gt.append(-R.T @ t)
    rmse, _ = ate_rmse(np.array(est), np.array(gt), with_scale=True)
    # clean-scene bound is 0.045; allow 2x under nuisances
    assert rmse < 0.09, f"ATE RMSE {rmse:.4f} under nuisances"


@pytest.mark.slow
def test_rgbd_with_photometric_nuisances():
    scene = SmoothScene(seed=13)
    nuis = Nuisance(seed=5, n_occluders=1)
    cam = cam_mod.Camera.make(scene.f, scene.f, scene.cx, scene.cy,
                              scene.w, scene.h)
    poses = make_trajectory(40)
    sys_ = System(cam, Sensor.RGBD)
    states = []
    for i, (R, t) in enumerate(poses):
        img = nuis.apply(scene.render(R, t), i)
        depth = scene.depth(R, t)   # depth itself stays clean (sensor-domain)
        state, _ = sys_.track_rgbd(img, depth, timestamp=i * 0.05)
        states.append(state)
    n_ok = sum(1 for s in states if s == "OK")
    assert n_ok > 30, states

    est, gt = [], []
    for rec, (R, t) in zip(sys_.trajectory, poses):
        if rec.state != "OK":
            continue
        est.append(-rec.R.T @ rec.t)
        gt.append(-R.T @ t)
    rmse, _ = ate_rmse(np.array(est), np.array(gt), with_scale=False)
    assert rmse < 0.06, f"metric ATE RMSE {rmse:.4f} under nuisances"
