"""End-to-end monocular VO on the synthetic plane scene (SURVEY.md §7.2
stage 4: the first E2E milestone — init, sparse align, direct tracking, local
BA, trajectory, ATE check)."""
import numpy as np
import jax.numpy as jnp
import pytest

from ygz_tpu.geometry import camera as cam_mod, lie
from ygz_tpu.system import System, Sensor
from ygz_tpu.eval.ate import ate_rmse

from synthetic import SmoothScene


def make_trajectory(n_frames, step=0.03):
    """Smooth sideways sweep with gentle yaw oscillation. Returns list of
    (R, t) world->cam poses."""
    poses = []
    for i in range(n_frames):
        yaw = 0.03 * np.sin(i * 0.15)
        pitch = 0.015 * np.sin(i * 0.09 + 1.0)
        w = np.array([pitch, yaw, 0.0], np.float32)
        R = np.asarray(lie.so3_exp(jnp.asarray(w)))
        c = np.array([step * i, 0.15 * np.sin(i * 0.1), 0.0], np.float32)
        t = -R @ c  # camera centre c => t = -R c
        poses.append((R, t))
    return poses


@pytest.mark.slow
def test_mono_vo_on_textured_surface():
    scene = SmoothScene(seed=11)
    cam = cam_mod.Camera.make(scene.f, scene.f, scene.cx, scene.cy,
                              scene.w, scene.h)
    poses = make_trajectory(50)
    sys = System(cam, Sensor.MONOCULAR)

    states = []
    for i, (R, t) in enumerate(poses):
        img = scene.render(R, t)
        state, T = sys.track_monocular(img, timestamp=i * 0.05)
        states.append(state)

    n_ok = sum(1 for s in states if s == "OK")
    assert n_ok > 35, f"only {n_ok} frames tracked: {states}"
    assert states[-1] == "OK", f"lost at the end: {states[-10:]}"

    # ATE with 7-DoF alignment (mono scale ambiguity)
    est, gt = [], []
    for rec, (R, t) in zip(sys.trajectory, poses):
        if rec.state != "OK":
            continue
        est.append(-rec.R.T @ rec.t)
        gt.append(-R.T @ t)
    rmse, _ = ate_rmse(np.array(est), np.array(gt), with_scale=True)
    # trajectory spans ~1.5 world units; demand <3% error
    assert rmse < 0.045, f"ATE RMSE {rmse:.4f}"

    # map sanity: enough surviving points, depths in a plausible band
    smap = sys.map
    pts = smap.pt_xyz[smap.pt_valid[: smap.n_pt].nonzero()[0]]
    assert len(pts) > 100
    z = pts[:, 2]
    z_med = np.median(z)
    assert np.mean((z > 0.5 * z_med) & (z < 2.0 * z_med)) > 0.95


@pytest.mark.slow
def test_mono_vo_octree_keypoint_mode():
    """The ORBSLAM-style octree keypoint mode (TrackerConfig.keypoint_mode=
    'octree') tracks the same scene end-to-end."""
    from ygz_tpu.frontend.tracker import TrackerConfig

    scene = SmoothScene(seed=7)
    cam = cam_mod.Camera.make(scene.f, scene.f, scene.cx, scene.cy,
                              scene.w, scene.h)
    poses = make_trajectory(25)
    sys = System(cam, Sensor.MONOCULAR,
                 config=TrackerConfig(keypoint_mode="octree"))
    states = []
    for i, (R, t) in enumerate(poses):
        state, _ = sys.track_monocular(scene.render(R, t), timestamp=i * 0.05)
        states.append(state)
    assert states[-1] == "OK", states[-8:]
    assert sum(s == "OK" for s in states) > 15
