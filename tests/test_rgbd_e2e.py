"""End-to-end RGB-D tracking on the synthetic surface: metric scale, no
two-view bootstrap (reference rgbd_tum path)."""
import numpy as np
import pytest

from ygz_tpu.geometry import camera as cam_mod
from ygz_tpu.system import System, Sensor
from ygz_tpu.eval.ate import ate_rmse

from synthetic import SmoothScene
from test_vo_e2e import make_trajectory


@pytest.mark.slow
def test_rgbd_tracking_metric_scale():
    scene = SmoothScene(seed=13)
    cam = cam_mod.Camera.make(scene.f, scene.f, scene.cx, scene.cy,
                              scene.w, scene.h)
    poses = make_trajectory(40)
    sys = System(cam, Sensor.RGBD)

    states = []
    for i, (R, t) in enumerate(poses):
        img = scene.render(R, t)
        depth = scene.depth(R, t)
        state, T = sys.track_rgbd(img, depth, timestamp=i * 0.05)
        states.append(state)

    n_ok = sum(1 for s in states if s == "OK")
    assert states[0] == "OK", "RGB-D must initialize on the FIRST frame"
    assert n_ok > 35, states
    assert states[-1] == "OK"

    est, gt = [], []
    for rec, (R, t) in zip(sys.trajectory, poses):
        if rec.state != "OK":
            continue
        est.append(-rec.R.T @ rec.t)
        gt.append(-R.T @ t)
    # 6-DoF alignment WITHOUT scale: depth gives the metric scale directly
    rmse, _ = ate_rmse(np.array(est), np.array(gt), with_scale=False)
    assert rmse < 0.05, f"metric ATE RMSE {rmse:.4f}"

    # the recovered scale must be truly metric: compare direct distances
    span_est = np.linalg.norm(est[-1] - est[0])
    span_gt = np.linalg.norm(gt[-1] - gt[0])
    assert abs(span_est / span_gt - 1.0) < 0.05
