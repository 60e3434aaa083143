"""Stereo tests: disparity kernel golden test + stereo E2E tracking."""
import numpy as np
import jax.numpy as jnp
import pytest

from ygz_tpu.ops.stereo import stereo_match_features
from ygz_tpu.geometry import camera as cam_mod
from ygz_tpu.system import System, Sensor
from ygz_tpu.eval.ate import ate_rmse

from synthetic import SmoothScene
from test_vo_e2e import make_trajectory

BASELINE = 0.2  # meters


def render_pair(scene, R, t):
    """Left at (R,t); right displaced by BASELINE along camera x."""
    imgL = scene.render(R, t)
    tr = t - np.array([BASELINE, 0.0, 0.0], np.float32)
    imgR = scene.render(R, tr)
    return imgL, imgR


class TestDisparityKernel:
    def test_disparity_matches_depth(self):
        scene = SmoothScene(seed=21)
        R0 = np.eye(3, dtype=np.float32)
        t0 = np.zeros(3, np.float32)
        imgL, imgR = render_pair(scene, R0, t0)
        depth = scene.depth(R0, t0)

        rng = np.random.default_rng(0)
        n = 64
        uv = np.stack([rng.uniform(120, 520, n),
                       rng.uniform(100, 380, n)], 1).astype(np.float32)
        disp, ok = stereo_match_features(
            jnp.asarray(imgL), jnp.asarray(imgR), jnp.asarray(uv),
            jnp.ones(n, bool))
        disp = np.asarray(disp)
        ok = np.asarray(ok)
        assert ok.sum() > 0.8 * n
        # disparity = f * b / z
        z = depth[np.round(uv[ok, 1]).astype(int),
                  np.round(uv[ok, 0]).astype(int)]
        d_true = scene.f * BASELINE / z
        err = np.abs(disp[ok] - d_true)
        assert np.median(err) < 0.3, np.median(err)


@pytest.mark.slow
def test_stereo_tracking_metric_scale():
    scene = SmoothScene(seed=22)
    cam = cam_mod.Camera.make(scene.f, scene.f, scene.cx, scene.cy,
                              scene.w, scene.h, bf=scene.f * BASELINE)
    poses = make_trajectory(35)
    sys = System(cam, Sensor.STEREO)

    states = []
    for i, (R, t) in enumerate(poses):
        imgL, imgR = render_pair(scene, R, t)
        state, T = sys.track_stereo(imgL, imgR, timestamp=i * 0.05)
        states.append(state)

    assert states[0] == "OK", "stereo must initialize on the first frame"
    assert sum(1 for s in states if s == "OK") > 30, states
    assert states[-1] == "OK"

    est, gt = [], []
    for rec, (R, t) in zip(sys.trajectory, poses):
        if rec.state != "OK":
            continue
        est.append(-rec.R.T @ rec.t)
        gt.append(-R.T @ t)
    rmse, _ = ate_rmse(np.array(est), np.array(gt), with_scale=False)
    assert rmse < 0.08, f"metric ATE RMSE {rmse:.4f}"
    span_est = np.linalg.norm(est[-1] - est[0])
    span_gt = np.linalg.norm(gt[-1] - gt[0])
    # TODO(stereo-BA): scale error ~6% until stereo (u,v,uR) residual edges
    # constrain depth in BA (reference chi2=7.815 stereo edges)
    assert abs(span_est / span_gt - 1.0) < 0.10