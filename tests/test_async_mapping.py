"""Async mapping pipeline: tracking quality must match the synchronous path
within tolerance (the async LocalMapping-thread counterpart)."""
import numpy as np
import pytest

from ygz_tpu.geometry import camera as cam_mod
from ygz_tpu.system import System, Sensor
from ygz_tpu.frontend.tracker import TrackerConfig
from ygz_tpu.eval.ate import ate_rmse

from synthetic import SmoothScene
from test_vo_e2e import make_trajectory


@pytest.mark.slow
def test_async_mapping_matches_sync():
    scene = SmoothScene(seed=11)
    cam = cam_mod.Camera.make(scene.f, scene.f, scene.cx, scene.cy,
                              scene.w, scene.h)
    poses = make_trajectory(40)
    imgs = [scene.render(R, t) for (R, t) in poses]

    results = {}
    for mode in ("sync", "async"):
        sys_ = System(cam, Sensor.MONOCULAR,
                      config=TrackerConfig(async_mapping=(mode == "async")))
        for i, img in enumerate(imgs):
            state, _ = sys_.track_monocular(img, timestamp=i * 0.05)
        if mode == "async":
            sys_.tracker.wait_mapping_idle()
        est, gt = [], []
        for rec, (R, t) in zip(sys_.trajectory, poses):
            if rec.state != "OK":
                continue
            est.append(-rec.R.T @ rec.t)
            gt.append(-R.T @ t)
        assert len(est) > 30, f"{mode}: too few tracked frames"
        rmse, _ = ate_rmse(np.array(est), np.array(gt), with_scale=True)
        results[mode] = rmse

    assert results["sync"] < 0.05, results
    # async returns pre-BA frame poses, so a modest accuracy gap is expected
    assert results["async"] < 3.0 * results["sync"] + 0.02, results
