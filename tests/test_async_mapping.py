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


@pytest.mark.slow
def test_async_mapping_mono_vi():
    """Mono-VI with the async mapping worker: VINS init still succeeds
    (against a drained queue) and the post-init trajectory stays metric."""
    from test_vio_e2e import pose_fn, synth_imu, FPS
    from ygz_tpu.system import System, Sensor
    from ygz_tpu.geometry import camera as cam_mod
    from ygz_tpu.frontend.tracker import TrackerConfig
    from synthetic import SmoothScene
    import numpy as np

    scene = SmoothScene(seed=11)
    cam = cam_mod.Camera.make(scene.f, scene.f, scene.cx, scene.cy,
                              scene.w, scene.h)
    sys_ = System(cam, Sensor.MONO_VI,
                  config=TrackerConfig(kf_max_gap=8, async_mapping=True),
                  vins_init_kfs=6, vins_init_time=1.2)
    states = []
    ready_at = None
    n_frames = 70
    for i in range(n_frames):
        t = i / FPS
        R, tt = pose_fn(t)
        img = scene.render(R, tt)
        imu = synth_imu((i - 1) / FPS, t) if i > 0 else []
        state, _ = sys_.track_mono_vi(img, imu, timestamp=t)
        states.append(state)
        if ready_at is None and sys_.tracker.vio_ready:
            ready_at = i
    sys_.shutdown()
    assert ready_at is not None, "VINS init failed under async mapping"
    assert sum(s == "OK" for s in states) > 0.8 * n_frames

    recs = sys_.trajectory
    post = [(r, i) for i, r in enumerate(recs)
            if i > ready_at + 2 and r.state == "OK"]
    (r0, i0), (r1, i1) = post[0], post[-1]
    c0 = -r0.R.T @ r0.t
    c1 = -r1.R.T @ r1.t
    Rg0, tg0 = pose_fn(i0 / FPS)
    Rg1, tg1 = pose_fn(i1 / FPS)
    span_est = np.linalg.norm(c1 - c0)
    span_gt = np.linalg.norm((-Rg1.T @ tg1) - (-Rg0.T @ tg0))
    assert abs(span_est / span_gt - 1.0) < 0.12, (span_est, span_gt)
