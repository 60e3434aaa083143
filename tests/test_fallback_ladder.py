"""Feature-method tracking fallback ladder (reference Tracking.cc:473-476,
563-577): when direct tracking fails, the tracker escalates to
TrackWithMotionModel -> TrackReferenceKeyFrame -> feature TrackLocalMap
instead of going LOST."""
import numpy as np
import pytest

from ygz_tpu.geometry import camera as cam_mod, lie
from ygz_tpu.frontend.tracker import MonoTracker, TrackerConfig, State

from synthetic import SmoothScene
from test_vo_e2e import make_trajectory

import jax.numpy as jnp


@pytest.fixture(scope="module")
def tracked():
    """A tracker with a mature map after 14 frames, plus the scene/poses."""
    scene = SmoothScene(seed=11)
    cam = cam_mod.Camera.make(scene.f, scene.f, scene.cx, scene.cy,
                              scene.w, scene.h)
    poses = make_trajectory(40)
    tr = MonoTracker(cam, TrackerConfig(kf_max_gap=4))
    for i in range(14):
        R, t = poses[i]
        state, _, _ = tr.track(scene.render(R, t), ts=i * 0.05)
    assert tr.state == State.OK
    return tr, scene, poses


def _map_scale(tr, scene, poses):
    """Recover the mono map scale from the last logged pose vs ground truth
    (scale ~ 1/median-depth after init normalization)."""
    smap = tr.map
    ids = np.nonzero(smap.pt_valid[: smap.n_pt])[0]
    return float(np.median(smap.pt_xyz[ids, 2])) / 5.0


def _scaled_gt(tr, scene, poses, i):
    R, t = poses[i]
    s = _map_scale(tr, scene, poses)
    return R, t * s


def _center_err(R_est, t_est, R_gt, t_gt):
    c_est = -R_est.T @ t_est
    c_gt = -R_gt.T @ t_gt
    return np.linalg.norm(c_est - c_gt)


@pytest.mark.slow
def test_motion_model_recovers_from_bad_prediction(tracked):
    tr, scene, poses = tracked
    i = 14
    R_gt, t_gt = _scaled_gt(tr, scene, poses, i)
    pyr = tr._build_pyramid(scene.render(*poses[i]))
    f = tr._feats_to_dict(tr.extractor(pyr))
    # prediction off by a yaw + lateral shift (beyond the KLT basin but
    # inside the widened 30 px projection window)
    dR = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.02, 0.0])))
    R_pred = dR @ R_gt
    t_pred = t_gt + np.array([0.02, 0.0, 0.0], np.float32)
    pose = tr._track_with_motion_model(f, R_pred.astype(np.float32), t_pred)
    assert pose is not None, "motion-model fallback failed to match"
    err = _center_err(pose[0], pose[1], R_gt, t_gt)
    assert err < 0.01, f"motion-model pose error {err}"


@pytest.mark.slow
def test_reference_keyframe_tracking(tracked):
    tr, scene, poses = tracked
    i = 13  # near the last keyframe
    R_gt, t_gt = _scaled_gt(tr, scene, poses, i)
    pyr = tr._build_pyramid(scene.render(*poses[i]))
    f = tr._feats_to_dict(tr.extractor(pyr))
    pose = tr._track_reference_keyframe(f)
    assert pose is not None, "ref-KF fallback failed to match"
    err = _center_err(pose[0], pose[1], R_gt, t_gt)
    assert err < 0.01, f"ref-KF pose error {err}"


@pytest.mark.slow
def test_ladder_survives_direct_failure(tracked, monkeypatch):
    """Force the direct tracker to report zero inliers: the frame must still
    track OK through the feature ladder (and NOT reset, even though the
    prediction is the plain velocity model)."""
    import ygz_tpu.frontend.tracker as tracker_mod
    from ygz_tpu.frontend.framestep import N_SCALARS
    tr, scene, poses = tracked
    i = 15
    real = tracker_mod.frame_step
    cap = tr.cfg.max_track

    def broken(*a, **kw):
        # the direct tracker runs inside the fused frame_step; zero its
        # packed inlier report (n_inliers scalar + tracked block) so the
        # host sees a direct-tracking failure
        carry, packed = real(*a, **kw)
        packed = packed.at[N_SCALARS - 1].set(0.0)
        packed = packed.at[N_SCALARS: N_SCALARS + cap].set(0.0)
        return carry, packed

    monkeypatch.setattr(tracker_mod, "frame_step", broken)
    state, R, t = tr.track(scene.render(*poses[i]), ts=i * 0.05)
    monkeypatch.undo()
    assert state == State.OK, "ladder did not rescue direct-tracking failure"
    assert tr.debug.get("fb_localmap"), tr.debug
    R_gt, t_gt = _scaled_gt(tr, scene, poses, i)
    err = _center_err(R, t, R_gt, t_gt)
    assert err < 0.01, f"ladder pose error {err}"
    # and the next (normal) frame keeps tracking directly
    state, _, _ = tr.track(scene.render(*poses[i + 1]), ts=(i + 1) * 0.05)
    assert state == State.OK
