"""Microbatched tracking (framestep.frame_step_batch / track_batch):
chunks of B frames per device dispatch must track the same trajectory as the
per-frame path (keyframe effects may lag <B frames, so poses agree to a small
tolerance, not bitwise)."""
import numpy as np
import pytest

from ygz_tpu.geometry import camera as cam_mod
from ygz_tpu.frontend.tracker import MonoTracker, TrackerConfig, State

from synthetic import SmoothScene
from test_vo_e2e import make_trajectory

N_FRAMES = 32


@pytest.fixture(scope="module")
def scene_frames():
    scene = SmoothScene(seed=11)
    cam = cam_mod.Camera.make(scene.f, scene.f, scene.cx, scene.cy,
                              scene.w, scene.h)
    poses = make_trajectory(N_FRAMES)
    frames = [np.asarray(scene.render(R, t)) for R, t in poses]
    return cam, poses, frames


def _run(cam, frames, batch):
    tr = MonoTracker(cam, TrackerConfig(track_batch=batch))
    if batch > 1:
        results = tr.track_batch(frames, [i * 0.05 for i in range(len(frames))])
    else:
        results = [tr.track(f, ts=i * 0.05) for i, f in enumerate(frames)]
    return tr, results


def _centers(results):
    cs = []
    for st, R, t in results:
        if st == State.OK:
            cs.append(-np.asarray(R).T @ np.asarray(t))
    return np.asarray(cs)


def test_batch_matches_per_frame(scene_frames):
    cam, poses, frames = scene_frames
    tr1, res1 = _run(cam, frames, batch=1)
    tr8, res8 = _run(cam, frames, batch=8)
    assert tr1.state == State.OK and tr8.state == State.OK
    ok1 = sum(1 for st, _, _ in res1 if st == State.OK)
    ok8 = sum(1 for st, _, _ in res8 if st == State.OK)
    assert ok8 >= ok1 - 2, f"batch path lost frames: {ok8} vs {ok1}"

    c1, c8 = _centers(res1), _centers(res8)
    m = min(len(c1), len(c8))
    # same monocular scale gauge (init is identical); centers should agree
    # to within a small fraction of the trajectory span
    span = np.linalg.norm(c1[-1] - c1[0])
    err = np.linalg.norm(c1[:m] - c8[:m], axis=1).max()
    assert err < 0.15 * span + 1e-3, f"batch/per-frame divergence {err} (span {span})"


def test_batch_accuracy_vs_gt(scene_frames):
    """The batch path must stay metrically accurate against ground truth
    after 7-DoF alignment (same bound family as the per-frame e2e test)."""
    from ygz_tpu.eval.ate import ate_rmse

    cam, poses, frames = scene_frames
    tr8, res8 = _run(cam, frames, batch=8)
    est, gt = [], []
    for (st, R, t), (Rg, tg) in zip(res8, poses):
        if st != State.OK:
            continue
        est.append(-np.asarray(R).T @ np.asarray(t))
        gt.append(-Rg.T @ tg)
    rmse, _ = ate_rmse(np.asarray(est), np.asarray(gt), with_scale=True)
    assert rmse < 0.02, f"batch-mode ATE {rmse}"
