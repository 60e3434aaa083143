"""Connection failover (utils/link.py + MonoTracker.reconnect): the tracker
must survive a mid-run device-client swap — the mitigation for tunneled
accelerators whose per-connection dispatch RTT degrades permanently
(PERF_r04.md) — and keep tracking the same trajectory afterwards.

On CPU the swap exercises the full mechanism (new PJRT client, cleared jit
caches, device-state rebuild from host mirrors); only the latency motive is
TPU-specific.
"""
import numpy as np

from ygz_tpu.geometry import camera as cam_mod
from ygz_tpu.frontend.tracker import MonoTracker, TrackerConfig, State

from synthetic import SmoothScene
from test_vo_e2e import make_trajectory

N_FRAMES = 48


def _centers(results):
    return np.asarray([-np.asarray(R).T @ np.asarray(t)
                       for st, R, t in results if st == State.OK])


def test_reconnect_mid_run():
    scene = SmoothScene(seed=11)
    cam = cam_mod.Camera.make(scene.f, scene.f, scene.cx, scene.cy,
                              scene.w, scene.h)
    poses = make_trajectory(N_FRAMES)
    frames = [np.asarray(scene.render(R, t)) for R, t in poses]
    ts = [i * 0.05 for i in range(N_FRAMES)]

    # continuous run (no swap) as the accuracy yardstick
    ref = MonoTracker(cam, TrackerConfig(track_batch=8))
    res_ref = ref.track_batch(frames, ts)
    assert ref.state == State.OK

    tr = MonoTracker(cam, TrackerConfig(track_batch=8))
    half = N_FRAMES // 2
    res = tr.track_batch(frames[:half], ts[:half])
    assert tr.state == State.OK
    n_kf_before = tr.map.n_kf

    dt = tr.reconnect()
    assert dt >= 0.0
    assert tr.timer.count["reconnect"] == 1
    # carry must be live again: a device array, not None
    assert tr._carry is not None

    res += tr.track_batch(frames[half:], ts[half:])
    assert tr.state == State.OK, "tracking lost after reconnect"
    ok_ref = sum(1 for st, _, _ in res_ref if st == State.OK)
    ok = sum(1 for st, _, _ in res if st == State.OK)
    assert ok >= ok_ref - 3, f"reconnect lost frames: {ok} vs {ok_ref}"
    assert tr.map.n_kf >= n_kf_before, "map lost keyframes in reconnect"

    c_ref, c = _centers(res_ref), _centers(res)
    m = min(len(c_ref), len(c))
    span = np.linalg.norm(c_ref[-1] - c_ref[0])
    err = np.linalg.norm(c_ref[:m] - c[:m], axis=1).max()
    assert err < 0.15 * span + 1e-3, \
        f"post-reconnect divergence {err} (span {span})"


def test_reconnect_async_mapping():
    """The swap must also be safe with the async mapping worker running
    (it drains the queue first, then rebuilds the published snapshot)."""
    scene = SmoothScene(seed=5)
    cam = cam_mod.Camera.make(scene.f, scene.f, scene.cx, scene.cy,
                              scene.w, scene.h)
    poses = make_trajectory(N_FRAMES)
    frames = [np.asarray(scene.render(R, t)) for R, t in poses]
    ts = [i * 0.05 for i in range(N_FRAMES)]

    tr = MonoTracker(cam, TrackerConfig(track_batch=8, async_mapping=True))
    half = N_FRAMES // 2
    res = tr.track_batch(frames[:half], ts[:half])
    tr.reconnect()
    res += tr.track_batch(frames[half:], ts[half:])
    tr.wait_mapping_idle()
    assert tr.state == State.OK
    ok = sum(1 for st, _, _ in res if st == State.OK)
    assert ok >= N_FRAMES - 8
