"""Mono-inertial E2E: visual bootstrap -> VINS init recovers metric scale ->
IMU-fused tracking (the reference's mono_euroc_vins pipeline)."""
import numpy as np
import jax.numpy as jnp
import pytest

from ygz_tpu.geometry import camera as cam_mod, lie
from ygz_tpu.system import System, Sensor

from synthetic import SmoothScene

G_W = np.array([0.0, -9.81, 0.0], np.float32)  # world gravity (vision frame)
FPS = 20.0
IMU_HZ = 200.0


def _rodrigues64(w):
    """float64 SO3 exp (synthesis must not lose precision to float32)."""
    th = np.linalg.norm(w)
    if th < 1e-12:
        return np.eye(3)
    k = w / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def _log64(R):
    c = np.clip((np.trace(R) - 1) / 2, -1, 1)
    th = np.arccos(c)
    if th < 1e-10:
        return np.zeros(3)
    v = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    return v * th / (2 * np.sin(th))


def _angles(t):
    return np.array([0.015 * np.sin(1.8 * t + 1.0), 0.03 * np.sin(3.0 * t),
                     0.0])


def _centre(t):
    return np.array([0.6 * t, 0.15 * np.sin(2.0 * t), 0.0])


def _accel(t):
    return np.array([0.0, -0.6 * np.sin(2.0 * t), 0.0])  # exact c''(t)


def _R_cw64(t):
    return _rodrigues64(_angles(t))


def pose_fn(t):
    """Continuous camera trajectory (world->cam R, t)."""
    R = _R_cw64(t)
    c = _centre(t)
    return R.astype(np.float32), (-R @ c).astype(np.float32)


def synth_imu(t0, t1):
    """IMU samples in (t0, t1]: analytic accelerations, float64 rotation
    rates (float32 double-differencing would add ~100 m/s^2 of noise)."""
    eps = 1e-6
    out = []
    n = int(round((t1 - t0) * IMU_HZ))
    for k in range(1, n + 1):
        t = t0 + k / IMU_HZ
        # body == camera (Tbc = I): R_wb = R_cw^T
        Rwb_m = _R_cw64(t - eps).T
        Rwb_p = _R_cw64(t + eps).T
        omega = _log64(Rwb_m.T @ Rwb_p) / (2 * eps)
        acc_body = _R_cw64(t) @ (_accel(t) - G_W)
        out.append((t, omega.astype(np.float32), acc_body.astype(np.float32)))
    return out


@pytest.mark.slow
def test_mono_vi_recovers_metric_scale():
    scene = SmoothScene(seed=11)
    cam = cam_mod.Camera.make(scene.f, scene.f, scene.cx, scene.cy,
                              scene.w, scene.h)
    from ygz_tpu.frontend.tracker import TrackerConfig
    sys = System(cam, Sensor.MONO_VI, config=TrackerConfig(kf_max_gap=8),
                 vins_init_kfs=6, vins_init_time=1.2)

    n_frames = 70
    states = []
    ready_at = None
    for i in range(n_frames):
        t = i / FPS
        R, tt = pose_fn(t)
        img = scene.render(R, tt)
        imu = synth_imu((i - 1) / FPS, t) if i > 0 else []
        state, T = sys.track_mono_vi(img, imu, timestamp=t)
        states.append(state)
        if ready_at is None and sys.tracker.vio_ready:
            ready_at = i

    assert states[-1] == "OK", states[-10:]
    assert sum(s == "OK" for s in states) > 0.8 * n_frames
    assert ready_at is not None, "VINS initialization never succeeded"

    # after VINS init the trajectory must be METRIC: compare spans without
    # scale alignment over the post-init segment
    recs = sys.trajectory
    post = [(r, i) for i, r in enumerate(recs)
            if i > ready_at + 2 and r.state == "OK"]
    assert len(post) > 20
    (r0, i0), (r1, i1) = post[0], post[-1]
    c0 = -r0.R.T @ r0.t
    c1 = -r1.R.T @ r1.t
    Rg0, tg0 = pose_fn(i0 / FPS)
    Rg1, tg1 = pose_fn(i1 / FPS)
    g0 = -Rg0.T @ tg0
    g1 = -Rg1.T @ tg1
    span_est = np.linalg.norm(c1 - c0)
    span_gt = np.linalg.norm(g1 - g0)
    assert abs(span_est / span_gt - 1.0) < 0.12, \
        f"metric scale off: est {span_est:.3f} vs gt {span_gt:.3f}"

    # gravity direction recovered (tilt vs accel-bias is weakly observable
    # on this short low-excitation trajectory; ~7 deg is expected)
    g_est = sys.tracker.gravity_w
    cosg = np.dot(g_est, G_W) / (np.linalg.norm(g_est) * 9.81)
    assert cosg > 0.985, g_est


@pytest.mark.slow
def test_post_vins_init_full_chain_gba(monkeypatch):
    """The post-VINS-init consistency pass must optimize the WHOLE keyframe
    chain (reference GlobalBundleAdjustmentNavState over every KF,
    src/LocalMapping.cc:615-713), not just the W=10 window: with >10 KFs at
    init time, a NavState BA call with W >= chain length must run and the
    pre-window KFs' rotations must receive corrections beyond the pure
    scale change (rescale never touches rotations)."""
    from ygz_tpu.frontend import vi_tracker as vt

    scene = SmoothScene(seed=11)
    cam = cam_mod.Camera.make(scene.f, scene.f, scene.cx, scene.cy,
                              scene.w, scene.h)
    from ygz_tpu.frontend.tracker import TrackerConfig
    sys = System(cam, Sensor.MONO_VI,
                 config=TrackerConfig(kf_max_gap=4, kf_min_gap=2),
                 vins_init_kfs=13, vins_init_time=2.0)
    tr = sys.tracker

    calls = []
    real = vt.MonoViTracker._navstate_ba

    def spy(self, smap, kf, chain, W, iters=8):
        calls.append((list(chain), W))
        return real(self, smap, kf, chain, W, iters=iters)

    monkeypatch.setattr(vt.MonoViTracker, "_navstate_ba", spy)

    pre_R = None
    ready_at = None
    for i in range(90):
        t = i / FPS
        R, tt = pose_fn(t)
        img = scene.render(R, tt)
        imu = synth_imu((i - 1) / FPS, t) if i > 0 else []
        if not tr.vio_ready:
            pre_R = tr.map.kf_R[: tr.map.n_kf].copy()
            pre_order = list(tr._kf_order)
        sys.track_mono_vi(img, imu, timestamp=t)
        if ready_at is None and tr.vio_ready:
            ready_at = i
            break
    assert ready_at is not None, "VINS init never fired"

    # a full-chain call happened: its W covers a chain longer than W_CAP
    full = [(c, W) for c, W in calls if len(c) > vt.MonoViTracker.W_CAP
            and W >= len(c)]
    assert full, f"no full-chain NavState GBA ran; calls={[(len(c), W) for c, W in calls]}"
    chain, W = full[0]
    assert len(chain) >= 12

    # pre-window KFs (older than the last W_CAP) moved in ROTATION — the
    # metric rescale only scales translations, so any rotation delta comes
    # from the joint NavState GBA
    early = [k for k in chain[1: -vt.MonoViTracker.W_CAP]
             if k < len(pre_R)]
    assert early, "chain too short to have pre-window KFs"
    moved = sum(
        not np.allclose(tr.map.kf_R[k], pre_R[k], atol=1e-7)
        for k in early)
    assert moved >= 1, "pre-window keyframes untouched by post-init GBA"
