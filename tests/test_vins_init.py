"""VINS initialization on an analytic trajectory with exact IMU synthesis."""
import numpy as np
import jax.numpy as jnp

from ygz_tpu.geometry import lie
from ygz_tpu.imu.preintegration import preintegrate
from ygz_tpu.imu.vins_init import vins_initialize

G_W = np.array([0.0, 0.0, -9.81])


def make_trajectory_imu(T=3.0, dt=0.005, seed=0):
    """Smooth sinusoid trajectory; IMU synthesized by finite differences."""
    ts = np.arange(0.0, T, dt)
    A = np.array([0.6, 0.4, 0.3])
    w = np.array([2.1, 1.6, 2.7])
    ph = np.array([0.0, 1.0, 2.0])

    def pos(t):
        return A * np.sin(w * t + ph)

    def rot(t):
        return np.asarray(lie.so3_exp(jnp.asarray(np.array(
            [0.25 * np.sin(1.3 * t), 0.2 * np.sin(0.9 * t + 0.5),
             0.3 * np.sin(1.1 * t)], np.float32))))

    # analytic derivatives by central differences at fine step
    eps = 1e-5

    def vel(t):
        return (pos(t + eps) - pos(t - eps)) / (2 * eps)

    def acc_w(t):
        return (vel(t + eps) - vel(t - eps)) / (2 * eps)

    def omega_body(t):
        R0 = rot(t - eps)
        R1 = rot(t + eps)
        return np.asarray(lie.so3_log(jnp.asarray(
            (R0.T @ R1).astype(np.float32)))) / (2 * eps)

    omegas = np.stack([omega_body(t + dt / 2) for t in ts])
    accs = np.stack([rot(t + dt / 2).T @ (acc_w(t + dt / 2) - G_W)
                     for t in ts])
    return ts, pos, rot, omegas.astype(np.float32), accs.astype(np.float32)


def test_vins_init_recovers_scale_gravity_biases():
    dt = 0.005
    ts, pos, rot, omegas, accs = make_trajectory_imu(T=3.0, dt=dt)
    bg_true = np.array([0.02, -0.015, 0.01], np.float32)
    ba_true = np.array([0.05, -0.03, 0.08], np.float32)
    omegas_m = omegas + bg_true
    accs_m = accs + ba_true

    # keyframes every 0.25 s
    kf_every = int(0.25 / dt)
    kf_idx = list(range(0, len(ts), kf_every))
    K = len(kf_idx)

    # body<->camera extrinsic (nontrivial)
    Rbc = np.asarray(lie.so3_exp(jnp.asarray(
        np.array([0.1, -0.2, 0.15], np.float32))))
    tbc = np.array([0.03, -0.06, 0.01], np.float32)
    Tbc = np.eye(4, dtype=np.float32)
    Tbc[:3, :3] = Rbc
    Tbc[:3, 3] = tbc

    s_true = 4.2  # metric = s_true * vision units

    R_wc, c_vis = [], []
    for i in kf_idx:
        R_wb = rot(ts[i])
        p_wb = pos(ts[i])
        R = R_wb @ Rbc
        p_wc = p_wb + R_wb @ tbc
        R_wc.append(R.astype(np.float32))
        c_vis.append((p_wc / s_true).astype(np.float32))

    def make_preints(bg):
        out = []
        for a, b in zip(kf_idx[:-1], kf_idx[1:]):
            n = b - a
            cap = 64
            om = np.zeros((cap, 3), np.float32)
            ac = np.zeros((cap, 3), np.float32)
            dts = np.zeros(cap, np.float32)
            valid = np.zeros(cap, bool)
            om[:n] = omegas_m[a:b]
            ac[:n] = accs_m[a:b]
            dts[:n] = dt
            valid[:n] = True
            out.append(preintegrate(jnp.asarray(om), jnp.asarray(ac),
                                    jnp.asarray(dts), jnp.asarray(valid),
                                    jnp.asarray(bg), jnp.zeros(3)))
        return out

    res = vins_initialize(np.stack(c_vis), R_wc, make_preints(np.zeros(3)),
                          lambda bg: make_preints(jnp.asarray(bg)), Tbc)
    assert res.ok
    np.testing.assert_allclose(res.bg, bg_true, atol=2e-3)
    assert abs(res.scale / s_true - 1.0) < 0.03, res.scale
    # gravity in the vision world frame equals G_W (world == metric frame)
    np.testing.assert_allclose(res.gravity_w, G_W, atol=0.15)
    np.testing.assert_allclose(res.ba, ba_true, atol=0.05)
