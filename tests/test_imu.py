"""IMU preintegration golden tests (SURVEY.md §4: preintegration vs
closed-form on synthetic motion; bias Jacobians vs finite differences)."""
import numpy as np
import jax
import jax.numpy as jnp

from ygz_tpu.imu.preintegration import preintegrate, predict_navstate
from ygz_tpu.imu.navstate import NavState
from ygz_tpu.geometry import lie

G = np.array([0.0, 0.0, -9.81], np.float32)


def make_window(omega_fn, acc_fn, n=200, dt=0.005, pad_to=256):
    ts = np.arange(n) * dt
    omega = np.stack([omega_fn(t) for t in ts]).astype(np.float32)
    acc = np.stack([acc_fn(t) for t in ts]).astype(np.float32)
    pad = pad_to - n
    omega = np.pad(omega, ((0, pad), (0, 0)))
    acc = np.pad(acc, ((0, pad), (0, 0)))
    dts = np.array([dt] * n + [0.0] * pad, np.float32)
    valid = np.array([True] * n + [False] * pad)
    return omega, acc, dts, valid


class TestPreintegration:
    def test_static_body_gravity_only(self):
        # body at rest, IMU measures -g in body frame (R = I)
        omega, acc, dts, valid = make_window(
            lambda t: np.zeros(3), lambda t: -G)
        st = preintegrate(jnp.asarray(omega), jnp.asarray(acc),
                          jnp.asarray(dts), jnp.asarray(valid),
                          jnp.zeros(3), jnp.zeros(3))
        T = float(st.dt)
        assert abs(T - 1.0) < 1e-5
        # increments contain the measured specific force (=-g): dV = -g*T
        np.testing.assert_allclose(np.asarray(st.dV), -G * T, atol=1e-4)
        np.testing.assert_allclose(np.asarray(st.dP), -G * T * T / 2,
                                   atol=1e-3)
        # predicted state with gravity added back: no motion
        ns = NavState.identity()
        ns2 = predict_navstate(ns, st, jnp.asarray(G))
        np.testing.assert_allclose(np.asarray(ns2.P), 0.0, atol=1e-3)
        np.testing.assert_allclose(np.asarray(ns2.V), 0.0, atol=1e-3)

    def test_constant_rotation(self):
        w = np.array([0.0, 0.0, 0.5], np.float32)  # 0.5 rad/s yaw
        omega, acc, dts, valid = make_window(lambda t: w, lambda t: np.zeros(3))
        st = preintegrate(jnp.asarray(omega), jnp.asarray(acc),
                          jnp.asarray(dts), jnp.asarray(valid),
                          jnp.zeros(3), jnp.zeros(3))
        R_true = np.asarray(lie.so3_exp(jnp.asarray(w * 1.0)))
        np.testing.assert_allclose(np.asarray(st.dR), R_true, atol=1e-4)

    def test_constant_acceleration_with_rotation(self):
        # closed-form check by fine numeric integration
        w = np.array([0.1, -0.2, 0.3], np.float32)
        a_b = np.array([0.5, 0.2, -0.1], np.float32)
        omega, acc, dts, valid = make_window(lambda t: w, lambda t: a_b)
        st = preintegrate(jnp.asarray(omega), jnp.asarray(acc),
                          jnp.asarray(dts), jnp.asarray(valid),
                          jnp.zeros(3), jnp.zeros(3))
        # numeric ground truth at finer step
        dt = 1e-4
        R = np.eye(3)
        V = np.zeros(3)
        P = np.zeros(3)
        for i in range(int(1.0 / dt)):
            P = P + V * dt + 0.5 * (R @ a_b) * dt * dt
            V = V + (R @ a_b) * dt
            R = R @ np.asarray(lie.so3_exp(jnp.asarray(w * dt)))
        np.testing.assert_allclose(np.asarray(st.dV), V, atol=2e-3)
        np.testing.assert_allclose(np.asarray(st.dP), P, atol=2e-3)
        np.testing.assert_allclose(np.asarray(st.dR), R, atol=1e-3)

    def test_bias_jacobians_match_finite_differences(self):
        rng = np.random.default_rng(0)
        omega, acc, dts, valid = make_window(
            lambda t: np.array([0.2 * np.sin(t), 0.1, -0.15 * np.cos(t)]),
            lambda t: np.array([0.3, -0.2 * np.sin(t), 9.5]))

        def run(bg, ba):
            return preintegrate(jnp.asarray(omega), jnp.asarray(acc),
                                jnp.asarray(dts), jnp.asarray(valid),
                                jnp.asarray(bg), jnp.asarray(ba))

        # NOTE: the analytic recursion (same formulation as the reference's
        # IMUPreintegrator) is first-order in the bias perturbation; finite
        # differences include second-order terms, so tolerances are loose.
        st0 = run(np.zeros(3, np.float32), np.zeros(3, np.float32))
        eps = 1e-4
        for k in range(3):
            dbg = np.zeros(3, np.float32)
            dbg[k] = eps
            st1 = run(dbg, np.zeros(3, np.float32))
            # dP/dbg
            fd = (np.asarray(st1.dP) - np.asarray(st0.dP)) / eps
            np.testing.assert_allclose(np.asarray(st0.J_P_bg)[:, k], fd,
                                       atol=5e-2, rtol=2e-1)
            fdV = (np.asarray(st1.dV) - np.asarray(st0.dV)) / eps
            np.testing.assert_allclose(np.asarray(st0.J_V_bg)[:, k], fdV,
                                       atol=5e-2, rtol=2e-1)
            # dR/dbg via log(dR0^T dR1) ~= J_R_bg * eps_k
            dRrel = np.asarray(st0.dR).T @ np.asarray(st1.dR)
            fdR = np.asarray(lie.so3_log(jnp.asarray(dRrel))) / eps
            np.testing.assert_allclose(np.asarray(st0.J_R_bg)[:, k], fdR,
                                       atol=5e-2, rtol=2e-1)

            dba = np.zeros(3, np.float32)
            dba[k] = eps
            st2 = run(np.zeros(3, np.float32), dba)
            fdPa = (np.asarray(st2.dP) - np.asarray(st0.dP)) / eps
            np.testing.assert_allclose(np.asarray(st0.J_P_ba)[:, k], fdPa,
                                       atol=5e-2, rtol=2e-1)
            fdVa = (np.asarray(st2.dV) - np.asarray(st0.dV)) / eps
            np.testing.assert_allclose(np.asarray(st0.J_V_ba)[:, k], fdVa,
                                       atol=5e-2, rtol=2e-1)

    def test_covariance_grows_and_is_psd(self):
        omega, acc, dts, valid = make_window(
            lambda t: np.array([0.1, 0.0, 0.2]),
            lambda t: np.array([0.0, 0.0, 9.8]))
        st = preintegrate(jnp.asarray(omega), jnp.asarray(acc),
                          jnp.asarray(dts), jnp.asarray(valid),
                          jnp.zeros(3), jnp.zeros(3))
        cov = np.asarray(st.cov)
        np.testing.assert_allclose(cov, cov.T, atol=1e-8)
        ev = np.linalg.eigvalsh(cov)
        assert ev.min() > -1e-8
        assert ev.max() > 0.0
