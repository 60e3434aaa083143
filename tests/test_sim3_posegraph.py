"""Tests: Sim3 ops, Horn/RANSAC solver, essential-graph optimization."""
import numpy as np
import jax
import jax.numpy as jnp

from ygz_tpu.geometry import sim3, lie
from ygz_tpu.backend.posegraph import optimize_pose_graph


def rand_sim3(rng, rot=0.5, trans=1.0, ds=0.3):
    R = np.asarray(lie.so3_exp(jnp.asarray(
        rng.standard_normal(3).astype(np.float32) * rot)))
    t = rng.standard_normal(3).astype(np.float32) * trans
    s = float(np.exp(rng.uniform(-ds, ds)))
    return R, t, s


class TestSim3Ops:
    def test_mul_inv_apply(self):
        rng = np.random.default_rng(0)
        Ra, ta, sa = rand_sim3(rng)
        Rb, tb, sb = rand_sim3(rng)
        X = rng.standard_normal((10, 3)).astype(np.float32)
        lhs = sim3.sim3_apply(*sim3.sim3_mul(jnp.asarray(Ra), jnp.asarray(ta),
                                             sa, jnp.asarray(Rb),
                                             jnp.asarray(tb), sb),
                              jnp.asarray(X))
        rhs = sim3.sim3_apply(jnp.asarray(Ra), jnp.asarray(ta), sa,
                              sim3.sim3_apply(jnp.asarray(Rb), jnp.asarray(tb),
                                              sb, jnp.asarray(X)))
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)
        Ri, ti, si = sim3.sim3_inv(jnp.asarray(Ra), jnp.asarray(ta), sa)
        back = sim3.sim3_apply(Ri, ti, si,
                               sim3.sim3_apply(jnp.asarray(Ra),
                                               jnp.asarray(ta), sa,
                                               jnp.asarray(X)))
        np.testing.assert_allclose(np.asarray(back), X, atol=1e-4)

    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(1)
        xi = rng.standard_normal(7).astype(np.float32) * 0.3
        R, t, s = sim3.sim3_exp(jnp.asarray(xi))
        xi2 = sim3.sim3_log(R, t, s)
        # rotation and scale are exact; translation is 1st-order consistent
        np.testing.assert_allclose(np.asarray(xi2)[3:], xi[3:], atol=1e-4)
        np.testing.assert_allclose(np.asarray(xi2)[:3], xi[:3], atol=2e-2)


class TestHorn:
    def test_exact_recovery(self):
        rng = np.random.default_rng(2)
        R, t, s = rand_sim3(rng)
        X = rng.standard_normal((40, 3)).astype(np.float32)
        Y = s * (X @ R.T) + t
        Re, te, se = sim3.horn_sim3(jnp.asarray(X), jnp.asarray(Y),
                                    jnp.ones(40, bool))
        np.testing.assert_allclose(np.asarray(Re), R, atol=1e-4)
        np.testing.assert_allclose(np.asarray(te), t, atol=1e-4)
        assert abs(float(se) - s) < 1e-4

    def test_ransac_with_outliers(self):
        rng = np.random.default_rng(3)
        R, t, s = rand_sim3(rng)
        n = 60
        X = rng.standard_normal((n, 3)).astype(np.float32)
        Y = s * (X @ R.T) + t
        Y[:15] += rng.uniform(2, 5, (15, 3)).astype(np.float32)  # outliers
        Re, te, se, inl, ni = sim3.sim3_ransac(
            jnp.asarray(X), jnp.asarray(Y), jnp.ones(n, bool),
            jax.random.PRNGKey(0), num_iters=100, th_b=0.05)
        inl = np.asarray(inl)
        assert not inl[:15].any()
        assert inl[15:].all()
        np.testing.assert_allclose(np.asarray(Re), R, atol=1e-3)
        assert abs(float(se) - s) < 1e-3


class TestPoseGraph:
    def test_loop_correction(self):
        """Chain of 8 KFs with drift; a loop edge 7->0 with the true relative
        pose; optimization should spread the drift along the chain."""
        rng = np.random.default_rng(4)
        K = 8
        # true poses: circle-ish trajectory, scale 1
        true = []
        for k in range(K):
            w = np.array([0.0, 0.0, 0.3 * k], np.float32)
            R = np.asarray(lie.so3_exp(jnp.asarray(w)))
            t = np.array([np.cos(0.3 * k), np.sin(0.3 * k), 0.0], np.float32)
            true.append((R, t, 1.0))

        # measured odometry edges: exact relative sim3 between consecutive
        def rel(a, b):
            # S_ba = S_b * S_a^-1
            Ri, ti, si = sim3.sim3_inv(jnp.asarray(a[0]), jnp.asarray(a[1]),
                                       a[2])
            return sim3.sim3_mul(jnp.asarray(b[0]), jnp.asarray(b[1]), b[2],
                                 Ri, ti, si)

        # drifted initial estimates: accumulate noisy odometry
        est = [true[0]]
        for k in range(1, K):
            Rr, tr_, sr = rel(true[k - 1], true[k])
            dn = rng.standard_normal(7).astype(np.float32) * 0.02
            dn[6] = 0.015  # consistent scale drift
            Rd, td, sd = sim3.sim3_exp(jnp.asarray(dn))
            Rn, tn, sn = sim3.sim3_mul(Rd, td, sd, Rr, tr_, sr)
            prev = est[-1]
            est.append(tuple(np.asarray(x) for x in sim3.sim3_mul(
                Rn, tn, sn, jnp.asarray(prev[0]), jnp.asarray(prev[1]),
                float(prev[2]))))

        # edges: consecutive (from drifted odometry = relative of est) + loop
        E = 32
        ei, ej, eR, et_, es_, ew = [], [], [], [], [], []
        for k in range(1, K):
            Rr, tr_, sr = rel(est[k - 1], est[k])
            ei.append(k - 1)
            ej.append(k)
            eR.append(np.asarray(Rr))
            et_.append(np.asarray(tr_))
            es_.append(float(sr))
            ew.append(1.0)
        # loop edge with TRUE relative pose 0->7
        Rr, tr_, sr = rel(true[0], true[7])
        ei.append(0)
        ej.append(7)
        eR.append(np.asarray(Rr))
        et_.append(np.asarray(tr_))
        es_.append(float(sr))
        ew.append(1.0)
        pad = E - len(ei)
        ei += [0] * pad
        ej += [0] * pad
        eR += [np.eye(3, dtype=np.float32)] * pad
        et_ += [np.zeros(3, np.float32)] * pad
        es_ += [1.0] * pad
        ew += [0.0] * pad

        res = optimize_pose_graph(
            jnp.asarray(np.stack([e[0] for e in est])),
            jnp.asarray(np.stack([e[1] for e in est])),
            jnp.asarray(np.array([e[2] for e in est], np.float32)),
            jnp.asarray(np.array(ei, np.int32)),
            jnp.asarray(np.array(ej, np.int32)),
            jnp.asarray(np.stack(eR)), jnp.asarray(np.stack(et_)),
            jnp.asarray(np.array(es_, np.float32)),
            jnp.asarray(np.array(ew, np.float32)),
            jnp.asarray(np.array([True] + [False] * (K - 1))),
            n_nodes=K, iters=30)

        # the last node must now satisfy the loop constraint w.r.t. node 0
        R7 = np.asarray(res.R[7])
        t7 = np.asarray(res.t[7])
        s7 = float(res.s[7])
        Rt, tt, st = true[7]
        ang = np.degrees(np.arccos(np.clip((np.trace(R7 @ Rt.T) - 1) / 2,
                                           -1, 1)))
        drift_before = np.linalg.norm(np.asarray(est[7][1]) - tt)
        drift_after = np.linalg.norm(t7 - tt)
        assert drift_after < 0.35 * drift_before, (drift_before, drift_after)
        assert abs(s7 - 1.0) < 0.03, s7
        assert ang < 2.0, ang


class TestPoseGraphCG:
    """Matrix-free PCG solver (large essential graphs, beyond the dense
    MAX_PG_NODES threshold)."""

    @staticmethod
    def _chain_problem(K, rng, drift=0.01):
        from ygz_tpu.geometry import sim3 as s3
        true, est = [], []
        for k in range(K):
            w = np.array([0.0, 0.0, 2 * np.pi * k / K], np.float32)
            R = np.asarray(lie.so3_exp(jnp.asarray(w)))
            t = np.array([np.cos(2 * np.pi * k / K),
                          np.sin(2 * np.pi * k / K), 0.0], np.float32)
            true.append((R, t, 1.0))

        def rel(a, b):
            Ri, ti, si = s3.sim3_inv(jnp.asarray(a[0]), jnp.asarray(a[1]),
                                     a[2])
            return s3.sim3_mul(jnp.asarray(b[0]), jnp.asarray(b[1]), b[2],
                               Ri, ti, si)

        est = [true[0]]
        for k in range(1, K):
            Rr, tr_, sr = rel(true[k - 1], true[k])
            dn = rng.standard_normal(7).astype(np.float32) * drift
            Rd, td, sd = s3.sim3_exp(jnp.asarray(dn))
            Rn, tn, sn = s3.sim3_mul(Rd, td, sd, Rr, tr_, sr)
            prev = est[-1]
            est.append(tuple(np.asarray(x) for x in s3.sim3_mul(
                Rn, tn, sn, jnp.asarray(prev[0]), jnp.asarray(prev[1]),
                float(prev[2]))))

        ei, ej, eR, et_, es_, ew = [], [], [], [], [], []
        for k in range(1, K):
            Rr, tr_, sr = rel(est[k - 1], est[k])
            ei.append(k - 1); ej.append(k)
            eR.append(np.asarray(Rr)); et_.append(np.asarray(tr_))
            es_.append(float(sr)); ew.append(1.0)
        Rr, tr_, sr = rel(true[0], true[K - 1])  # true loop edge
        ei.append(0); ej.append(K - 1)
        eR.append(np.asarray(Rr)); et_.append(np.asarray(tr_))
        es_.append(float(sr)); ew.append(5.0)
        args = (jnp.asarray(np.stack([e[0] for e in est])),
                jnp.asarray(np.stack([e[1] for e in est])),
                jnp.asarray(np.array([e[2] for e in est], np.float32)),
                jnp.asarray(np.array(ei, np.int32)),
                jnp.asarray(np.array(ej, np.int32)),
                jnp.asarray(np.stack(eR)), jnp.asarray(np.stack(et_)),
                jnp.asarray(np.array(es_, np.float32)),
                jnp.asarray(np.array(ew, np.float32)),
                jnp.asarray(np.array([True] + [False] * (K - 1))))
        return true, est, args

    def test_cg_matches_dense_small(self):
        from ygz_tpu.backend.posegraph import optimize_pose_graph_cg
        rng = np.random.default_rng(5)
        K = 16
        true, est, args = self._chain_problem(K, rng)
        d = optimize_pose_graph(*args, n_nodes=K, iters=15)
        c = optimize_pose_graph_cg(*args, n_nodes=K, iters=15, cg_iters=80)
        np.testing.assert_allclose(np.asarray(d.t), np.asarray(c.t),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(d.s), np.asarray(c.s),
                                   atol=2e-3)

    def test_cg_large_graph_closes_loop(self):
        from ygz_tpu.backend.posegraph import optimize_pose_graph_cg
        rng = np.random.default_rng(6)
        K = 300  # beyond the dense MAX_PG_NODES threshold
        true, est, args = self._chain_problem(K, rng, drift=0.004)
        res = optimize_pose_graph_cg(*args, n_nodes=K, iters=12, cg_iters=60)
        # drifted end pose error must shrink substantially after closing
        tK = np.asarray(res.t)[K - 1] / np.asarray(res.s)[K - 1]
        err_before = np.linalg.norm(np.asarray(est[K - 1][1]) - true[K - 1][1])
        err_after = np.linalg.norm(tK - true[K - 1][1])
        assert err_after < 0.25 * err_before, (err_before, err_after)
