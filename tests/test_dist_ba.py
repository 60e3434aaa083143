"""Distributed BA on a virtual 8-device CPU mesh: must agree with the
single-device optimizer and actually reduce error (SURVEY.md §4 item d)."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ygz_tpu.parallel.dist_ba import (make_distributed_ba,
                                      partition_obs_by_landmark)
from ygz_tpu.geometry import lie

INTR = (400.0, 400.0, 320.0, 240.0)


def build_problem(seed=0, P=4, L=256, O=2048):
    rng = np.random.default_rng(seed)
    X = np.stack([rng.uniform(-2, 2, L), rng.uniform(-1.5, 1.5, L),
                  rng.uniform(4, 9, L)], 1).astype(np.float32)
    poses = []
    for p in range(P):
        w = rng.standard_normal(3).astype(np.float32) * 0.02
        t = np.array([0.3 * p, 0.0, 0.0], np.float32)
        poses.append((np.asarray(lie.so3_exp(jnp.asarray(w))), t))

    obs_p, obs_l, obs_uv = [], [], []
    for p, (R, t) in enumerate(poses):
        Xc = X @ R.T + t
        uv = np.stack([INTR[0] * Xc[:, 0] / Xc[:, 2] + INTR[2],
                       INTR[1] * Xc[:, 1] / Xc[:, 2] + INTR[3]], 1)
        uv += rng.standard_normal(uv.shape).astype(np.float32) * 0.3
        inb = ((uv > 10).all(1) & (uv < [630, 470]).all(1))
        for l in np.nonzero(inb)[0]:
            obs_p.append(p)
            obs_l.append(l)
            obs_uv.append(uv[l])
    n = len(obs_p)
    assert n <= O, n
    pad = O - n
    obs_p = np.array(obs_p + [0] * pad, np.int32)
    obs_l = np.array(obs_l + [0] * pad, np.int32)
    obs_uv = np.array(obs_uv + [[0, 0]] * pad, np.float32)
    obs_w = np.array([1.0] * n + [0.0] * pad, np.float32)
    return poses, X, obs_p, obs_l, obs_uv, obs_w


def test_distributed_ba_converges_and_matches_mesh_sizes():
    P, L, O = 4, 256, 2048
    poses, X, obs_p, obs_l, obs_uv, obs_w = build_problem(P=P, L=L, O=O)
    rng = np.random.default_rng(1)

    # perturb everything except two anchors
    kf_R, kf_t = [], []
    for p, (R, t) in enumerate(poses):
        if p < 2:
            kf_R.append(R)
            kf_t.append(t)
        else:
            dw = rng.standard_normal(3).astype(np.float32) * 0.01
            dt = rng.standard_normal(3).astype(np.float32) * 0.03
            kf_R.append(np.asarray(lie.so3_exp(jnp.asarray(dw))) @ R)
            kf_t.append(t + dt)
    Xp = X + rng.standard_normal(X.shape).astype(np.float32) * 0.05
    free = np.array([False, False] + [True] * (P - 2))

    results = []
    for n_dev in (1, 8):
        devs = np.array(jax.devices()[:n_dev])
        mesh = Mesh(devs, ("obs",))
        ba = make_distributed_ba(mesh, n_poses=P, n_points=L, iters=12)
        op, ol, ouv, our, ow, _ = partition_obs_by_landmark(
            obs_p, obs_l, obs_uv, obs_w, L, n_dev)
        res = ba(jnp.asarray(np.stack(kf_R)), jnp.asarray(np.stack(kf_t)),
                 jnp.asarray(free), jnp.asarray(Xp), jnp.ones(L, bool),
                 jnp.asarray(op), jnp.asarray(ol), jnp.asarray(ouv),
                 jnp.asarray(our), jnp.asarray(ow), INTR, np.float32(0.0))
        results.append(jax.tree.map(np.asarray, res))

    # 1-device and 8-device results must agree (same math, psum-reduced)
    np.testing.assert_allclose(results[0].kf_t, results[1].kf_t, atol=2e-3)
    np.testing.assert_allclose(results[0].points, results[1].points, atol=2e-2)

    # and the optimization must actually have recovered the poses
    for p in range(2, P):
        R_true, t_true = poses[p]
        R_est = results[1].kf_R[p]
        t_est = results[1].kf_t[p]
        ang = np.degrees(np.arccos(np.clip(
            (np.trace(R_est @ R_true.T) - 1) / 2, -1, 1)))
        assert ang < 0.1, f"pose {p} rot err {ang}"
        assert np.linalg.norm(t_est - t_true) < 0.01
    err0 = np.linalg.norm(Xp - X, axis=1).mean()
    err1 = np.linalg.norm(results[1].points - X, axis=1).mean()
    assert err1 < 0.6 * err0


def test_mapper_global_ba_distributed_matches_single():
    """LocalMapper.global_ba with a mesh (observation-sharded dist BA) agrees
    with the single-device path on the same map."""
    import copy
    from ygz_tpu.backend.mapstate import SlamMap
    from ygz_tpu.backend.mapping import LocalMapper
    from ygz_tpu.geometry import camera as cam_mod

    rng = np.random.default_rng(4)
    cam = cam_mod.Camera.make(*INTR, 640, 480)
    P, L = 5, 300
    X = np.stack([rng.uniform(-2, 2, L), rng.uniform(-1.5, 1.5, L),
                  rng.uniform(4, 9, L)], 1).astype(np.float32)

    def build_map():
        smap = SlamMap(max_kf=8, max_pt=1024, max_feat=512)
        ids = smap.alloc_points(L)
        smap.pt_xyz[ids] = X + rng.normal(0, 0.02, X.shape)
        smap.pt_valid[ids] = True
        for p in range(P):
            w = rng.standard_normal(3).astype(np.float32) * 0.0
            R = np.eye(3, dtype=np.float32)
            t = np.array([0.25 * p, 0, 0], np.float32)
            Xc = X @ R.T + t
            uv = np.stack([INTR[0] * Xc[:, 0] / Xc[:, 2] + INTR[2],
                           INTR[1] * Xc[:, 1] / Xc[:, 2] + INTR[3]], 1)
            uv = (uv + rng.normal(0, 0.3, uv.shape)).astype(np.float32)
            inb = ((uv > 10).all(1) & (uv < [630, 470]).all(1))
            feats = {"uv": uv, "level": np.zeros(L, np.int32),
                     "angle": np.zeros(L, np.float32),
                     "desc": np.zeros((L, 256), np.uint8), "valid": inb}
            # perturbed poses (except the anchor)
            tp = t + (rng.normal(0, 0.02, 3) if p else 0)
            smap.add_keyframe(R, tp.astype(np.float32), feats)
            smap.bind(P - 1 if False else p, np.nonzero(inb)[0],
                      ids[np.nonzero(inb)[0]])
        return smap

    rng = np.random.default_rng(4)
    m1 = build_map()
    rng = np.random.default_rng(4)
    m2 = build_map()

    single = LocalMapper(cam)
    mesh = Mesh(np.array(jax.devices()), ("obs",))
    dist = LocalMapper(cam, mesh=mesh)
    single.global_ba(m1)
    dist.global_ba(m2)

    # both must land near the true geometry
    for m in (m1, m2):
        err_t = np.linalg.norm(
            m.kf_t[:P] - np.stack([[0.25 * p, 0, 0] for p in range(P)]),
            axis=1)
        assert err_t.max() < 0.01, err_t
    np.testing.assert_allclose(m1.kf_t[:P], m2.kf_t[:P], atol=2e-3)
    np.testing.assert_allclose(m1.pt_xyz[:L], m2.pt_xyz[:L], atol=2e-2)


def test_dist_ba_outlier_gating_and_stereo_rows():
    """VERDICT r3 #9: the sharded solver must (a) drop chi2-outlier
    observations between phases like the reference LocalBundleAdjustment
    (src/Optimizer.cc:1990-2060) and (b) carry stereo 3-row edges, so
    --devices N matches the single-device optimizer's model."""
    rng = np.random.default_rng(3)
    P, L, O = 4, 64, 1024
    bf = 40.0
    X = np.stack([rng.uniform(-2, 2, L), rng.uniform(-1.5, 1.5, L),
                  rng.uniform(4, 9, L)], 1).astype(np.float32)
    poses = []
    for p in range(P):
        w = rng.standard_normal(3).astype(np.float32) * 0.02
        t = np.array([0.3 * p, 0.0, 0.0], np.float32)
        poses.append((np.asarray(lie.so3_exp(jnp.asarray(w))), t))
    obs_p, obs_l, obs_uv, obs_ur = [], [], [], []
    for p, (R, t) in enumerate(poses):
        Xc = X @ R.T + t
        uv = np.stack([INTR[0] * Xc[:, 0] / Xc[:, 2] + INTR[2],
                       INTR[1] * Xc[:, 1] / Xc[:, 2] + INTR[3]], 1)
        uv += rng.standard_normal(uv.shape).astype(np.float32) * 0.2
        ur = uv[:, 0] - bf / Xc[:, 2]
        inb = ((uv > 10).all(1) & (uv < [630, 470]).all(1))
        for li in np.nonzero(inb)[0]:
            obs_p.append(p)
            obs_l.append(li)
            obs_uv.append(uv[li])
            # half the edges are stereo
            obs_ur.append(ur[li] if li % 2 == 0 else -1.0)
    n = len(obs_p)
    # inject gross outliers into 10% of the edges: without the phased
    # chi2 drop these wreck the solution even under Huber
    n_out = n // 10
    out_sel = rng.choice(n, n_out, replace=False)
    obs_uv = np.asarray(obs_uv, np.float32)
    obs_uv[out_sel] += rng.uniform(30, 80, (n_out, 2)).astype(np.float32)
    pad = O - n
    obs_p = np.array(list(obs_p) + [0] * pad, np.int32)
    obs_l = np.array(list(obs_l) + [0] * pad, np.int32)
    obs_uv = np.concatenate([obs_uv, np.zeros((pad, 2), np.float32)])
    obs_ur = np.array(list(obs_ur) + [-1.0] * pad, np.float32)
    obs_w = np.array([1.0] * n + [0.0] * pad, np.float32)

    Xp = X + rng.standard_normal(X.shape).astype(np.float32) * 0.05
    kf_R = [R for (R, t) in poses]
    kf_t = [t + rng.standard_normal(3).astype(np.float32) * 0.02
            for (R, t) in poses]
    free = np.array([False, False] + [True] * (P - 2))

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("obs",))
    ba = make_distributed_ba(mesh, n_poses=P, n_points=L, phases=(5, 10))
    op, ol, ouv, our, ow, _ = partition_obs_by_landmark(
        obs_p, obs_l, obs_uv, obs_w, L, 8, obs_ur=obs_ur)
    res = ba(jnp.asarray(np.stack(kf_R)), jnp.asarray(np.stack(kf_t)),
             jnp.asarray(free), jnp.asarray(Xp), jnp.ones(L, bool),
             jnp.asarray(op), jnp.asarray(ol), jnp.asarray(ouv),
             jnp.asarray(our), jnp.asarray(ow), INTR, np.float32(bf))
    res = jax.tree.map(np.asarray, res)
    # single-phase (no chi2 drop) run for comparison: outliers must be
    # visibly suppressed by the phased gating
    ba1 = make_distributed_ba(mesh, n_poses=P, n_points=L, phases=(15,))
    res1 = ba1(jnp.asarray(np.stack(kf_R)), jnp.asarray(np.stack(kf_t)),
               jnp.asarray(free), jnp.asarray(Xp), jnp.ones(L, bool),
               jnp.asarray(op), jnp.asarray(ol), jnp.asarray(ouv),
               jnp.asarray(our), jnp.asarray(ow), INTR, np.float32(bf))
    res1 = jax.tree.map(np.asarray, res1)
    assert np.isfinite(res.total_chi2)
    # gated chi2 excludes the dropped outliers -> orders of magnitude lower
    assert res.total_chi2 < 0.05 * res1.total_chi2, \
        (res.total_chi2, res1.total_chi2)
    for p in range(2, P):
        R_true, t_true = poses[p]
        ang = np.degrees(np.arccos(np.clip(
            (np.trace(res.kf_R[p] @ R_true.T) - 1) / 2, -1, 1)))
        assert ang < 0.3, f"pose {p} rot err {ang} deg (outliers won)"
        e_gated = np.linalg.norm(res.kf_t[p] - t_true)
        e_raw = np.linalg.norm(res1.kf_t[p] - t_true)
        assert e_gated < 0.12, f"pose {p} t err {e_gated}"
        assert e_gated < e_raw + 1e-4, (e_gated, e_raw)
