"""LoopCloser.compute_sim3 component test: BoW-style matches -> Sim3 RANSAC
-> Sim3-guided projection re-match (SearchBySim3, src/ORBmatcher.cc:1006) ->
inlier-iterated Horn refinement (the OptimizeSim3 role, Optimizer.cc:2409ff).

Scenario: the same physical scene mapped twice (the loop situation) — the
candidate KF binds the original points, the current KF binds drifted
duplicates; the recovered Sim3 must match the synthetic drift.
"""
import numpy as np
import jax.numpy as jnp

from ygz_tpu.backend.mapstate import SlamMap
from ygz_tpu.backend.loopclosing import LoopCloser
from ygz_tpu.geometry import camera as cam_mod, lie


def _project(intr, X):
    fx, fy, cx, cy = intr
    return np.stack([fx * X[:, 0] / X[:, 2] + cx,
                     fy * X[:, 1] / X[:, 2] + cy], -1).astype(np.float32)


def test_compute_sim3_recovers_synthetic_drift():
    rng = np.random.default_rng(9)
    cam = cam_mod.Camera.make(400.0, 400.0, 320.0, 240.0, 640, 480)
    intr = (cam.fx, cam.fy, cam.cx, cam.cy)

    N = 120
    X = np.stack([rng.uniform(-2.5, 2.5, N), rng.uniform(-1.8, 1.8, N),
                  rng.uniform(4.0, 9.0, N)], -1).astype(np.float32)

    # drift: the second visit's map duplicates sit at A(X)
    s_true = 1.12
    R_true = np.asarray(lie.so3_exp(jnp.asarray(
        np.array([0.02, -0.05, 0.03], np.float32))))
    t_true = np.array([0.3, -0.15, 0.4], np.float32)
    Xd = s_true * (X @ R_true.T) + t_true

    desc = rng.integers(0, 2, (N, 256)).astype(np.uint8)
    uv_c = _project(intr, X)    # cand camera = world (T_cw = I)
    uv_k = _project(intr, Xd)   # kf camera = drifted world (T_kw = I)
    inb = lambda uv: ((uv[:, 0] > 5) & (uv[:, 0] < 635)
                      & (uv[:, 1] > 5) & (uv[:, 1] < 475))
    keep = inb(uv_c) & inb(uv_k)
    X, Xd, desc, uv_c, uv_k = X[keep], Xd[keep], desc[keep], uv_c[keep], \
        uv_k[keep]
    n = len(X)
    assert n >= 60

    smap = SlamMap(max_kf=4, max_pt=4 * n, max_feat=max(256, n))
    I = np.eye(3, dtype=np.float32)
    z = np.zeros(3, np.float32)

    def feats(uv, desc):
        m = smap.max_feat
        f = {"uv": np.zeros((m, 2), np.float32),
             "level": np.zeros(m, np.int32),
             "angle": np.zeros(m, np.float32),
             "desc": np.zeros((m, 256), np.uint8),
             "valid": np.zeros(m, bool)}
        f["uv"][: len(uv)] = uv
        f["desc"][: len(uv)] = desc
        f["valid"][: len(uv)] = True
        return f

    cand = smap.add_keyframe(I, z, feats(uv_c, desc))
    kf = smap.add_keyframe(I, z, feats(uv_k, desc))
    ids_c = smap.alloc_points(n)
    smap.pt_xyz[ids_c] = X
    smap.pt_valid[ids_c] = True
    smap.pt_desc[ids_c] = desc
    smap.bind(cand, np.arange(n), ids_c)
    ids_k = smap.alloc_points(n)
    smap.pt_xyz[ids_k] = Xd
    smap.pt_valid[ids_k] = True
    smap.pt_desc[ids_k] = desc
    smap.bind(kf, np.arange(n), ids_k)

    class _Bow:  # detect() is not exercised here; kf_valid all-False skips
        kf_valid = np.zeros(16, bool)  # node gating in compute_sim3

    lc = LoopCloser(_Bow(), cam)
    out = lc.compute_sim3(smap, kf, cand)
    assert out is not None, "Sim3 not found"
    R, t, s, ni = out
    assert ni >= 40, ni
    assert abs(s - s_true) < 0.01, (s, s_true)
    ang = np.degrees(np.arccos(np.clip((np.trace(R @ R_true.T) - 1) / 2,
                                       -1, 1)))
    assert ang < 0.5, ang
    np.testing.assert_allclose(t, t_true, atol=0.03)


def test_correct_closes_loop_and_fuses():
    """Full correction path: a drifted 6-KF chain whose last KF revisits the
    first; correct() must spread the drift along the essential graph, fuse
    the duplicated landmarks across the seam (SearchAndFuse), and persist
    the loop edge."""
    rng = np.random.default_rng(10)
    cam = cam_mod.Camera.make(400.0, 400.0, 320.0, 240.0, 640, 480)
    intr = (cam.fx, cam.fy, cam.cx, cam.cy)

    N = 100
    X = np.stack([rng.uniform(-2.5, 2.5, N), rng.uniform(-1.8, 1.8, N),
                  rng.uniform(4.0, 9.0, N)], -1).astype(np.float32)
    s_true = 1.10
    R_true = np.asarray(lie.so3_exp(jnp.asarray(
        np.array([0.0, -0.03, 0.02], np.float32))))
    t_true = np.array([0.25, -0.1, 0.3], np.float32)
    Xd = s_true * (X @ R_true.T) + t_true   # drifted duplicates at the seam

    desc = rng.integers(0, 2, (N, 256)).astype(np.uint8)
    uv_c = _project(intr, X)
    uv_k = _project(intr, Xd)
    inb = lambda uv: ((uv[:, 0] > 25) & (uv[:, 0] < 615)
                      & (uv[:, 1] > 25) & (uv[:, 1] < 455))
    keep = inb(uv_c) & inb(uv_k)
    X, Xd, desc, uv_c, uv_k = (X[keep], Xd[keep], desc[keep], uv_c[keep],
                               uv_k[keep])
    n = len(X)

    smap = SlamMap(max_kf=8, max_pt=8 * n, max_feat=max(256, n))
    I = np.eye(3, dtype=np.float32)
    z = np.zeros(3, np.float32)

    def feats(uv, desc):
        m = smap.max_feat
        f = {"uv": np.zeros((m, 2), np.float32),
             "level": np.zeros(m, np.int32),
             "angle": np.zeros(m, np.float32),
             "desc": np.zeros((m, 256), np.uint8),
             "valid": np.zeros(m, bool)}
        f["uv"][: len(uv)] = uv
        f["desc"][: len(uv)] = desc
        f["valid"][: len(uv)] = True
        return f

    # KF0 = cand (origin, original points); KF1..4 = chain in between
    # (poses drifting); KF5 = current, observing the drifted duplicates
    cand = smap.add_keyframe(I, z, feats(uv_c, desc))
    ids_c = smap.alloc_points(n)
    smap.pt_xyz[ids_c] = X
    smap.pt_valid[ids_c] = True
    smap.pt_desc[ids_c] = desc
    smap.pt_ref_kf[ids_c] = cand
    smap.bind(cand, np.arange(n), ids_c)
    for j in range(1, 5):
        tj = np.array([0.4 * j, 0.0, 0.0], np.float32)
        smap.add_keyframe(I, tj, feats(uv_c[:8], desc[:8]))
    kf = smap.add_keyframe(I, z, feats(uv_k, desc))
    ids_k = smap.alloc_points(n)
    smap.pt_xyz[ids_k] = Xd
    smap.pt_valid[ids_k] = True
    smap.pt_desc[ids_k] = desc
    smap.pt_ref_kf[ids_k] = kf
    smap.bind(kf, np.arange(n), ids_k)

    class _Bow:
        kf_valid = np.zeros(16, bool)

    lc = LoopCloser(_Bow(), cam)
    out = lc.compute_sim3(smap, kf, cand)
    assert out is not None
    R, t, s, _ = out
    n_before = int(smap.pt_valid[: smap.n_pt].sum())
    ok = lc.correct(smap, kf, cand, (R, t, s))
    assert ok
    # loop edge persisted for future essential-graph solves
    assert len(lc.loop_edges) == 1
    # duplicates fused across the seam (loop-side point replaces)
    n_after = int(smap.pt_valid[: smap.n_pt].sum())
    assert n_after < n_before - 0.5 * n, (n_before, n_after)
    # the seam is closed: projecting the (fused, loop-side) points through
    # the corrected current pose lands on the current KF's measurements
    binds = smap.kf_feat_pt[kf]
    slots = np.nonzero(binds >= 0)[0]
    pts = binds[slots]
    Xc = smap.pt_xyz[pts] @ smap.kf_R[kf].T + smap.kf_t[kf]
    uv = _project(intr, Xc)
    err = np.linalg.norm(uv - smap.kf_feat_uv[kf, slots], axis=1)
    assert np.median(err) < 4.0, np.median(err)
