"""Spanning tree + relative-pose trajectory recovery.

The tracker logs each frame's pose RELATIVE to its reference keyframe
(reference mlRelativeFramePoses, include/Tracking.h:108-114); the savers
compose it onto the KF's CURRENT pose, walking the spanning tree past culled
keyframes via the stored T_cp (reference System::SaveTrajectoryTUM,
src/System.cc:452-508, KeyFrame::SetBadFlag mTcp src/KeyFrame.cc:639).
"""
import numpy as np
import pytest

from ygz_tpu.backend.mapstate import SlamMap
from ygz_tpu.geometry import lie
import jax.numpy as jnp


def _rand_pose(rng):
    w = rng.normal(size=3) * 0.3
    R = np.asarray(lie.so3_exp(jnp.asarray(w.astype(np.float32))))
    t = rng.normal(size=3).astype(np.float32)
    return R, t


def test_resolve_pose_walks_culled_chain():
    rng = np.random.default_rng(3)
    smap = SlamMap(max_kf=8, max_pt=16, max_feat=8)
    feats = {"uv": np.zeros((1, 2), np.float32),
             "level": np.zeros(1, np.int32),
             "angle": np.zeros(1, np.float32),
             "desc": np.zeros((1, 256), np.uint8),
             "valid": np.zeros(1, bool)}
    poses = [_rand_pose(rng) for _ in range(4)]
    for R, t in poses:
        smap.add_keyframe(R, t, feats)

    # chain: 3 -> 2 -> 1 -> 0; cull 2 then 1
    smap.kf_parent[1:4] = [0, 1, 2]
    smap.mark_culled(2, 1)
    smap.kf_valid[2] = False
    # culling 2 re-parents 3 onto 1
    assert smap.kf_parent[3] == 1
    smap.mark_culled(1, 0)
    smap.kf_valid[1] = False

    # now move KF0 (as a loop correction would) and check the culled KFs'
    # resolved poses move rigidly with it
    R0n, t0n = _rand_pose(rng)
    dR = R0n @ poses[0][0].T          # world-frame correction: T0n = dT T0
    dt = t0n - dR @ poses[0][1]
    smap.set_pose(0, R0n, t0n)

    for k in (1, 2):
        Rk, tk = smap.resolve_pose(k)
        R_exp = poses[k][0] @ dR.T    # Tk' = Tk dT^-1? No: Tk' = Tk T0^-1 T0n
        # expected: relative pose to KF0 is preserved
        R_rel = poses[k][0] @ poses[0][0].T
        t_rel = poses[k][1] - R_rel @ poses[0][1]
        R_exp = R_rel @ R0n
        t_exp = R_rel @ t0n + t_rel
        np.testing.assert_allclose(Rk, R_exp, atol=1e-5)
        np.testing.assert_allclose(tk, t_exp, atol=1e-5)

    # a surviving KF resolves to its own stored pose
    Rk, tk = smap.resolve_pose(3)
    np.testing.assert_allclose(Rk, poses[3][0], atol=1e-6)
    np.testing.assert_allclose(tk, poses[3][1], atol=1e-6)


@pytest.mark.slow
def test_saved_trajectory_reflects_post_hoc_corrections(tmp_path):
    """After a synthetic 'loop correction' rewrites keyframe poses, the saved
    trajectory must move with them (the old absolute log would not)."""
    from ygz_tpu.geometry import camera as cam_mod
    from ygz_tpu.system import System, Sensor
    from test_vo_e2e import make_trajectory
    from synthetic import SmoothScene

    scene = SmoothScene(seed=11)
    cam = cam_mod.Camera.make(scene.f, scene.f, scene.cx, scene.cy,
                              scene.w, scene.h)
    poses = make_trajectory(30)
    sys_ = System(cam, Sensor.MONOCULAR)
    for i, (R, t) in enumerate(poses):
        sys_.track_monocular(scene.render(R, t), timestamp=i * 0.05)
    assert sys_.tracker.state.name == "OK"
    smap = sys_.map
    # every frame after init must carry a relative record
    ok_recs = [r for r in sys_.trajectory if r.state == "OK"]
    assert all(r.ref_kf >= 0 for r in ok_recs)
    # parents form a tree over valid KFs
    for k in range(1, smap.n_kf):
        if smap.kf_valid[k]:
            assert 0 <= smap.kf_parent[k] < k

    p1 = tmp_path / "before.txt"
    p2 = tmp_path / "after.txt"
    sys_.save_trajectory_tum(str(p1))

    # rigidly transform the whole map (what a loop/GBA correction does)
    rng = np.random.default_rng(0)
    dR, dt_ = _rand_pose(rng)
    for k in range(smap.n_kf):
        if smap.kf_valid[k]:
            # Tkw' = Tkw * dT^-1  (world frame re-expressed)
            Rk = smap.kf_R[k] @ dR.T
            tk = smap.kf_t[k] - Rk @ dt_
            smap.set_pose(k, Rk, tk)
    sys_.save_trajectory_tum(str(p2))

    a = np.loadtxt(p1)
    b = np.loadtxt(p2)
    assert a.shape == b.shape and len(a) == len(ok_recs)
    # camera centres must have moved by the applied world transform:
    # c' = dR c + dt
    c_exp = a[:, 1:4] @ np.asarray(dR).T + np.asarray(dt_)
    np.testing.assert_allclose(b[:, 1:4], c_exp, atol=1e-3)


def test_map_capacity_growth():
    """SlamMap grows keyframe/point capacity on demand (long sequences must
    not crash at the initial caps)."""
    smap = SlamMap(max_kf=2, max_pt=4, max_feat=4)
    feats = {"uv": np.zeros((2, 2), np.float32),
             "level": np.zeros(2, np.int32),
             "angle": np.zeros(2, np.float32),
             "desc": np.zeros((2, 256), np.uint8),
             "valid": np.ones(2, bool)}
    for k in range(9):
        kf = smap.add_keyframe(np.eye(3, dtype=np.float32),
                               np.full(3, float(k), np.float32), feats,
                               frame_id=k)
        assert kf == k
    assert smap.max_kf >= 9 and smap.n_kf == 9
    assert (smap.kf_parent[smap.n_kf:] == -1).all()
    assert (smap.kf_feat_pt[: smap.n_kf] == -1).all()
    np.testing.assert_allclose(smap.kf_t[8], 8.0)

    ids = smap.alloc_points(33)
    assert smap.max_pt >= 33 and len(ids) == 33
    smap.pt_xyz[ids] = 1.0
    smap.bind(0, [0, 1], ids[:2])
    assert smap.pt_obs[ids[0]] == 1

    # bow index grows alongside
    from ygz_tpu.backend.bow import BowIndex, Vocabulary
    voc = Vocabulary(words=np.zeros((8, 256), np.uint8),
                     groups=np.zeros(8, np.int32),
                     idf=np.ones(8, np.float32), branching=2, depth=3)
    bi = BowIndex(voc, max_kf=2)
    for k in range(7):
        # sparse tf-idf pair (uids, weights) — the opaque `bow` handle
        # produced by BowIndex.quantize
        bi.add_keyframe(k, (np.arange(8, dtype=np.int32),
                            np.ones(8, np.float32) / 8))
    assert bi.kf_valid[:7].all() and len(bi.kf_valid) >= 7
