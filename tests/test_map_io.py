"""Map save/load + relocalize-into-loaded-map (localization-only session).

The reference left SaveMap/LoadMap as TODOs (include/System.h:129-131); here
they are real capabilities: a mapping session serializes the struct-of-arrays
map + BoW state, and a fresh session relocalizes into it with the map frozen.
"""
import numpy as np
import pytest

from ygz_tpu.geometry import camera as cam_mod
from ygz_tpu.system import System, Sensor
from ygz_tpu.backend.mapstate import SlamMap

from test_vo_e2e import make_trajectory
from synthetic import SmoothScene


def test_mapstate_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    smap = SlamMap(max_kf=8, max_pt=32, max_feat=16)
    feats = {"uv": rng.uniform(0, 100, (16, 2)).astype(np.float32),
             "level": np.zeros(16, np.int32),
             "angle": np.zeros(16, np.float32),
             "desc": rng.integers(0, 2, (16, 256)).astype(np.uint8),
             "valid": np.ones(16, bool)}
    smap.add_keyframe(np.eye(3, dtype=np.float32),
                      np.array([1.0, 2, 3], np.float32), feats, ts=4.5,
                      frame_id=7)
    ids = smap.alloc_points(5)
    smap.pt_xyz[ids] = rng.normal(size=(5, 3))
    smap.pt_valid[ids] = True
    smap.bind(0, np.arange(5), ids)

    p = tmp_path / "map.npz"
    smap.save(str(p))
    m2 = SlamMap.load(str(p))
    assert m2.n_kf == 1 and m2.n_pt == 5
    np.testing.assert_array_equal(m2.kf_feat_desc, smap.kf_feat_desc)
    np.testing.assert_array_equal(m2.kf_feat_pt, smap.kf_feat_pt)
    np.testing.assert_allclose(m2.pt_xyz[:5], smap.pt_xyz[:5])
    assert m2.kf_ts[0] == 4.5 and m2.kf_frame_id[0] == 7
    np.testing.assert_array_equal(m2.pt_obs[:5], smap.pt_obs[:5])


@pytest.mark.slow
def test_localization_from_saved_map(tmp_path):
    scene = SmoothScene(seed=11)
    cam = cam_mod.Camera.make(scene.f, scene.f, scene.cx, scene.cy,
                              scene.w, scene.h)
    poses = make_trajectory(30)
    sys1 = System(cam, Sensor.MONOCULAR)
    for i, (R, t) in enumerate(poses):
        sys1.track_monocular(scene.render(R, t), timestamp=i * 0.05)
    assert sys1.tracker.state.name == "OK"
    p = tmp_path / "session.npz"
    sys1.save_map(str(p))

    # fresh session, frozen map: must relocalize and track
    sys2 = System(cam, Sensor.MONOCULAR)
    sys2.load_map(str(p))
    n_kf_before = sys2.map.n_kf
    states = []
    errs = []
    # session 1's own estimates share the map frame AND the map scale —
    # the right comparison target (mono map units, not metric GT)
    ref = {round(r.ts, 6): (-r.R.T @ r.t) for r in sys1.trajectory
           if r.state == "OK"}
    # replay a mid-trajectory stretch (poses the map has seen)
    for i in range(10, 28):
        R, t = poses[i]
        state, T = sys2.track_monocular(scene.render(R, t),
                                        timestamp=i * 0.05)
        states.append(state)
        key = round(i * 0.05, 6)
        if state == "OK" and key in ref:
            c_est = -T[:3, :3].T @ T[:3, 3]
            errs.append(np.linalg.norm(c_est - ref[key]))
    assert states.count("OK") >= 12, states
    # localization-only: the frozen map grew no keyframes
    assert sys2.map.n_kf == n_kf_before
    assert np.median(errs) < 0.05, (np.median(errs), errs[:5])
