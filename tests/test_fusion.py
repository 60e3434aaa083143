"""Map-point fusion: MapPoint::Replace semantics + duplicate merging in
bind_map_points (reference ORBmatcher::Fuse src/ORBmatcher.cc:748-886,
MapPoint::Replace src/MapPoint.cc:155)."""
import numpy as np

from ygz_tpu.backend.mapstate import SlamMap
from ygz_tpu.backend.mapping import LocalMapper
from ygz_tpu.geometry import camera as cam_mod


def _feats(uv, desc, level=None):
    n = len(uv)
    return {"uv": np.asarray(uv, np.float32),
            "level": np.zeros(n, np.int32) if level is None else level,
            "angle": np.zeros(n, np.float32),
            "desc": desc,
            "valid": np.ones(n, bool)}


def _rand_desc(rng, n):
    return (rng.random((n, 256)) > 0.5).astype(np.uint8)


def test_replace_point_rebinds_and_merges_stats():
    rng = np.random.default_rng(0)
    m = SlamMap(max_kf=8, max_pt=32, max_feat=8)
    d = _rand_desc(rng, 8)
    I = np.eye(3, dtype=np.float32)
    z = np.zeros(3, np.float32)
    k0 = m.add_keyframe(I, z, _feats(rng.random((8, 2)) * 100, d))
    k1 = m.add_keyframe(I, z, _feats(rng.random((8, 2)) * 100, d))
    k2 = m.add_keyframe(I, z, _feats(rng.random((8, 2)) * 100, d))
    a, b = m.alloc_points(2)
    m.pt_valid[[a, b]] = True
    # a observed in k0,k1; b observed in k1,k2 (k1 sees BOTH)
    m.bind(k0, [0], [a])
    m.bind(k1, [1], [a])
    m.bind(k1, [2], [b])
    m.bind(k2, [3], [b])
    m.pt_found[a], m.pt_found[b] = 5, 3
    m.pt_visible[a], m.pt_visible[b] = 9, 4

    m.replace_point(b, a)

    assert not m.pt_valid[b]
    assert m.pt_valid[a]
    # k1 already saw `a`: the duplicate observation is dropped, not rebound
    assert m.kf_feat_pt[k1, 2] == -1
    # k2's observation of b is rebound to a
    assert m.kf_feat_pt[k2, 3] == a
    assert m.pt_obs[a] == 3
    assert m.pt_obs[b] == 0
    assert m.pt_found[a] == 8 and m.pt_visible[a] == 13
    # no binding to b remains anywhere
    assert not (m.kf_feat_pt[: m.n_kf] == b).any()


def test_bind_map_points_fuses_duplicates():
    """Two landmarks at the same world position with the same descriptor:
    after bind_map_points on a KF that observes one of them, only one
    survives and it carries all observations."""
    rng = np.random.default_rng(1)
    cam = cam_mod.Camera.make(400.0, 400.0, 320.0, 240.0, 640, 480)
    mapper = LocalMapper(cam)
    m = SlamMap(max_kf=8, max_pt=64, max_feat=16)
    I = np.eye(3, dtype=np.float32)

    # a cloud of well-separated points seen by two KFs
    n = 12
    X = np.stack([rng.uniform(-1.5, 1.5, n), rng.uniform(-1, 1, n),
                  rng.uniform(4, 6, n)], 1).astype(np.float32)
    desc = _rand_desc(rng, n)

    def project(X, t):
        Xc = X + t
        return np.stack([400 * Xc[:, 0] / Xc[:, 2] + 320,
                         400 * Xc[:, 1] / Xc[:, 2] + 240], -1)

    t0 = np.zeros(3, np.float32)
    t1 = np.array([0.1, 0.0, 0.0], np.float32)
    k0 = m.add_keyframe(I, t0, _feats(project(X, t0), desc))
    k1 = m.add_keyframe(I, t1, _feats(project(X, t1), desc))

    ids = m.alloc_points(n)
    m.pt_xyz[ids] = X
    m.pt_valid[ids] = True
    m.pt_desc[ids] = desc
    m.bind(k0, np.arange(n), ids)
    # k1 binds all but the LAST feature; that feature instead gets a
    # duplicate landmark at the same position with the same descriptor
    m.bind(k1, np.arange(n - 1), ids[: n - 1])
    dup = m.alloc_points(1)
    m.pt_xyz[dup] = X[n - 1]
    m.pt_valid[dup] = True
    m.pt_desc[dup] = desc[n - 1]
    m.bind(k1, [n - 1], dup)

    n_before = int(m.pt_valid[: m.n_pt].sum())
    mapper.bind_map_points(m, k1)
    n_after = int(m.pt_valid[: m.n_pt].sum())
    assert n_after == n_before - 1, (n_before, n_after)
    # the original (2-obs... now fused) point owns the k1 observation
    assert m.kf_feat_pt[k1, n - 1] == ids[n - 1]
    assert not m.pt_valid[dup[0]]
    assert m.pt_obs[ids[n - 1]] == 2
