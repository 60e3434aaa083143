"""Global BA over a hand-built SlamMap: recovers perturbed poses+points."""
import numpy as np
import jax.numpy as jnp

from ygz_tpu.backend.mapstate import SlamMap
from ygz_tpu.backend.mapping import LocalMapper
from ygz_tpu.geometry import camera as cam_mod, lie


def test_global_ba_recovers_map():
    rng = np.random.default_rng(0)
    cam = cam_mod.Camera.make(400.0, 400.0, 320.0, 240.0, 640, 480)
    smap = SlamMap(max_kf=32, max_pt=2048, max_feat=512)
    mapper = LocalMapper(cam)

    L = 300
    X = np.stack([rng.uniform(-2, 2, L), rng.uniform(-1.5, 1.5, L),
                  rng.uniform(4, 9, L)], 1).astype(np.float32)
    ids = smap.alloc_points(L)
    smap.pt_valid[ids] = True

    K = 10
    true_poses = []
    for k in range(K):
        w = rng.standard_normal(3).astype(np.float32) * 0.02
        R = np.asarray(lie.so3_exp(jnp.asarray(w)))
        t = np.array([0.25 * k, 0.02 * k, 0.0], np.float32)
        true_poses.append((R, t))
        Xc = X @ R.T + t
        uv = np.stack([400 * Xc[:, 0] / Xc[:, 2] + 320,
                       400 * Xc[:, 1] / Xc[:, 2] + 240], 1)
        uv += rng.standard_normal(uv.shape) * 0.3
        inb = (uv > 10).all(1) & (uv < [630, 470]).all(1)
        feats = {"uv": uv.astype(np.float32), "level": np.zeros(L, np.int32),
                 "desc": np.zeros((L, 256), np.uint8),
                 "angle": np.zeros(L, np.float32), "valid": inb}
        kf = smap.add_keyframe(R, t, feats)
        smap.bind(kf, np.nonzero(inb)[0], ids[inb])

    # perturb all but the first two
    for k in range(2, K):
        dw = rng.standard_normal(3).astype(np.float32) * 0.01
        dt = rng.standard_normal(3).astype(np.float32) * 0.04
        smap.kf_R[k] = np.asarray(lie.so3_exp(jnp.asarray(dw))) @ smap.kf_R[k]
        smap.kf_t[k] = smap.kf_t[k] + dt
    smap.pt_xyz[ids] = X + rng.standard_normal(X.shape).astype(np.float32) * 0.05

    mapper.global_ba(smap)

    for k in range(2, K):
        R_true, t_true = true_poses[k]
        ang = np.degrees(np.arccos(np.clip(
            (np.trace(smap.kf_R[k] @ R_true.T) - 1) / 2, -1, 1)))
        assert ang < 0.15, f"kf {k}: rot err {ang}"
        assert np.linalg.norm(smap.kf_t[k] - t_true) < 0.02
    err = np.linalg.norm(smap.pt_xyz[ids] - X, axis=1).mean()
    assert err < 0.04, err
