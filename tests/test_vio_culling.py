"""IMU-chain maintenance under keyframe culling (reference
KeyFrame::AppendIMUDataToFront src/KeyFrame.cc:82-89 + the VIO culling guards
LocalMapping.cc:1440-1450): culling a chain KF must hand its IMU samples to
the successor so the merged preintegration link spans the gap exactly."""
import numpy as np
import jax.numpy as jnp

from ygz_tpu.geometry import camera as cam_mod
from ygz_tpu.frontend.vi_tracker import (MonoViTracker, _pack_window,
                                         KF_IMU_CAP)
from ygz_tpu.imu.preintegration import preintegrate


def _samples(t0, t1, hz=100.0, w=(0.1, -0.2, 0.05), a=(0.3, 9.81, -0.1)):
    out = []
    t = t0 + 1.0 / hz
    while t <= t1 + 1e-9:
        out.append((t, np.array(w, np.float32), np.array(a, np.float32)))
        t += 1.0 / hz
    return out


def _preint(samples, prev_t, bg, ba):
    om, ac, dts, valid = _pack_window(samples, prev_t, KF_IMU_CAP)
    return preintegrate(jnp.asarray(om), jnp.asarray(ac), jnp.asarray(dts),
                        jnp.asarray(valid), jnp.asarray(bg), jnp.asarray(ba))


def test_merge_culled_imu_matches_ground_truth_link():
    cam = cam_mod.Camera.make(400.0, 400.0, 320.0, 240.0, 640, 480)
    tr = MonoViTracker(cam)
    smap = tr.map

    feats = {"uv": np.zeros((4, 2), np.float32),
             "level": np.zeros(4, np.int32),
             "angle": np.zeros(4, np.float32),
             "desc": np.zeros((4, 256), np.uint8),
             "valid": np.zeros(4, bool)}
    I = np.eye(3, dtype=np.float32)
    z = np.zeros(3, np.float32)
    ts = [0.0, 0.35, 0.7, 1.05]
    kfs = [smap.add_keyframe(I, z, feats, ts=t) for t in ts]

    # chain A -> k -> B -> C with distinct IMU between each pair
    raw = {kfs[1]: _samples(ts[0], ts[1]),
           kfs[2]: _samples(ts[1], ts[2], w=(-0.3, 0.1, 0.2),
                            a=(0.0, 9.5, 0.4)),
           kfs[3]: _samples(ts[2], ts[3], w=(0.2, 0.0, -0.1))}
    tr._kf_order = list(kfs)
    tr._kf_raw = {k: list(v) for k, v in raw.items()}
    for i, k in enumerate(kfs[1:], start=1):
        tr._kf_imu[k] = _pack_window(raw[k], ts[i - 1], KF_IMU_CAP)

    # cull the middle KF (kfs[2])
    smap.kf_valid[kfs[2]] = False
    tr._merge_culled_imu(smap)

    assert tr._kf_order == [kfs[0], kfs[1], kfs[3]]
    assert kfs[2] not in tr._kf_imu and kfs[2] not in tr._kf_raw

    # the successor's window must now preintegrate to EXACTLY the ground
    # truth over the merged k->C interval (samples spanning ts[1]..ts[3],
    # packed against the new predecessor's timestamp)
    bg = np.array([0.01, -0.02, 0.005], np.float32)
    ba = np.array([0.1, 0.0, -0.05], np.float32)
    gt_samples = raw[kfs[2]] + raw[kfs[3]]
    gt = _preint(gt_samples, ts[1], bg, ba)

    om, ac, dts, valid = tr._kf_imu[kfs[3]]
    got = preintegrate(jnp.asarray(om), jnp.asarray(ac), jnp.asarray(dts),
                       jnp.asarray(valid), jnp.asarray(bg), jnp.asarray(ba))
    np.testing.assert_allclose(np.asarray(got.dP), np.asarray(gt.dP),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.dV), np.asarray(gt.dV),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.dR), np.asarray(gt.dR),
                               atol=1e-6)
    assert abs(float(got.dt) - (ts[3] - ts[1])) < 1e-4


def test_vio_culling_guards_protect_recent_and_prev():
    """_cull_keyframes must protect the direct previous chain KF, any KF
    within 0.15 s of the current one, and the last 10 chain KFs (reference
    LocalMapping.cc:1439-1450); older chain KFs stay cullable."""
    cam = cam_mod.Camera.make(400.0, 400.0, 320.0, 240.0, 640, 480)
    tr = MonoViTracker(cam)
    smap = tr.map
    feats = {"uv": np.zeros((4, 2), np.float32),
             "level": np.zeros(4, np.int32),
             "angle": np.zeros(4, np.float32),
             "desc": np.zeros((4, 256), np.uint8),
             "valid": np.zeros(4, bool)}
    I = np.eye(3, dtype=np.float32)
    z = np.zeros(3, np.float32)
    ts = [0.3 * i for i in range(13)]
    kfs = [smap.add_keyframe(I, z, feats, ts=t) for t in ts]
    tr._kf_order = list(kfs)
    tr._kf_raw = {k: [] for k in kfs}

    seen = {}

    def spy(smap_, kf_, protect=None):
        seen["protect"] = set(protect)
        return 0

    tr.mapper.cull_keyframes = spy
    tr._cull_keyframes(smap, kfs[-1])
    # last 10 chain KFs protected (incl. direct prev + <0.15 s current)
    for k in kfs[-10:]:
        assert k in seen["protect"], k
    # the oldest chain KFs are NOT protected
    assert kfs[0] not in seen["protect"]
    assert kfs[1] not in seen["protect"]
