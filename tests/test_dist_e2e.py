"""Distributed BA as a PRODUCT capability (VERDICT r2 #4): a full tracking
run configured with TrackerConfig.mesh_devices (the examples' --devices flag)
must build its mapper on a real jax Mesh, run map-wide optimization through
the landmark-block-sharded path, and produce the same trajectory/map as the
single-device configuration."""
import numpy as np
import jax.numpy as jnp
import pytest

from ygz_tpu.geometry import camera as cam_mod, lie
from ygz_tpu.system import System, Sensor
from ygz_tpu.frontend.tracker import TrackerConfig

from synthetic import SmoothScene

N = 60


def pose(i):
    yaw = 0.02 * np.sin(i * 0.3)
    R = np.asarray(lie.so3_exp(jnp.asarray(
        np.array([0.0, yaw, 0.0], np.float32))))
    c = np.array([0.035 * i, 0.1 * np.sin(i * 0.13), 0.0], np.float32)
    return R, (-R @ c).astype(np.float32)


def _run(mesh_devices):
    scene = SmoothScene(seed=21, w=480, h=360, f=600.0, tex_size=2000)
    cam = cam_mod.Camera.make(scene.f, scene.f, scene.cx, scene.cy,
                              scene.w, scene.h)
    sys_ = System(cam, Sensor.MONOCULAR,
                  config=TrackerConfig(kf_max_gap=8,
                                       mesh_devices=mesh_devices))
    for i in range(N):
        R, t = pose(i)
        sys_.track_monocular(scene.render(R, t), timestamp=i * 0.05)
    assert sys_.tracker.state.name == "OK"
    # map-wide optimization through the product path (the same
    # LocalMapper.global_ba the loop closer and VINS init invoke; with a
    # mesh it dispatches the landmark-block-sharded distributed step)
    sys_.tracker.mapper.global_ba(sys_.tracker.map)
    est = []
    for r in sys_.trajectory:
        if r.state == "OK":
            R, t = sys_.tracker.recovered_pose(r)
            est.append(-R.T @ t)
    return sys_, np.asarray(est)


@pytest.mark.slow
def test_mesh_configured_system_matches_single_device():
    sys1, est1 = _run(mesh_devices=0)
    sys2, est2 = _run(mesh_devices=2)

    # the distributed path really ran (mesh built + sharded program cached)
    assert sys1.tracker.mapper.mesh is None
    assert sys2.tracker.mapper.mesh is not None
    assert sys2.tracker.mapper.mesh.devices.size == 2
    assert sys2.tracker.mapper._dist_ba_cache, \
        "global BA never dispatched the distributed step"

    m = min(len(est1), len(est2))
    assert m > 0.9 * N
    span = np.linalg.norm(est1[-1] - est1[0])
    err = np.linalg.norm(est1[:m] - est2[:m], axis=1).max()
    # identical tracking; only the final GBA differs (dense solve vs
    # distributed PCG), so trajectories agree to solver tolerance
    assert err < 0.05 * span + 5e-3, (err, span)
