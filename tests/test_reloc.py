"""Relocalization E2E: lose tracking on blank frames, recover via BoW+PnP."""
import numpy as np
import jax.numpy as jnp
import pytest

from ygz_tpu.geometry import camera as cam_mod
from ygz_tpu.system import System, Sensor

from synthetic import SmoothScene
from test_vo_e2e import make_trajectory


@pytest.mark.slow
def test_relocalization_after_blackout():
    scene = SmoothScene(seed=11)
    cam = cam_mod.Camera.make(scene.f, scene.f, scene.cx, scene.cy,
                              scene.w, scene.h)
    poses = make_trajectory(36)
    from ygz_tpu.frontend.tracker import TrackerConfig
    sys = System(cam, Sensor.MONOCULAR, config=TrackerConfig(kf_max_gap=4))

    imgs = [scene.render(R, t) for (R, t) in poses]
    states = []
    n_track = 30  # long enough that the map exceeds the reset-on-early-loss
    for i in range(n_track):  # gate of 5 keyframes (src/Tracking.cc:703-711)
        state, T = sys.track_monocular(imgs[i], timestamp=i * 0.05)
        states.append(state)
    assert states[-1] == "OK", states
    assert sys.map.n_kf > 5, sys.map.n_kf

    # blackout: tracking must be lost
    black = np.zeros_like(imgs[0])
    for j in range(3):
        state, _ = sys.track_monocular(black, timestamp=(n_track + j) * 0.05)
    assert state == "LOST"

    # show a view close to an already-mapped pose: must relocalize
    recovered = False
    c_err = None
    for j, back_i in enumerate([12, 12, 12]):
        state, T = sys.track_monocular(imgs[back_i],
                                       timestamp=(n_track + 3 + j) * 0.05)
        if state == "OK":
            recovered = True
            R_gt, t_gt = poses[back_i]
            c_gt = -R_gt.T @ t_gt
            c_est = -T[:3, :3].T @ T[:3, 3]
            # compare up to map scale: use ratio on a known displacement
            # (map scale ~= 1/median-depth ~= 0.19); just check direction and
            # bounded magnitude error vs the scaled gt
            smap = sys.map
            ids = np.nonzero(smap.pt_valid[: smap.n_pt])[0]
            zmed = np.median(smap.pt_xyz[ids, 2])
            s = zmed / 5.0
            c_err = np.linalg.norm(c_est - c_gt * s)
            break
    assert recovered, "did not relocalize"
    assert c_err < 0.05, f"reloc pose error {c_err}"
