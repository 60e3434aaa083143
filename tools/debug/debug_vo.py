"""Manual debug driver for the E2E VO path (not collected by pytest)."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import sys
sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

from ygz_tpu.geometry import camera as cam_mod
from ygz_tpu.system import System, Sensor
from test_vo_e2e import make_trajectory
from synthetic import SmoothScene


def main():
    scene = SmoothScene(seed=11)
    cam = cam_mod.Camera.make(scene.f, scene.f, scene.cx, scene.cy,
                              scene.w, scene.h)
    poses = make_trajectory(50)
    sys_ = System(cam, Sensor.MONOCULAR)
    tr = sys_.tracker

    for i, (R, t) in enumerate(poses):
        img = scene.render(R, t)
        state, T = sys_.track_monocular(img, timestamp=i * 0.05)
        c_est = -T[:3, :3].T @ T[:3, 3]
        c_gt = -R.T @ t
        print(f"f{i:03d} {state:15s} kf={tr.map.n_kf} pt={tr.map.n_pt} "
              f"cache={len(tr._cache)} dbg={tr.debug} "
              f"c_est={np.round(c_est, 3)} c_gt={np.round(c_gt, 3)}")


if __name__ == "__main__":
    main()
