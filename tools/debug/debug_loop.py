"""Loop-closing E2E prototype: out-and-back sweep, revisit start."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import sys
sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from ygz_tpu.geometry import camera as cam_mod, lie
from ygz_tpu.system import System, Sensor
from ygz_tpu.frontend.tracker import TrackerConfig
from synthetic import SmoothScene

N = 200
SWEEP = 5.0


def pose(i):
    s = SWEEP * np.sin(np.pi * i / N)
    yaw = 0.02 * np.sin(i * 0.23)
    w = np.array([0.0, yaw, 0.0], np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    c = np.array([s, 0.12 * np.sin(i * 0.11), 0.0], np.float32)
    return R, (-R @ c).astype(np.float32)


def main():
    scene = SmoothScene(seed=31, w=480, h=360, f=600.0, tex_size=2400)
    cam = cam_mod.Camera.make(scene.f, scene.f, scene.cx, scene.cy,
                              scene.w, scene.h)
    sys_ = System(cam, Sensor.MONOCULAR,
                  config=TrackerConfig(kf_max_gap=10))
    tr = sys_.tracker
    for i in range(N):
        R, t = pose(i)
        img = scene.render(R, t)
        state, T = sys_.track_monocular(img, timestamp=i * 0.05)
        c_est = -T[:3, :3].T @ T[:3, 3]
        c_gt = -R.T @ t
        if i % 10 == 0 or state != "OK":
            print(f"f{i:03d} {state} kf={tr.map.n_kf} pt={tr.map.n_pt} "
                  f"loops={tr.n_loops_closed} "
                  f"inl={tr.debug.get('n_inliers')} "
                  f"c_est={np.round(c_est, 3)} c_gt={np.round(c_gt, 3)}")
    print("loops closed:", tr.n_loops_closed)
    # final position error (scale via init segment)
    est = []
    gt = []
    for i, r in enumerate(sys_.trajectory):
        if r.state == "OK":
            est.append(-r.R.T @ r.t)
            R, t = pose(i)
            gt.append(-R.T @ t)
    from ygz_tpu.eval.ate import ate_rmse
    rmse, _ = ate_rmse(np.array(est), np.array(gt), with_scale=True)
    print(f"ATE (7DoF): {rmse:.4f}  span_gt={SWEEP}")


if __name__ == "__main__":
    main()
