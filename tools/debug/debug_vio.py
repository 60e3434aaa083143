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
from ygz_tpu.imu import vins_init as vi_mod
from synthetic import SmoothScene
from test_vio_e2e import pose_fn, synth_imu, G_W, FPS, _centre
def _c64(i):
    return _centre(i / FPS)

scene = SmoothScene(seed=11)
cam = cam_mod.Camera.make(scene.f, scene.f, scene.cx, scene.cy,
                          scene.w, scene.h)
from ygz_tpu.frontend.tracker import TrackerConfig
sys_ = System(cam, Sensor.MONO_VI, config=TrackerConfig(kf_max_gap=8),
              vins_init_kfs=6, vins_init_time=1.2)
tr = sys_.tracker

orig = vi_mod.vins_initialize
def wrapped(*a, **k):
    c_w, R_wc, pre0, recompute, Tbc = a[:5]
    print("  INPUT: K=", len(c_w), "c_span=", np.round(np.ptp(np.asarray(c_w),0),3),
          "pre_dts=", [round(float(p.dt),3) for p in pre0],
          "pre_dP0=", np.round(np.asarray(pre0[0].dP),3))
    from ygz_tpu.imu.vins_init import solve_gyro_bias, solve_scale_gravity
    import numpy as _np
    Rbc = Tbc[:3,:3]; tbc = Tbc[:3,3]
    R_wb = [_np.asarray(R) @ Rbc.T for R in R_wc]
    t_cb = -Rbc.T @ tbc
    q_w = _np.stack([_np.asarray(R) @ t_cb for R in R_wc])
    bg = solve_gyro_bias(R_wb, pre0)
    pres = recompute(bg)
    s2, g2 = solve_scale_gravity(_np.asarray(c_w), q_w, R_wb, pres)
    print("  STEP2: s2=", s2, "g2=", _np.round(g2,3), "|g2|=", round(float(_np.linalg.norm(g2)),3))
    res = orig(*a, **k)
    print("  vins_initialize ->", res.ok, "s=", res.scale,
          "g=", np.round(res.gravity_w, 3), "|g|=",
          round(float(np.linalg.norm(res.gravity_w)), 3),
          "bg=", np.round(res.bg, 4), "ba=", np.round(res.ba, 3))
    return res
import ygz_tpu.frontend.vi_tracker as vt
vt.vins_initialize = wrapped

for i in range(70):
    t = i / FPS
    R, tt = pose_fn(t)
    img = scene.render(R, tt)
    imu = synth_imu((i - 1) / FPS, t) if i > 0 else []
    state, T = sys_.track_mono_vi(img, imu, timestamp=t)
    c_est = -T[:3, :3].T @ T[:3, 3]
    c_gt = _c64(i)
    ns = tr._ns
    print(f"f{i:03d} {state} kf={tr.map.n_kf} ready={tr.vio_ready} "
          f"inl={tr.debug.get('n_inliers')} c_est={np.round(c_est,3)} "
          f"c_gt={np.round(c_gt,3)} V={np.round(ns[1],3) if ns else None}")
    if i > 60:
        break
