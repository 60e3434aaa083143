"""ATE accuracy table across all sensor modes on synthetic scenes.

Real EuRoC/TUM/KITTI datasets cannot be fetched in this environment (zero
egress), so the BASELINE ATE targets are held against the hardened synthetic
protocol instead: rendered scenes with photometric nuisances (exposure
gain/bias, pixel noise, motion blur, occluders — utils/synthetic.Nuisance),
evaluated with the same Horn-alignment ATE RMSE the reference's
evaluate_ate_euroc.py uses (eval/ate.py).

Usage: JAX_PLATFORMS=cpu python tools/ate_report.py [--out ATE_r02.md]
"""
import argparse
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import numpy as np  # noqa: E402
import jax  # noqa: E402

# pin the CPU backend BEFORE any computation: on this machine the TPU-tunnel
# plugin can stall for minutes at first use unless cpu is forced here too
jax.config.update("jax_platforms", "cpu")
# share the repo-local persistent compilation cache (tests/conftest.py)
from ygz_tpu.utils.compile_cache import enable as _enable_cache  # noqa: E402
_enable_cache()


def run_mode(mode, nuisance, n_frames=50):
    import jax.numpy as jnp
    from ygz_tpu.geometry import camera as cam_mod
    from ygz_tpu.system import System, Sensor
    from ygz_tpu.eval.ate import ate_rmse
    from ygz_tpu.utils.synthetic import SmoothScene, Nuisance
    from test_vo_e2e import make_trajectory

    scene = SmoothScene(seed=11)
    nuis = Nuisance(seed=3) if nuisance else None
    poses = make_trajectory(n_frames)
    BASELINE_M = 0.2

    if mode == "mono":
        cam = cam_mod.Camera.make(scene.f, scene.f, scene.cx, scene.cy,
                                  scene.w, scene.h)
        sys_ = System(cam, Sensor.MONOCULAR)
    elif mode == "stereo":
        cam = cam_mod.Camera.make(scene.f, scene.f, scene.cx, scene.cy,
                                  scene.w, scene.h, bf=scene.f * BASELINE_M)
        sys_ = System(cam, Sensor.STEREO)
    elif mode == "rgbd":
        cam = cam_mod.Camera.make(scene.f, scene.f, scene.cx, scene.cy,
                                  scene.w, scene.h)
        sys_ = System(cam, Sensor.RGBD)
    elif mode == "mono-vi":
        from test_vio_e2e import pose_fn, synth_imu, FPS
        from ygz_tpu.frontend.tracker import TrackerConfig
        cam = cam_mod.Camera.make(scene.f, scene.f, scene.cx, scene.cy,
                                  scene.w, scene.h)
        sys_ = System(cam, Sensor.MONO_VI,
                      config=TrackerConfig(kf_max_gap=8),
                      vins_init_kfs=6, vins_init_time=1.2)
        states = []
        for i in range(70):
            t = i / FPS
            R, tt = pose_fn(t)
            img = scene.render(R, tt)
            if nuis is not None:
                img = nuis.apply(img, i)
            imu = synth_imu((i - 1) / FPS, t) if i > 0 else []
            state, _ = sys_.track_mono_vi(img, imu, timestamp=t)
            states.append(state)
        est, gt = [], []
        for i, rec in enumerate(sys_.trajectory):
            if rec.state != "OK":
                continue
            est.append(-rec.R.T @ rec.t)
            R, tt = pose_fn(i / FPS)
            gt.append(-R.T @ tt)
        rmse, _ = ate_rmse(np.array(est), np.array(gt), with_scale=False)
        ok = sum(1 for s in states if s == "OK")
        return rmse, ok, len(states), "6-DoF (metric after VINS init)"

    states = []
    for i, (R, t) in enumerate(poses):
        img = scene.render(R, t)
        if nuis is not None:
            img = nuis.apply(img, i)
        if mode == "mono":
            state, _ = sys_.track_monocular(img, timestamp=i * 0.05)
        elif mode == "stereo":
            tr = t - np.array([BASELINE_M, 0.0, 0.0], np.float32)
            imgR = scene.render(R, tr)
            if nuis is not None:
                imgR = nuis.apply(imgR, 10000 + i)
            state, _ = sys_.track_stereo(img, imgR, timestamp=i * 0.05)
        else:
            depth = scene.depth(R, t)
            state, _ = sys_.track_rgbd(img, depth, timestamp=i * 0.05)
        states.append(state)

    from ygz_tpu.eval.ate import ate_rmse
    est, gt = [], []
    for rec, (R, t) in zip(sys_.trajectory, poses):
        if rec.state != "OK":
            continue
        est.append(-rec.R.T @ rec.t)
        gt.append(-R.T @ t)
    with_scale = mode == "mono"
    rmse, _ = ate_rmse(np.array(est), np.array(gt), with_scale=with_scale)
    ok = sum(1 for s in states if s == "OK")
    align = "7-DoF (mono scale)" if with_scale else "6-DoF (metric)"
    return rmse, ok, len(states), align


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(ROOT, "ATE_r02.md"))
    args = ap.parse_args()

    rows = []
    for mode in ("mono", "stereo", "rgbd", "mono-vi"):
        for nuisance in (False, True):
            t0 = time.time()
            rmse, ok, n, align = run_mode(mode, nuisance)
            rows.append((mode, "yes" if nuisance else "no", rmse, ok, n,
                         align))
            print(f"{mode:8s} nuis={nuisance}: ATE {rmse:.4f}  "
                  f"({ok}/{n} OK, {time.time() - t0:.0f}s)", flush=True)

    with open(args.out, "w") as f:
        f.write("# ATE accuracy table (synthetic protocol)\n\n")
        f.write("Real datasets are not fetchable in this environment; this "
                "table gates the BASELINE ATE targets on rendered scenes "
                "with photometric nuisances (tools/ate_report.py; Horn-"
                "aligned ATE RMSE as in the reference's "
                "evaluate_ate_euroc.py). Trajectory span ~1.5 world units "
                "(~scene depth 5).\n\n")
        f.write("| mode | nuisances | ATE RMSE | frames OK | alignment |\n")
        f.write("|---|---|---|---|---|\n")
        for mode, nu, rmse, ok, n, align in rows:
            f.write(f"| {mode} | {nu} | {rmse:.4f} | {ok}/{n} | {align} |\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
