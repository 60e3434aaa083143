"""Long-sequence endurance run with LIVE loop closures (VERDICT r3 #7 +
r5 #5).

The reference runs full EuRoC sequences (~3,600 frames on MH01,
/root/reference/Examples/Monocular/mono_euroc_vins.cc:48-196) and closes
loops routinely (src/LoopClosing.cc:369-544). This drives a 2,000+ frame
synthetic TWO-SQUARE circuit at EuRoC cadence (20 fps) through the full
system — microbatched tracking, async mapping tail, BoW indexing, loop
closing. The path laps square A, then laps square B on the other side of
the origin: each lap's legs are long enough to be mutually
covisibility-disconnected, so both returns to the origin region present as
real loop closures (>= 2 revisits). Mild photometric nuisances are ON by
default — on perfectly clean renders the direct tracker drifts too little
to ever break covisibility with the old map, and a revisit then re-binds
implicitly instead of presenting as a loop (the r4 clean-circuit result;
the same happens in the reference).

Gates: frames_ok fraction, 7-DoF ATE, map growth past the initial 256-KF
capacity, mapping-tail drain time, n_loops_closed >= 2, and a recorded
pre/post-correction ATE per closure (`loop_events`).

Writes LONGRUN_r{N}.json at the repo root.

Usage:
  JAX_PLATFORMS=cpu python tools/long_sequence.py --frames 2240  (~40 min)
  python tools/long_sequence.py --frames 2240                    (TPU)
"""
import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402
import jax  # noqa: E402

# hermetic by default: the endurance artifact is a CPU run (the env var
# alone does not displace the auto-registered TPU plugin on this machine)
if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")


D_LEG = 11.0      # leg length at the design length (see DESIGN_FRAMES)
DESIGN_FRAMES = 2240  # frames the D_LEG legs are sized for; shorter runs
                      # scale the legs down so per-frame camera speed (the
                      # thing tracking actually sees) is length-invariant


def leg_length(n_total):
    return D_LEG * min(1.0, n_total / DESIGN_FRAMES)


def pose(i, n_total):
    """Two-square circuit: lap square A ((0,0)->(D,0)->(D,D)->(0,D)->back),
    then lap square B mirrored through the origin. Both returns to (0,0)
    are covisibility-disconnected revisits — live loop-closure
    opportunities (VERDICT r5 #5). EuRoC-like lateral motion with yaw/pitch
    wobble against a ~5-unit-deep scene."""
    import jax.numpy as jnp
    from ygz_tpu.geometry import lie

    D = leg_length(n_total)
    wp = [(0, 0), (D, 0), (D, D), (0, D), (0, 0),
          (-D, 0), (-D, -D), (0, -D), (0, 0)]
    n_legs = len(wp) - 1
    leg = n_total / n_legs
    k = min(int(i // leg), n_legs - 1)
    a = (i - k * leg) / leg
    x0, y0 = wp[k]
    x1, y1 = wp[k + 1]
    yaw = 0.05 * np.sin(i * 0.11)
    pitch = 0.02 * np.sin(i * 0.07)
    R = np.asarray(lie.so3_exp(jnp.asarray(
        np.array([pitch, yaw, 0.0], np.float32))))
    c = np.array([x0 + (x1 - x0) * a, y0 + (y1 - y0) * a,
                  0.15 * np.sin(i * 0.05)], np.float32)
    return R, (-R @ c).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2240)
    ap.add_argument("--out", default=os.path.join(ROOT, "LONGRUN_r05.json"))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--no-nuisance", action="store_true",
                    help="perfectly clean renders (drift may be too small "
                         "for any loop to present; see module docstring)")
    args = ap.parse_args()

    from ygz_tpu.utils.compile_cache import enable
    enable()
    from ygz_tpu.geometry import camera as cam_mod
    from ygz_tpu.system import System, Sensor
    from ygz_tpu.frontend.tracker import TrackerConfig
    from ygz_tpu.utils.synthetic import SmoothScene, Nuisance
    from ygz_tpu.backend.loopclosing import LoopCloser
    from ygz_tpu.eval.ate import ate_rmse

    W, H, F = 752, 480, 458.0
    n = args.frames
    # texture must cover both squares (span 2*D_LEG) + ~8 units of view
    # margin at 60 px/unit (run 1 drove off a fixed-size texture at frame
    # ~1650 and died textureless)
    tex = int(2 * (leg_length(n) + 8.0) * 60)
    scene = SmoothScene(seed=11, w=W, h=H, f=F, tex_size=tex)
    nuis = None if args.no_nuisance else Nuisance(seed=3)
    cam = cam_mod.Camera.make(scene.f, scene.f, scene.cx, scene.cy, W, H)
    # kf_max_gap=6 forces >=n/6/2 keyframes so the 256-KF capacity is
    # exceeded well before the end (map growth under test)
    cfg = TrackerConfig(async_mapping=True, track_batch=args.batch,
                        kf_max_gap=6)
    sys_ = System(cam, Sensor.MONOCULAR, config=cfg)

    # ---- per-closure ATE evidence (VERDICT r5 #5): wrap the loop closer
    # so each accepted correction records trajectory ATE just before and
    # just after the essential-graph rewrite. Runs on the mapping worker
    # under the map lock; recovered_pose re-enters the same RLock.
    gt_centres = []
    loop_events = []
    orig_pk = LoopCloser.process_keyframe

    def traj_ate():
        recs = sys_.trajectory
        m = min(len(recs), len(gt_centres))
        est, gt = [], []
        for rec, c_gt in zip(recs[:m], gt_centres[:m]):
            if rec.state != "OK":
                continue
            R, t = sys_.tracker.recovered_pose(rec)
            est.append(-R.T @ t)
            gt.append(c_gt)
        if len(est) < 10:
            return float("nan")
        rmse, _ = ate_rmse(np.asarray(est), np.asarray(gt), with_scale=True)
        return float(rmse)

    def spy_pk(self, smap, kf, bow_vec):
        n_before = len(self.events)
        pre = None
        # probe detection without mutating the consistency-group state
        # (detect() advances ConsistentGroup counts; running it twice per
        # keyframe would double-count consistency)
        saved_groups = list(self._consistent_groups)
        cand = self.detect(smap, kf, bow_vec)
        self._consistent_groups = saved_groups
        if cand is not None:
            pre = traj_ate()          # ATE at detection time (pre-correct)
        fired = orig_pk(self, smap, kf, bow_vec)
        if fired and len(self.events) > n_before:
            ev = self.events[-1]
            ev["ate_pre"] = round(pre, 4) if pre is not None else None
            ev["ate_post"] = round(traj_ate(), 4)
            loop_events.append(ev)
            print(f"  loop closed: {ev}", flush=True)
        return fired

    LoopCloser.process_keyframe = spy_pk

    t0 = time.perf_counter()
    buf_img, buf_ts = [], []
    t_render = 0.0
    for i in range(n):
        R, t = pose(i, n)
        t1 = time.perf_counter()
        img = np.clip(scene.render(R, t, backend="numpy"), 0,
                      255).astype(np.uint8)
        if nuis is not None:
            img = np.clip(np.asarray(nuis.apply(img.astype(np.float32), i)),
                          0, 255).astype(np.uint8)
        t_render += time.perf_counter() - t1
        gt_centres.append(-R.T @ t)
        buf_img.append(img)
        buf_ts.append(i * 0.05)
        if len(buf_img) == args.batch:
            sys_.track_monocular_batch(buf_img, buf_ts)
            buf_img, buf_ts = [], []
        if i and i % 400 == 0:
            st = sys_.tracker.stats()
            print(f"frame {i}: kf={st['n_kf']} pt={st['n_pt']} "
                  f"loops={st['n_loops_closed']} "
                  f"{i / (time.perf_counter() - t0 - t_render):.1f} fps "
                  f"(excl. render)", flush=True)
    for im, ts in zip(buf_img, buf_ts):
        sys_.track_monocular(im, ts)
    track_s = time.perf_counter() - t0 - t_render
    t2 = time.perf_counter()
    sys_.shutdown()
    drain_s = time.perf_counter() - t2

    st = sys_.tracker.stats()
    est, gt = [], []
    for rec, c_gt in zip(sys_.trajectory, gt_centres):
        if rec.state != "OK":
            continue
        R, t = sys_.tracker.recovered_pose(rec)
        est.append(-R.T @ t)
        gt.append(c_gt)
    frames_ok = len(est)
    from ygz_tpu.eval.ate import horn_align
    scale, _, _ = horn_align(np.asarray(est), np.asarray(gt),
                             with_scale=True)
    rmse, _ = ate_rmse(np.asarray(est), np.asarray(gt), with_scale=True)
    out = {
        "frames": n,
        "frames_ok": frames_ok,
        "ok_fraction": round(frames_ok / n, 4),
        "ate_rmse_7dof": round(float(rmse), 4),
        "ate_scale": round(float(scale), 4),
        "n_keyframes_final": st["n_kf"],
        "map_grew_past_initial_capacity": bool(
            sys_.tracker.map.max_kf > 256),
        "max_kf_capacity_final": int(sys_.tracker.map.max_kf),
        "n_points_final": st["n_pt"],
        "n_loops_closed": st["n_loops_closed"],
        "loop_events": loop_events,
        "nuisances": nuis is not None,
        "track_wall_s": round(track_s, 1),
        "track_fps_excl_render": round(n / track_s, 2),
        "mapping_drain_s": round(drain_s, 1),
        "render_s": round(t_render, 1),
        "ba_dropped": st["ba_dropped"],
        "platform": __import__("jax").devices()[0].platform,
    }
    print(json.dumps(out, indent=1))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"-> {args.out}")
    # gates (soft here; the test wrapper asserts)
    assert frames_ok > 0.9 * n, f"only {frames_ok}/{n} frames OK"
    assert rmse < 0.25, f"ATE {rmse}"


if __name__ == "__main__":
    main()
