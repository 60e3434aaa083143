"""Tracking benchmark on the real chip.

Headline: steady-state `System.track_monocular_batch()` throughput over an
EuRoC-cadence synthetic 752x480 sequence (drone-like ~1 m/s at 20 fps: 5 cm
+ ~0.025 rad yaw per frame): the FULL per-frame system — pyramid build,
sparse alignment, direct local-map tracking (fused as one device program per
8-frame microbatch), host bookkeeping, and the keyframe tail (feature
extraction, triangulation, fusion, local BA, culling, BoW) amortized at the
real keyframe rate with the async mapping worker overlapping the tail like
the reference's LocalMapping thread. Rendering happens before the timed
loop; warmup (AOT compilation of every steady-state program + link-recovery
wait, see ygz_tpu/warmup.py) is reported separately.

Baseline: the reference tracks at ~20 ms/frame (~50 FPS) after its native
FAST integration (Note.md:132, BASELINE.md). vs_baseline = fps / 50; the
BASELINE.json target is >3x (150 FPS).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

# persistent jit cache (repo-local): compiles from any previous run are
# reused, so warmup measures cache loads rather than server XLA compiles
# over the device tunnel — cache loads do not degrade the link's RTT,
# fresh server compiles do (ygz_tpu/utils/compile_cache.py)
from ygz_tpu.utils.compile_cache import enable as _enable_cache
_enable_cache()

W, H, F = 752, 480, 458.0
BATCH = 8

# fresh-compile accounting: a server-side XLA compile in THIS process both
# stalls the caller and degrades the tunnel's dispatch RTT for minutes, so
# the steady state must be 100% persistent-cache hits. Reported in the
# output JSON so every run's compile hygiene is auditable (VERDICT r3 #8).
_compile_events = {"cache_hits": 0, "cache_misses": 0}
try:
    from jax._src import monitoring as _monitoring

    def _count_event(event, **kw):
        for k in _compile_events:
            if event.endswith(k):
                _compile_events[k] += 1

    _monitoring.register_event_listener(_count_event)
except Exception:  # monitoring API moved — accounting becomes "unknown"
    _compile_events = None

# pre-compiled RTT probe (compiling a probe mid-bench would degrade the link)
_probe = jax.jit(lambda x: x + 1.0)
_px = jnp.zeros(())


def measure_rtt(reps: int = 20):
    """Per-dispatch round-trip latency of the device link. Healthy ~0.1 ms;
    degrades to 26-50 ms for minutes after server-side XLA compiles — the
    round-2 benchmark collapse. Reported so numbers are interpretable."""
    jax.block_until_ready(_probe(_px))
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(_probe(_px))
    return (time.perf_counter() - t0) / reps * 1e3


def euroc_pose(i):
    """EuRoC-MH-like cadence: ~1 m/s forward-lateral sweep + yaw wobble at
    20 fps against a scene ~5 m away (VERDICT r2 #10: the round-2 bench's
    2 cm/frame drift was gentler than real sequences)."""
    from ygz_tpu.geometry import lie

    yaw = 0.12 * np.sin(i * 0.21)
    pitch = 0.04 * np.sin(i * 0.13)
    R = np.asarray(lie.so3_exp(jnp.asarray(
        np.array([pitch, yaw, 0.0], np.float32))))
    c = np.array([0.05 * i, 0.25 * np.sin(i * 0.09), 0.3 * np.sin(i * 0.05)],
                 np.float32)
    return R, (-R @ c).astype(np.float32)


def bench_system(n_frames: int = 240, warmup_frames: int = 48,
                 verbose: bool = False):
    from ygz_tpu.geometry import camera as cam_mod
    from ygz_tpu.system import System, Sensor
    from ygz_tpu.frontend.tracker import TrackerConfig
    from ygz_tpu.utils.synthetic import SmoothScene
    from ygz_tpu.warmup import warmup_tracking, wait_link_healthy
    import sys as _sys

    def log(msg):
        if verbose:
            print(msg, file=_sys.stderr, flush=True)

    scene = SmoothScene(seed=11, w=W, h=H, f=F, tex_size=2400)
    cam = cam_mod.Camera.make(scene.f, scene.f, scene.cx, scene.cy, W, H)
    cfg = TrackerConfig(async_mapping=True, track_batch=BATCH)

    total = warmup_frames + n_frames
    t_r = time.perf_counter()
    # uint8: camera-native, 4x fewer upload bytes than f32 (361 KB/frame)
    frames = [np.clip(scene.render(*euroc_pose(i), backend="numpy"), 0,
                      255).astype(np.uint8)
              for i in range(total)]
    ts = [i * 0.05 for i in range(total)]
    log(f"rendered {total} frames in {time.perf_counter() - t_r:.1f}s")

    # ---- AOT warmup in a SUBPROCESS: XLA server compiles degrade the
    # issuing channel's RTT for minutes (measured 0.1 -> 26-50 ms), so the
    # compiles run on a throwaway channel and only populate the shared
    # persistent cache; this process then loads pure cache hits ----------
    import subprocess
    import sys as _s
    t_w = time.perf_counter()
    subprocess.run(
        [_s.executable, "-m", "ygz_tpu.warmup", "--width", str(W),
         "--height", str(H), "--focal", str(F), "--batch", str(BATCH)],
        cwd="/root/repo", capture_output=True, timeout=1500)
    warmup_s = time.perf_counter() - t_w
    rtt0 = wait_link_healthy(threshold_ms=1.0, max_wait_s=900.0)
    log(f"warmup {warmup_s:.1f}s, link rtt {rtt0:.3f} ms")

    sys_ = System(cam, Sensor.MONOCULAR, config=cfg)
    for i in range(0, warmup_frames, BATCH):
        sys_.track_monocular_batch(frames[i: i + BATCH], ts[i: i + BATCH])

    # ---- timed steady-state loop ----------------------------------------
    per_chunk = []   # (n_frames_in_chunk, seconds)
    rtts = []        # link health trajectory across the run
    t0 = time.perf_counter()
    i = warmup_frames
    while i < total:
        t1 = time.perf_counter()
        r = sys_.track_monocular_batch(frames[i: i + BATCH],
                                       ts[i: i + BATCH])
        per_chunk.append((len(r), time.perf_counter() - t1))
        i += len(r)
        t2 = time.perf_counter()
        rtts.append(measure_rtt(reps=2))
        t0 += time.perf_counter() - t2   # probe time excluded from the run
    dt = time.perf_counter() - t0
    t_d = time.perf_counter()
    sys_.shutdown()   # drain the async tail (reference excludes its
    drain_s = time.perf_counter() - t_d  # LocalMapping thread time too)

    n_ok = sum(1 for rec in sys_.trajectory[warmup_frames:]
               if rec.state == "OK")
    pf_ms = np.asarray([s / n * 1e3 for n, s in per_chunk])
    stats = sys_.tracker.stats()
    return {
        "throughput_fps": n_frames / dt,
        "p50_ms": float(np.percentile(pf_ms, 50)),
        "p90_ms": float(np.percentile(pf_ms, 90)),
        "max_ms": float(pf_ms.max()),
        "warmup_s": warmup_s,
        "drain_s": drain_s,
        "frames_ok": n_ok,
        "n_kf": stats["n_kf"],
        "stage_ms": {k: round(v, 2) for k, v in stats["stage_ms"].items()},
        "rtt_before_ms": rtt0,
        "rtt_run_p50_ms": float(np.percentile(rtts, 50)),
        "rtt_run_max_ms": float(np.max(rtts)),
    }


def bench_device_pipeline():
    """Kernel-ceiling secondary number: the fused 8-frame tracking program
    alone (pyramid + sparse align + direct track + carry chain), dispatch +
    completion, no host bookkeeping."""
    from ygz_tpu.frontend.framestep import (frame_step_batch, make_carry,
                                            pack_cache_np,
                                            build_pyramid_dispatch)

    intr = (F, F, W / 2.0, H / 2.0)
    rng = np.random.default_rng(0)
    cap = 512
    imgs = np.stack([rng.uniform(0, 255, (H, W)).astype(np.uint8)
                     for _ in range(BATCH)])
    X = np.stack([rng.uniform(-2, 2, cap), rng.uniform(-1.5, 1.5, cap),
                  rng.uniform(4, 9, cap)], 1).astype(np.float32)
    uv = np.stack([intr[0] * X[:, 0] / X[:, 2] + intr[2],
                   intr[1] * X[:, 1] / X[:, 2] + intr[3]], 1).astype(
                       np.float32)
    cache = jnp.asarray(pack_cache_np(
        X, np.ones(cap, bool),
        rng.uniform(0, 255, (cap, 20, 20)).astype(np.float32),
        uv, np.zeros(cap, np.int32),
        np.tile(np.eye(3, dtype=np.float32), (cap, 1, 1)),
        np.zeros((cap, 3), np.float32)))
    pyr0 = build_pyramid_dispatch(jnp.asarray(imgs[0]), None, 4, 2.0)
    carry = make_carry(pyr0, np.eye(3), np.zeros(3), uv, X,
                       np.ones(cap, bool))
    up = jnp.asarray(imgs)
    carry, outs, _ = frame_step_batch(up, carry, cache, None, intr)
    jax.block_until_ready(outs)

    n_chunks = 12
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        up = jnp.asarray(imgs)
        carry, outs, _ = frame_step_batch(up, carry, cache, None, intr)
        _ = np.asarray(outs)
    dt = time.perf_counter() - t0
    return n_chunks * BATCH / dt


def supervise():
    """Run the real bench in a CHILD process with a stall watchdog.

    The tunneled device occasionally black-holes a process's first request
    (the process blocks in poll() forever while fresh connections work
    fine). The child prints progress lines early; if none appear within the
    window, the supervisor kills it and relaunches — a new connection
    almost always succeeds. Exits with the child's final JSON on stdout."""
    import os
    import subprocess
    import sys as _s

    for attempt in range(3):
        env = dict(os.environ, YGZ_BENCH_CHILD="1")
        child = subprocess.Popen([_s.executable, "-u", __file__],
                                 cwd=os.path.dirname(os.path.abspath(
                                     __file__)) or ".",
                                 stdout=subprocess.PIPE,
                                 stderr=subprocess.STDOUT, env=env,
                                 text=True)
        import threading
        lines = []
        got_output = threading.Event()

        def pump():
            for line in child.stdout:
                if "WARNING" not in line:
                    got_output.set()
                    lines.append(line)
                    print(line, end="", flush=True)

        th = threading.Thread(target=pump, daemon=True)
        th.start()
        # first real output (the render log line) lands within ~2 min on a
        # healthy link; a wedged first request produces nothing at all
        if not got_output.wait(timeout=420.0):
            print(f"# bench child stalled before first output "
                  f"(attempt {attempt + 1}); restarting",
                  file=_s.stderr, flush=True)
            child.kill()
            child.wait()
            continue
        child.wait(timeout=2400)
        th.join(timeout=10)
        return child.returncode
    print('{"metric": "tracking_fps_per_chip", "value": 0.0, '
          '"unit": "frames/s", "vs_baseline": 0.0, '
          '"error": "device link wedged on 3 attempts"}')
    return 1


def main():
    rtt_start = measure_rtt()
    res = bench_system(verbose=True)
    pipeline_fps = bench_device_pipeline()
    rtt_end = measure_rtt()
    fps = res["throughput_fps"]
    print(json.dumps({
        "metric": "tracking_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 50.0, 3),
        "p50_frame_ms": round(res["p50_ms"], 2),
        "p90_frame_ms": round(res["p90_ms"], 2),
        "max_frame_ms": round(res["max_ms"], 2),
        "warmup_s": round(res["warmup_s"], 1),
        "mapping_drain_s": round(res["drain_s"], 1),
        "device_pipeline_fps": round(pipeline_fps, 2),
        "frames_ok": res["frames_ok"],
        "n_keyframes": res["n_kf"],
        "stage_ms": res["stage_ms"],
        "dispatch_rtt_ms": round(rtt_start, 3),
        "rtt_after_warmup_ms": round(res["rtt_before_ms"], 3),
        "rtt_run_p50_ms": round(res["rtt_run_p50_ms"], 3),
        "rtt_run_max_ms": round(res["rtt_run_max_ms"], 3),
        "rtt_end_ms": round(rtt_end, 3),
        # fresh server compiles in THIS process (must be ~0 for a valid
        # steady-state measurement; compiles belong in the warmup
        # subprocess + persistent cache)
        "fresh_compiles": (None if _compile_events is None
                           else _compile_events["cache_misses"]),
        "compile_cache_hits": (None if _compile_events is None
                               else _compile_events["cache_hits"]),
    }))


if __name__ == "__main__":
    import os as _os
    import sys as _sys
    if _os.environ.get("YGZ_BENCH_CHILD"):
        main()
    else:
        _sys.exit(supervise())
