"""Live link-degradation forensics: replay the bench's timed child with a
per-chunk log of dispatch RTT, upload bandwidth, chunk wall time and
failover events, flushed as it happens — to localize WHAT poisons the
session (r5: three bench runs degraded mid-run despite compile-clean
steady state and per-session failover).

Usage (expects /tmp/ygz_bench_frames.npy from a prior bench run, else
renders): python tools/link_forensics.py
"""
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402

W, H, F = 752, 480, 458.0
BATCH = 32
FRAMES_NPY = "/tmp/ygz_bench_frames.npy"


def main():
    from ygz_tpu.utils.compile_cache import enable as _enable_cache
    _enable_cache()
    import jax
    import jax.numpy as jnp
    from ygz_tpu.utils import link
    from ygz_tpu.geometry import camera as cam_mod
    from ygz_tpu.system import System, Sensor
    from ygz_tpu.frontend.tracker import TrackerConfig

    # name big compile/load events live
    import logging
    import re as _re

    class _Log(logging.Handler):
        def emit(self, rec):
            m = _re.match(r"Finished XLA compilation of (\S+) in "
                          r"([0-9.]+) sec", rec.getMessage())
            if m and float(m.group(2)) > 1.0:
                print(f"    !! compile event {m.group(1)}: "
                      f"{float(m.group(2)):.1f}s", flush=True)

    jax.config.update("jax_log_compiles", True)
    h = _Log()
    h.setLevel(logging.DEBUG)
    for name in ("jax._src.dispatch", "jax._src.interpreters.pxla"):
        logging.getLogger(name).addHandler(h)
        logging.getLogger(name).setLevel(logging.DEBUG)

    frames = np.load(FRAMES_NPY)
    ts = [i * 0.05 for i in range(len(frames))]
    cam = cam_mod.Camera.make(F, F, W / 2.0 - 0.5, H / 2.0 - 0.5, W, H)
    cfg = TrackerConfig(async_mapping=True, track_batch=BATCH)
    sys_ = System(cam, Sensor.MONOCULAR, config=cfg)

    big = np.zeros((BATCH, H, W), np.uint8)

    def probes(tag):
        r = link.probe_rtt(reps=2)
        t0 = time.perf_counter()
        x = jnp.asarray(big)
        jax.block_until_ready(x)
        up_ms = (time.perf_counter() - t0) * 1e3
        print(f"  [{tag}] rtt {r:8.3f} ms   12MB-upload {up_ms:8.1f} ms",
              flush=True)
        return r

    print(f"start: rtt {link.probe_rtt():.3f} ms", flush=True)
    n_rec = 0
    i = 0
    total = len(frames)
    while i < total:
        t1 = time.perf_counter()
        r = sys_.track_monocular_batch(list(frames[i: i + BATCH]),
                                       ts[i: i + BATCH])
        dt = time.perf_counter() - t1
        i += len(r)
        st = sys_.tracker.stats()
        print(f"chunk @{i:3d}: {len(r):2d} frames in {dt:6.2f}s  "
              f"kf={st['n_kf']} state={st['state']}", flush=True)
        rr = probes("post-chunk")
        if rr > 2.0 and n_rec < 3:
            t1 = time.perf_counter()
            sys_.reconnect()
            n_rec += 1
            print(f"  >> reconnect #{n_rec} in "
                  f"{time.perf_counter() - t1:.2f}s", flush=True)
            probes("post-swap")
    sys_.shutdown()
    print(f"done: {n_rec} reconnects, final rtt {link.probe_rtt():.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
