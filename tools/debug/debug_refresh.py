"""Emulate the KF patch-refresh path in isolation:
view0: exact map + patches -> track into view1 -> refresh patches at the
refined uv from view1's pyramid -> track into view2 with gt prediction.
Any pose bias at view2 implicates the refresh path."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import sys
sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from ygz_tpu.ops.image import build_pyramid
from ygz_tpu.ops import fast, select
from ygz_tpu.frontend.direct_tracker import (track_local_map_direct,
                                             capture_ref_patches)
from synthetic import SmoothScene


def main():
    scene = SmoothScene(seed=11)
    intr = (scene.f, scene.f, scene.cx, scene.cy)
    R0 = np.eye(3, dtype=np.float32)
    t0 = np.zeros(3, np.float32)
    I0 = scene.render(R0, t0)
    pyr0 = build_pyramid(jnp.asarray(I0), 4)

    score = fast.nonmax_3x3(fast.fast_score_map(pyr0[0], 15.0))
    uv, s, valid = select.select_grid_topk(score, cell=20, max_per_cell=2,
                                           max_kp=512, border=30)
    uv = np.asarray(uv)
    valid = np.asarray(valid)
    Xw = scene.backproject(R0, t0, uv)
    lvl = np.zeros(len(uv), np.int32)
    patches0 = capture_ref_patches(pyr0, jnp.asarray(uv), jnp.asarray(lvl), 4)

    # ---- view1: track with patches from view0
    c1 = np.array([0.12, 0.0, 0.0], np.float32)
    R1 = R0
    t1 = -R1 @ c1
    I1 = scene.render(R1, t1)
    pyr1 = build_pyramid(jnp.asarray(I1), 4)
    res1 = track_local_map_direct(
        pyr1, jnp.asarray(R1), jnp.asarray(t1),
        jnp.asarray(Xw), jnp.asarray(valid), patches0,
        jnp.asarray(uv), jnp.asarray(lvl),
        jnp.asarray(np.tile(R0, (len(uv), 1, 1))),
        jnp.asarray(np.tile(t0, (len(uv), 1))), intr, n_levels=4)
    c1_est = -np.asarray(res1.R).T @ np.asarray(res1.t)
    print("view1 pose err:", np.round(c1_est - c1, 5),
          "tracked:", int(np.asarray(res1.tracked).sum()))

    # ---- refresh: capture patches from view1 at the REFINED uv, with the
    # ESTIMATED pose (like a KF refresh); level = search level used
    uv1 = np.asarray(res1.uv)
    lvl1 = np.asarray(res1.level)
    tracked = np.asarray(res1.tracked)
    patches1 = capture_ref_patches(pyr1, jnp.asarray(uv1), jnp.asarray(lvl1), 4)
    R1e = np.asarray(res1.R)
    t1e = np.asarray(res1.t)

    # ---- view2: track with refreshed patches; prediction biased by dpred.
    # correction gain kappa = 1 - |pose_err| / |pred_err|; the velocity
    # model amplifies uncorrected error ~2x/frame, so kappa < 0.5 diverges.
    for step2 in [0.16, 0.24]:
        for dpred in [np.zeros(3, np.float32),
                      np.array([0.02, 0.0, 0.0], np.float32),
                      np.array([0.0, 0.0, 0.02], np.float32)]:
            c2 = np.array([step2, 0.0, 0.0], np.float32)
            R2 = R0
            t2 = -R2 @ c2
            I2 = scene.render(R2, t2)
            pyr2 = build_pyramid(jnp.asarray(I2), 4)
            t2p = -R2 @ (c2 + dpred)
            res2 = track_local_map_direct(
                pyr2, jnp.asarray(R2), jnp.asarray(t2p),
                jnp.asarray(Xw), jnp.asarray(tracked), patches1,
                jnp.asarray(uv1), jnp.asarray(lvl1),
                jnp.asarray(np.tile(R1e, (len(uv), 1, 1))),
                jnp.asarray(np.tile(t1e, (len(uv), 1))), intr, n_levels=4)
            c2_est = -np.asarray(res2.R).T @ np.asarray(res2.t)
            uv_true, _ = scene.project(R2, t2, Xw)
            trk2 = np.asarray(res2.tracked)
            err = np.linalg.norm(np.asarray(res2.uv)[trk2] - uv_true[trk2],
                                 axis=1)
            perr = np.linalg.norm(c2_est - c2)
            pde = np.linalg.norm(dpred)
            kappa = 1 - perr / pde if pde > 0 else float("nan")
            print(f"view2(step={step2}, dpred={dpred}) "
                  f"pose_err={np.round(c2_est - c2, 5)} kappa={kappa:.3f} "
                  f"tracked={trk2.sum()} uv med={np.median(err):.3f}")


if __name__ == "__main__":
    main()
