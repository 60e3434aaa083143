"""Isolated direct-tracker bias probe: exact plane geometry, exact patches.

For increasing baselines between the patch-capture keyframe and the current
frame, track with the GT pose as prediction and measure the pose error of
track_local_map_direct. Any systematic error here is a warp/alignment bug,
not a feedback effect.
"""
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
from synthetic import PlaneScene


def main():
    scene = PlaneScene(seed=11)
    intr = (scene.f, scene.f, scene.cx, scene.cy)
    R0 = np.eye(3, dtype=np.float32)
    t0 = np.zeros(3, np.float32)
    I0 = scene.render(R0, t0)
    pyr0 = build_pyramid(jnp.asarray(I0), 4)

    # keypoints + exact plane geometry
    score = fast.nonmax_3x3(fast.fast_score_map(pyr0[0], 15.0))
    uv, s, valid = select.select_grid_topk(score, cell=20, max_per_cell=2,
                                           max_kp=512, border=24)
    uv = np.asarray(uv)
    valid = np.asarray(valid)
    Xw = scene.backproject(R0, t0, uv)          # exact 3-D on plane
    lvl = np.zeros(len(uv), np.int32)
    patches = capture_ref_patches(pyr0, jnp.asarray(uv), jnp.asarray(lvl), 4)

    from ygz_tpu.geometry import lie

    for step, yaw in [(0.1, 0.02), (0.3, 0.03)]:
        # camera moves sideways `step` world units (plane at z=5) + yaw
        R1 = np.asarray(lie.so3_exp(jnp.asarray(
            np.array([0.0, yaw, 0.0], np.float32))))
        c1 = np.array([step, 0.0, 0.0], np.float32)
        t1 = -R1 @ c1
        I1 = scene.render(R1, t1)
        pyr1 = build_pyramid(jnp.asarray(I1), 4)

        rng = np.random.default_rng(0)
        for variant in ["exact", "pred_z+2%", "depth3%", "both"]:
            Rp, tp = R1, t1
            Xin = Xw
            if variant in ("pred_z+2%", "both"):
                c_biased = c1 + np.array([0.0, 0.0, 0.1], np.float32)
                tp = -R1 @ c_biased
            if variant in ("depth3%", "both"):
                Xin = Xw * (1.0 + 0.03 * rng.standard_normal(
                    (len(Xw), 1)).astype(np.float32))
            res = track_local_map_direct(
                pyr1, jnp.asarray(Rp), jnp.asarray(tp),
                jnp.asarray(Xin), jnp.asarray(valid), patches,
                jnp.asarray(uv), jnp.asarray(lvl),
                jnp.asarray(np.tile(R0, (len(uv), 1, 1))),
                jnp.asarray(np.tile(t0, (len(uv), 1))), intr, n_levels=4)
            c_est = -np.asarray(res.R).T @ np.asarray(res.t)
            c_gt = c1
            uv_true, _ = scene.project(R1, t1, Xw)
            tracked = np.asarray(res.tracked)
            uv_est = np.asarray(res.uv)
            err = np.linalg.norm(uv_est[tracked] - uv_true[tracked], axis=1)
            print(f"step={step:4.2f} yaw={yaw:+.2f} {variant:10s} "
                  f"tracked={tracked.sum():3d}/{valid.sum()} "
                  f"pose_err={np.round(c_est - c_gt, 4)} "
                  f"uv med={np.median(err):.3f} p90={np.percentile(err,90):.2f}")


if __name__ == "__main__":
    main()
