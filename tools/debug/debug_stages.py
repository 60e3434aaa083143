"""Per-stage motion-error breakdown: velocity model vs sparse align vs direct
track, each compared to the GT inter-frame motion (scaled to map units via
the previous frame's estimated pose)."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import sys
sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

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

    prev_gt = None
    for i, (R, t) in enumerate(poses):
        img = scene.render(R, t)
        state, T = sys_.track_monocular(img, timestamp=i * 0.05)
        if prev_gt is not None and "pred_align" in tr.debug:
            # gt relative motion cur<-last (rotation exact; translation needs
            # the map scale -> estimate from est relative translation norms)
            Rg, tg = R, t
            Rl, tl = prev_gt
            R_rel_gt = Rg @ Rl.T
            t_rel_gt = tg - R_rel_gt @ tl

            lastR, lastt = tr.debug["last_pose"]

            def rel(Rp, tp):
                Rr = Rp @ lastR.T
                tr_ = tp - Rr @ lastt
                return Rr, tr_

            scale = None
            rows = []
            for name, (Rp, tp) in [("vel", tr.debug["pred_vel"]),
                                   ("aln", tr.debug["pred_align"]),
                                   ("trk", (T[:3, :3], T[:3, 3]))]:
                Rr, trel = rel(Rp, tp)
                if scale is None:
                    pass
                rot_err = np.degrees(np.arccos(np.clip(
                    (np.trace(Rr @ R_rel_gt.T) - 1) / 2, -1, 1)))
                rows.append((name, trel, rot_err))
            # common scale: match trk translation norm to gt norm
            s = np.linalg.norm(rows[2][1]) / max(np.linalg.norm(t_rel_gt),
                                                 1e-9)
            out = []
            for name, trel, rot_err in rows:
                terr = np.linalg.norm(trel - t_rel_gt * s)
                out.append(f"{name}: t_err={terr:.4f} rot={rot_err:.3f}")
            print(f"f{i:03d} {state:4s} inl={tr.debug.get('n_inliers', 0):3d} "
                  f"scale={s:.3f} " + "  ".join(out))
        prev_gt = (R, t)


if __name__ == "__main__":
    main()
