"""Synthetic textured-plane scene with exact image formation.

Used across the direct-tracking / end-to-end tests: a camera observes a
fronto-parallel textured plane at z=PLANE_Z in the world frame; any view can
be rendered exactly by inverse-warping the texture, and every pixel has known
depth — which gives analytic ground truth for patch alignment, sparse image
alignment, pose optimization and full VO runs.
"""
import numpy as np
import jax.numpy as jnp

from ygz_tpu.ops import image as imops

PLANE_Z = 5.0
TEX_SCALE = 60.0  # texture pixels per world unit


def make_texture(size=1600, seed=0, blur_sigma=2.0):
    rng = np.random.default_rng(seed)
    tex = rng.uniform(0, 255, (size, size)).astype(np.float32)
    t = imops.gaussian_blur(jnp.asarray(tex), 9, blur_sigma)
    # boost contrast after blur
    t = (t - t.mean()) * 3.0 + 128.0
    return np.clip(np.asarray(t), 0, 255).astype(np.float32)


class PlaneScene:
    """Camera intrinsics + plane + texture; render views at arbitrary poses.

    Pose convention: (R, t) maps WORLD -> CAMERA (like the reference's Tcw).
    World frame = first camera frame; plane is z = PLANE_Z.
    """

    def __init__(self, w=640, h=480, f=400.0, seed=0, tex_size=1600):
        self.w, self.h, self.f = w, h, float(f)
        self.cx, self.cy = w / 2.0 - 0.5, h / 2.0 - 0.5
        self.K = np.array([[f, 0, self.cx], [0, f, self.cy], [0, 0, 1]],
                          np.float32)
        self.tex = make_texture(tex_size, seed)
        self.tex_c = tex_size / 2.0

    def world_to_tex(self, Xw):
        """World points [N,3] on the plane -> texture pixel coords [N,2]."""
        return np.stack([Xw[..., 0] * TEX_SCALE + self.tex_c,
                         Xw[..., 1] * TEX_SCALE + self.tex_c], axis=-1)

    def render(self, R, t):
        """Render the view from pose (R,t) (world->cam). Returns [h,w] f32."""
        R = np.asarray(R, np.float32)
        t = np.asarray(t, np.float32)
        ys, xs = np.mgrid[0: self.h, 0: self.w].astype(np.float32)
        # camera ray for each pixel
        d_cam = np.stack([(xs - self.cx) / self.f, (ys - self.cy) / self.f,
                          np.ones_like(xs)], axis=-1)  # [h,w,3]
        Rwc = R.T
        o_w = -Rwc @ t                   # camera centre in world
        d_w = d_cam @ Rwc.T              # ray directions in world
        lam = (PLANE_Z - o_w[2]) / d_w[..., 2]
        Xw = o_w[None, None, :] + lam[..., None] * d_w
        uv_tex = self.world_to_tex(Xw)
        img = imops.sample_bilinear(jnp.asarray(self.tex),
                                    jnp.asarray(uv_tex))
        return np.asarray(img)

    def depth(self, R, t):
        """Per-pixel depth map for pose (R,t)."""
        R = np.asarray(R, np.float32)
        t = np.asarray(t, np.float32)
        ys, xs = np.mgrid[0: self.h, 0: self.w].astype(np.float32)
        d_cam = np.stack([(xs - self.cx) / self.f, (ys - self.cy) / self.f,
                          np.ones_like(xs)], axis=-1)
        Rwc = R.T
        o_w = -Rwc @ t
        d_w = d_cam @ Rwc.T
        lam = (PLANE_Z - o_w[2]) / d_w[..., 2]
        # depth = z-coordinate in camera frame of the intersection
        Xw = o_w[None, None, :] + lam[..., None] * d_w
        Xc = Xw @ R.T + t
        return Xc[..., 2].astype(np.float32)

    def project(self, R, t, Xw):
        """World points -> pixels for pose (R,t). Returns uv [N,2], z [N]."""
        Xc = Xw @ np.asarray(R).T + np.asarray(t)
        u = self.f * Xc[:, 0] / Xc[:, 2] + self.cx
        v = self.f * Xc[:, 1] / Xc[:, 2] + self.cy
        return np.stack([u, v], axis=-1).astype(np.float32), Xc[:, 2]

    def backproject(self, R, t, uv):
        """Pixels in view (R,t) -> world points on the plane."""
        uv = np.asarray(uv, np.float32)
        d_cam = np.stack([(uv[:, 0] - self.cx) / self.f,
                          (uv[:, 1] - self.cy) / self.f,
                          np.ones_like(uv[:, 0])], axis=-1)
        Rwc = np.asarray(R).T
        o_w = -Rwc @ np.asarray(t)
        d_w = d_cam @ Rwc.T
        lam = (PLANE_Z - o_w[2]) / d_w[:, 2]
        return (o_w[None, :] + lam[:, None] * d_w).astype(np.float32)
