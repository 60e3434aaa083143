"""Sim(3) operations + Horn closed-form similarity estimation.

Covers the reference's Sim3 usage (Thirdparty/g2o sim3.h types and
Sim3Solver /root/reference/src/Sim3Solver.cc — Horn's closed-form absolute
orientation + RANSAC between matched map-point sets). Sim3 elements are
(R [3,3], t [3], s scalar) acting as x -> s R x + t.

The 7-DoF tangent convention for the pose-graph optimizer is
xi = [upsilon(3), omega(3), sigma(1)] with a first-order retraction
(exact exp/log only in rotation; translation uses the SE3-style V matrix and
scale is exponential) — adequate for Gauss-Newton with good initialization,
which is how the essential-graph optimization uses it.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .lie import so3_exp, so3_log, so3_left_jacobian


def sim3_apply(R, t, s, X):
    return s * (X @ R.T) + t


def sim3_mul(Ra, ta, sa, Rb, tb, sb):
    """(a * b)(x) = a(b(x)) = sa Ra (sb Rb x + tb) + ta."""
    return Ra @ Rb, sa * (Ra @ tb) + ta, sa * sb


def sim3_inv(R, t, s):
    Rt = R.T
    si = 1.0 / s
    return Rt, -si * (Rt @ t), si


def sim3_exp(xi):
    """First-order-consistent exp: [u, w, sigma] -> (R, t, s)."""
    u, w, sigma = xi[:3], xi[3:6], xi[6]
    R = so3_exp(w)
    V = so3_left_jacobian(w)  # scale-coupling terms dropped (1st order)
    return R, V @ u, jnp.exp(sigma)


def sim3_log(R, t, s):
    from .lie import _left_jacobian_inv, so3_log_safe

    w = so3_log_safe(R)
    u = _left_jacobian_inv(w) @ t
    return jnp.concatenate([u, w, jnp.log(s)[None]])


def horn_sim3(Xa, Xb, mask, with_scale=True):
    """Closed-form similarity aligning Xa -> Xb: find (R, t, s) minimizing
    ||s R Xa + t - Xb|| over masked rows. Batched-friendly (pure jnp).

    Returns (R, t, s). Mirrors Sim3Solver::ComputeSim3's Horn method.
    """
    w = mask.astype(Xa.dtype)[:, None]
    n = jnp.maximum(jnp.sum(w), 1.0)
    mu_a = jnp.sum(Xa * w, axis=0) / n
    mu_b = jnp.sum(Xb * w, axis=0) / n
    ac = (Xa - mu_a) * w
    bc = (Xb - mu_b) * w
    H = bc.T @ ac / n
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    D = jnp.diag(jnp.stack([jnp.ones((), Xa.dtype), jnp.ones((), Xa.dtype), d]))
    R = U @ D @ Vt
    if with_scale:
        var_a = jnp.sum(ac * ac) / n
        s = jnp.sum(S * jnp.diag(D)) / jnp.maximum(var_a, 1e-12)
    else:
        s = jnp.array(1.0, Xa.dtype)
    t = mu_b - s * (R @ mu_a)
    return R, t, s


def sim3_ransac(Xa, Xb, mask, key, num_iters=300, chi2_px=None,
                uv_a=None, uv_b=None, proj_a=None, proj_b=None,
                th_a=9.21, th_b=9.21, with_scale=True):
    """RANSAC over 3-point Horn hypotheses (Sim3Solver semantics: inliers by
    REPROJECTION error in both frames when projections are provided,
    otherwise by 3-D distance).

    proj_a/proj_b: optional callables X[N,3] -> uv[N,2] for the two cameras.
    Returns (R, t, s, inliers [N] bool, n_inliers).
    """
    n = Xa.shape[0]
    probs = mask.astype(jnp.float32)
    probs = probs / jnp.maximum(jnp.sum(probs), 1.0)
    keys = jax.random.split(key, num_iters)
    idx = jax.vmap(lambda k: jax.random.choice(
        k, n, shape=(3,), replace=False, p=probs))(keys)

    def hypo(ids):
        m3 = jnp.ones(3, bool)
        return horn_sim3(Xa[ids], Xb[ids], m3, with_scale)

    Rs, ts, ss = jax.vmap(hypo)(idx)

    def score(R, t, s):
        if proj_a is not None and uv_a is not None:
            Ri, ti, si = sim3_inv(R, t, s)
            ea = uv_a - proj_a(sim3_apply(Ri, ti, si, Xb))
            eb = uv_b - proj_b(sim3_apply(R, t, s, Xa))
            inl = ((jnp.sum(ea * ea, -1) < th_a)
                   & (jnp.sum(eb * eb, -1) < th_b) & mask)
        else:
            e = sim3_apply(R, t, s, Xa) - Xb
            inl = (jnp.sum(e * e, -1) < th_b) & mask
        return jnp.sum(inl), inl

    counts, inls = jax.vmap(score)(Rs, ts, ss)
    best = jnp.argmax(counts)
    # refine on inliers with full Horn
    R, t, s = horn_sim3(Xa, Xb, inls[best], with_scale)
    n_i, inl = score(R, t, s)
    return R, t, s, inl, n_i
