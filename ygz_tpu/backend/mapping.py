"""Local mapping: keyframe insertion, triangulation of new points, local BA,
map-point culling.

Host-orchestrated, device-batched re-design of the reference LocalMapping
thread (/root/reference/src/LocalMapping.cc — ProcessNewKeyFrame :886,
MapPointCulling :930, CreateNewMapPoints :978, local BA :809-817). Instead of
a background thread with queues and mutexes, `LocalMapper.insert_keyframe`
runs synchronously between tracked frames (the async overlap is a planned
host-pipeline optimization); all numerics are jitted batched calls.
"""
from __future__ import annotations

import functools
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import jax
import jax.numpy as jnp

from .mapstate import SlamMap
from .optim import local_bundle_adjustment, CHI2_MONO
from ..geometry.triangulation import triangulate_dlt, triangulation_checks
from ..ops import matching
from ..utils import profiling

# candidate-descriptor uploads ride pool threads so several link
# round-trips overlap (same trick as the tracker's image pre-upload)
_UPLOAD_POOL = ThreadPoolExecutor(max_workers=3,
                                  thread_name_prefix="ygz-map-upload")


def _put_block(a):
    d = jnp.asarray(a)
    jax.block_until_ready(d)
    return d


BA_P = 8       # local BA pose capacity
BA_L = 2048    # landmark capacity
BA_O = 4096    # observation capacity
PATCH_CAP = 512  # fixed batch size for patch capture / re-triangulation
#                  (all device calls below pad to this so every problem
#                  shape compiles exactly once — recompiles through the
#                  device tunnel cost seconds each, SURVEY §7.3)


@jax.jit
def _retriangulate(PA, PB, uvA, uvB, RA, tA, RB, tB, K, med_depth, vmask):
    """Re-triangulate PATCH_CAP padded pairs after subpixel refinement and
    re-run the acceptance gates. Fixed-shape so it compiles once."""
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    X2 = triangulate_dlt(PA, PB, uvA, uvB)
    good, _ = triangulation_checks(
        RA, tA, RB, tB, X2, uvA, uvB, fx, fy, cx, cy,
        sigma2=1.0, reproj_chi2=CHI2_MONO, min_parallax_cos=0.99996)
    zA = (X2 @ RA.T + tA)[:, 2]
    good = (good & vmask & (zA > 0.05 * med_depth)
            & (zA < 20.0 * med_depth))
    return X2, good


def _pyr_arg(pyr):
    """Normalize a pyramid argument for the stacked-aware jitted consumers:
    level tuples become jnp tuples; stacked [SH,W] buffers pass through
    (NEVER tuple() a stacked array — that would iterate its rows)."""
    if isinstance(pyr, (tuple, list)):
        return tuple(jnp.asarray(lv) for lv in pyr)
    return pyr


def _fundamental_from_poses(RA, tA, RB, tB, K):
    """F for x_B^T F x_A = 0 given world->cam poses of A and B."""
    R = RB @ RA.T
    t = tB - R @ tA
    tx = jnp.array([[0.0, -t[2], t[1]], [t[2], 0.0, -t[0]],
                    [-t[1], t[0], 0.0]])
    Kinv = jnp.linalg.inv(K)
    return Kinv.T @ tx @ R @ Kinv


def _epipolar_match_core(descA, uvA, levelA, validA,
                         descB, uvB, levelB, validB,
                         RA, tA, RB, tB, K, baseline_med_depth,
                         angA=None, angB=None):
    """Traceable body of match_epipolar_and_triangulate; also composed into
    the fused multi-partner program (triangulate_multi)."""
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    F = _fundamental_from_poses(RA, tA, RB, tB, K)

    # epipolar gate: distance of uvB to the epipolar line of uvA
    oA = jnp.ones_like(uvA[:, :1])
    l = jnp.concatenate([uvA, oA], -1) @ F.T              # lines in B [NA,3]
    num = (l[:, None, 0] * uvB[None, :, 0] + l[:, None, 1] * uvB[None, :, 1]
           + l[:, None, 2]) ** 2
    den = jnp.maximum(l[:, 0] ** 2 + l[:, 1] ** 2, 1e-12)[:, None]
    sigma2B = (2.0 ** levelB.astype(jnp.float32)) ** 2
    pen = jnp.where(num / den < 3.84 * sigma2B[None, :], 0.0, matching.BIG)

    d = matching.hamming_matrix(descA, descB, validA, validB) + pen
    idx, ok = matching.nn_match(d, max_dist=matching.TH_LOW, ratio=0.6)
    idx21, _ = matching.nn_match(d.T, max_dist=matching.TH_LOW, ratio=0.6)
    idx, mok = matching.mutual_filter(idx, idx21)
    ok = ok & mok
    if angA is not None and angB is not None:
        # rotation-histogram consistency — the reference's
        # SearchForTriangulation applies ComputeThreeMaxima over the match
        # set (src/ORBmatcher.cc:619-630, 718-730); VERDICT r4 missing #4
        ok = matching.rotation_consistency(angA, angB, idx, ok)
        idx = jnp.where(ok, idx, -1)

    uvBm = uvB[jnp.clip(idx, 0, uvB.shape[0] - 1)]
    PA = K @ jnp.concatenate([RA, tA[:, None]], 1)
    PB = K @ jnp.concatenate([RB, tB[:, None]], 1)
    Xw = triangulate_dlt(PA, PB, uvA, uvBm)
    # coarse gate: cheirality/chi2 + a mild parallax floor (~0.4 deg); the
    # caller refines the B-side match to subpixel with the direct aligner and
    # re-triangulates, which is what controls depth noise (px_err*z/(f*b))
    good, cosp = triangulation_checks(
        RA, tA, RB, tB, Xw, uvA, uvBm, fx, fy, cx, cy,
        sigma2=1.0, reproj_chi2=CHI2_MONO, min_parallax_cos=0.999976)
    # reasonable depth band relative to scene median depth
    zA = (Xw @ RA.T + tA)[:, 2]
    good = (good & ok & (zA > 0.05 * baseline_med_depth)
            & (zA < 20.0 * baseline_med_depth))
    return idx, good, Xw


@jax.jit
def match_epipolar_and_triangulate(descA, uvA, levelA, validA,
                                   descB, uvB, levelB, validB,
                                   RA, tA, RB, tB, K, baseline_med_depth,
                                   angA=None, angB=None):
    """Epipolar-gated descriptor matching + batched triangulation between two
    keyframes (reference ORBmatcher::SearchForTriangulation
    src/ORBmatcher.cc:597 + LocalMapping::CreateNewMapPoints checks).
    Optional angA/angB enable the reference's rotation-histogram filter.

    Returns (idxB_for_A [NA], good [NA], Xw [NA,3]): for each unbound feature
    of A, the matched feature in B and the triangulated world point.
    """
    return _epipolar_match_core(descA, uvA, levelA, validA, descB, uvB,
                                levelB, validB, RA, tA, RB, tB, K,
                                baseline_med_depth, angA, angB)


@functools.partial(jax.jit, static_argnames=("n_levels",))
def _triangulate_multi_jit(descA, uvA, lvlA, validA, angA, RA, tA, pyrA,
                           descB, uvB, lvlB, validB, angB, RB, tB, pyrB,
                           pactive, K, med_depth, n_levels: int):
    """Fused multi-partner triangulation: epipolar match + DLT + direct
    subpixel refinement (KLT on each partner's pyramid) + re-triangulation
    + acceptance gates, for P partner keyframes, as ONE device program —
    the round-4 tail dispatched ~4 programs per partner (VERDICT r5 #2).

    pyrA [SH,W] stacked. descB/uvB/lvlB/angB/pyrB are length-P TUPLES of
    per-partner arrays (the partners' rows live device-resident in the
    mapper's kf_dev_feats mirror — tuple args let jit consume them without
    a host restack or an extra stack dispatch). Returns (idx [P,NA],
    good [P,NA], X [P,NA,3])."""
    from ..frontend.direct_tracker import (capture_ref_patches_core,
                                           refine_matches_core)

    P = len(descB)
    NA = descA.shape[0]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    intr = (fx, fy, cx, cy)
    # the A-side uv DEFINES each candidate point; its patch (captured once
    # from the new KF) is KLT-refined into every partner
    patches = capture_ref_patches_core(pyrA, uvA, lvlA, n_levels)
    RA_n = jnp.broadcast_to(RA, (NA, 3, 3))
    tA_n = jnp.broadcast_to(tA, (NA, 3))
    PA = K @ jnp.concatenate([RA, tA[:, None]], 1)
    idx_o, good_o, X_o = [], [], []
    for p in range(P):
        idx, good, Xw = _epipolar_match_core(
            descA, uvA, lvlA, validA, descB[p], uvB[p], lvlB[p], validB[p],
            RA, tA, RB[p], tB[p], K, med_depth, angA, angB[p])
        good = good & pactive[p]
        # subpixel B-side refinement (see create_new_points rationale:
        # align2d cuts the B-side noise from ~1 px to ~0.05 px, which is
        # what lets small-parallax pairs produce usable depths)
        uv_ref, ref_ok = refine_matches_core(
            pyrB[p], RB[p], tB[p], Xw, good, patches, uvA, lvlA,
            RA_n, tA_n, intr, n_levels)
        PB = K @ jnp.concatenate([RB[p], tB[p][:, None]], 1)
        X2 = triangulate_dlt(PA, PB, uvA, uv_ref)
        g2, _ = triangulation_checks(
            RA, tA, RB[p], tB[p], X2, uvA, uv_ref, fx, fy, cx, cy,
            sigma2=1.0, reproj_chi2=CHI2_MONO, min_parallax_cos=0.99996)
        zA = (X2 @ RA.T + tA)[:, 2]
        g2 = (g2 & good & ref_ok & (zA > 0.05 * med_depth)
              & (zA < 20.0 * med_depth))
        idx_o.append(idx)
        good_o.append(g2)
        X_o.append(X2)
    return jnp.stack(idx_o), jnp.stack(good_o), jnp.stack(X_o)


class LocalMapper:
    """Synchronous local mapping over the struct-of-arrays map."""

    def __init__(self, cam, n_levels: int = 4, window: int = 6, mesh=None):
        self.cam = cam
        self.n_levels = n_levels
        self.window = window
        self.K = np.asarray(cam.K)
        self.intr = (cam.fx, cam.fy, cam.cx, cam.cy)
        self.bf = float(getattr(cam, "bf", 0.0))
        # optional jax Mesh: global BA shards its observation axis across it
        # (parallel/dist_ba.py — the distributed capability the reference
        # lacks, SURVEY.md §2.4). None = single-device path.
        self.mesh = mesh
        self._dist_ba_cache = {}
        # device-resident per-KF feature mirrors (desc/uv/level/angle/
        # valid), keyed by kf_feat_version: fuse, multi-partner
        # triangulation, BoW quantization and the ref-KF fallback all
        # consume the same ~140 KB of per-KF rows; re-uploading them per
        # call dominated the mapping tail on the tunneled link
        # (PERF_r05.md). Cleared on connection failover.
        self._dev_feats = {}
        # capacity-drop accounting (SURVEY §7.3 no-silent-caps rule;
        # VERDICT r2 #6): every landmark/observation excluded from a BA
        # problem by a capacity bucket is counted here and surfaced through
        # tracker.stats()["ba_dropped"].
        self.dropped = {"local_ba_points": 0, "local_ba_obs": 0,
                        "global_ba_points": 0, "global_ba_obs": 0,
                        "desc_update_points": 0}

    # -------------------------------------------------- device feature mirror
    def kf_dev_feats(self, smap: SlamMap, k: int) -> dict:
        """Device-resident mirror of KF k's feature rows. The rows are
        immutable once extraction lands (kf_feat_version bumps on write),
        so one upload serves every fuse/triangulate/BoW consumer until the
        KF is re-extracted. FIFO-capped."""
        ver = int(smap.kf_feat_version[k])
        ent = self._dev_feats.get(k)
        if ent is None or ent[0] != ver:
            ent = (ver, {
                "desc": jnp.asarray(smap.kf_feat_desc[k]),
                "uv": jnp.asarray(smap.kf_feat_uv[k]),
                "level": jnp.asarray(smap.kf_feat_level[k]),
                "angle": jnp.asarray(smap.kf_feat_angle[k]),
                "valid": jnp.asarray(smap.kf_feat_valid[k]),
            })
            self._dev_feats[k] = ent
            while len(self._dev_feats) > 32:
                self._dev_feats.pop(next(iter(self._dev_feats)))
        return ent[1]

    def drop_dev_feats(self):
        """Invalidate the device mirrors (connection failover / reset)."""
        self._dev_feats.clear()

    # ------------------------------------------------------------ triangulate
    def create_new_points(self, smap: SlamMap, kf_new: int, kf_prev: int,
                          pyramid_new):
        unboundA = (smap.kf_feat_valid[kf_new]
                    & (smap.kf_feat_pt[kf_new] < 0))
        unboundB = (smap.kf_feat_valid[kf_prev]
                    & (smap.kf_feat_pt[kf_prev] < 0))
        if unboundA.sum() < 8 or unboundB.sum() < 8:
            return 0
        med_depth = self.median_depth(smap, kf_new)
        idx, good, Xw = match_epipolar_and_triangulate(
            jnp.asarray(smap.kf_feat_desc[kf_new]),
            jnp.asarray(smap.kf_feat_uv[kf_new]),
            jnp.asarray(smap.kf_feat_level[kf_new]),
            jnp.asarray(unboundA),
            jnp.asarray(smap.kf_feat_desc[kf_prev]),
            jnp.asarray(smap.kf_feat_uv[kf_prev]),
            jnp.asarray(smap.kf_feat_level[kf_prev]),
            jnp.asarray(unboundB),
            jnp.asarray(smap.kf_R[kf_new]), jnp.asarray(smap.kf_t[kf_new]),
            jnp.asarray(smap.kf_R[kf_prev]), jnp.asarray(smap.kf_t[kf_prev]),
            jnp.asarray(self.K), jnp.float32(med_depth))
        profiling.tick()
        idx = np.asarray(idx)
        good = np.asarray(good)
        Xw = np.asarray(Xw)
        slotsA = np.nonzero(good)[0]
        if len(slotsA) == 0:
            return 0
        slotsB = idx[slotsA]

        # subpixel refinement: re-match the B side with the direct aligner
        # (warped A patches -> KLT in B), then re-triangulate. The A-side uv
        # DEFINES the point (no measurement noise); only the B-side match
        # carries noise, and align2d cuts it from ~1 px to ~0.05 px — this is
        # what lets small-parallax pairs produce usable depths (the reference
        # instead relies on many-KF re-observation + BA to average the noise).
        if smap.kf_pyr[kf_prev] is not None and len(slotsA) >= 4:
            from ..frontend.direct_tracker import refine_matches_direct
            cap = 512
            n = min(len(slotsA), cap)
            slotsA = slotsA[:n]
            slotsB = slotsB[:n]
            pad = cap - n
            uvA = np.zeros((cap, 2), np.float32)
            lvlA = np.zeros(cap, np.int32)
            Xp = np.zeros((cap, 3), np.float32)
            vmask = np.zeros(cap, bool)
            uvA[:n] = smap.kf_feat_uv[kf_new, slotsA]
            lvlA[:n] = smap.kf_feat_level[kf_new, slotsA]
            Xp[:n] = Xw[slotsA]
            vmask[:n] = True
            from ..frontend.direct_tracker import capture_ref_patches
            patches = capture_ref_patches(
                _pyr_arg(pyramid_new), jnp.asarray(uvA), jnp.asarray(lvlA),
                n_levels=self.n_levels)
            profiling.tick()
            RA_ = np.tile(smap.kf_R[kf_new], (cap, 1, 1)).astype(np.float32)
            tA_ = np.tile(smap.kf_t[kf_new], (cap, 1)).astype(np.float32)
            # single-pass KLT against the KNOWN kf_prev pose — the full
            # track_local_map_direct megaprogram also ran two staged pose
            # optimizations this path discards (VERDICT r3 #3)
            ref_uv, ref_ok = refine_matches_direct(
                _pyr_arg(smap.kf_pyr[kf_prev]),
                jnp.asarray(smap.kf_R[kf_prev]),
                jnp.asarray(smap.kf_t[kf_prev]),
                jnp.asarray(Xp), jnp.asarray(vmask), patches,
                jnp.asarray(uvA), jnp.asarray(lvlA),
                jnp.asarray(RA_), jnp.asarray(tA_),
                self.intr, n_levels=self.n_levels)
            profiling.tick()
            PA = self.K @ np.hstack([smap.kf_R[kf_new],
                                     smap.kf_t[kf_new][:, None]])
            PB = self.K @ np.hstack([smap.kf_R[kf_prev],
                                     smap.kf_t[kf_prev][:, None]])
            # fixed-shape jitted re-triangulation over the padded batch
            # (slicing to n here would compile a fresh program per distinct
            # match count — the round-2 recompile storm)
            X2, good2 = _retriangulate(
                jnp.asarray(PA.astype(np.float32)),
                jnp.asarray(PB.astype(np.float32)),
                jnp.asarray(uvA), ref_uv,
                jnp.asarray(smap.kf_R[kf_new]), jnp.asarray(smap.kf_t[kf_new]),
                jnp.asarray(smap.kf_R[kf_prev]),
                jnp.asarray(smap.kf_t[kf_prev]),
                jnp.asarray(self.K.astype(np.float32)),
                jnp.float32(med_depth),
                jnp.asarray(vmask) & ref_ok)
            profiling.tick()
            X2 = np.asarray(X2)[:n]
            good2 = np.asarray(good2)[:n]
            keep = np.nonzero(good2)[0]
            slotsA = slotsA[keep]
            slotsB = slotsB[keep]
            Xw = np.zeros((smap.max_feat, 3), np.float32)
            Xw[slotsA] = X2[keep]
        # only create points whose reference patch can be captured cleanly
        inb = self.patch_in_bounds(smap.kf_feat_uv[kf_new, slotsA],
                                   smap.kf_feat_level[kf_new, slotsA])
        slotsA = slotsA[inb]
        slotsB = slotsB[inb]
        if len(slotsA) == 0:
            return 0
        ids = smap.alloc_points(len(slotsA))
        smap.pt_xyz[ids] = Xw[slotsA]
        smap.pt_valid[ids] = True
        smap.pt_first_kf[ids] = kf_new
        smap.pt_desc[ids] = smap.kf_feat_desc[kf_new, slotsA]
        smap.bind(kf_new, slotsA, ids)
        smap.bind(kf_prev, slotsB, ids)
        # NOTE: direct-tracking patches are captured by the caller AFTER
        # local BA so the stored geometry matches the optimized map.
        return len(slotsA)

    MAX_PARTNERS = 3

    @staticmethod
    def _pyr_stacked(pyr):
        """Normalize a stored pyramid to the stacked single-buffer form
        (legacy level tuples are stacked with one tiny eager op)."""
        if isinstance(pyr, (tuple, list)):
            from ..ops.image import stack_pyramid
            return stack_pyramid(tuple(jnp.asarray(lv) for lv in pyr))
        return jnp.asarray(pyr)

    def create_points_multi(self, smap: SlamMap, kf_new: int, partners,
                            pyramid_new):
        """Triangulate new points against up to MAX_PARTNERS partner
        keyframes in ONE device dispatch (_triangulate_multi_jit) — the
        sequential create_new_points path costs ~4 dispatches per partner,
        which is the dominant keyframe-tail cost on a latency-degraded
        link (VERDICT r5 #2). Per candidate feature of the new KF, the
        strongest-covisibility partner with an accepted match wins.

        Returns the number of points created."""
        partners = [int(p) for p in partners
                    if smap.kf_valid[p] and not smap.kf_feat_pending[p]
                    and smap.kf_pyr[p] is not None][: self.MAX_PARTNERS]
        if not partners:
            return 0
        unboundA = (smap.kf_feat_valid[kf_new]
                    & (smap.kf_feat_pt[kf_new] < 0))
        if unboundA.sum() < 8:
            return 0
        med_depth = self.median_depth(smap, kf_new)
        NA = smap.max_feat
        P = self.MAX_PARTNERS
        validB = np.zeros((P, NA), bool)
        RB = np.tile(np.eye(3, dtype=np.float32), (P, 1, 1))
        tB = np.zeros((P, 3), np.float32)
        pactive = np.zeros(P, bool)
        pyrA = self._pyr_stacked(pyramid_new)
        # per-partner feature rows come from the device-resident mirror —
        # the only fresh uploads are the small unbound masks + poses
        fA = self.kf_dev_feats(smap, kf_new)
        pad = {"desc": fA["desc"], "uv": fA["uv"], "level": fA["level"],
               "angle": fA["angle"], "pyr": pyrA}
        parts = [pad] * P      # inactive slots reuse A's rows (masked out)
        for j, p in enumerate(partners):
            unB = smap.kf_feat_valid[p] & (smap.kf_feat_pt[p] < 0)
            if unB.sum() < 8:
                continue
            fB = self.kf_dev_feats(smap, p)
            parts[j] = {"desc": fB["desc"], "uv": fB["uv"],
                        "level": fB["level"], "angle": fB["angle"],
                        "pyr": self._pyr_stacked(smap.kf_pyr[p])}
            validB[j] = unB
            RB[j] = smap.kf_R[p]
            tB[j] = smap.kf_t[p]
            pactive[j] = True
        if not pactive.any():
            return 0
        idx, good, X = _triangulate_multi_jit(
            fA["desc"], fA["uv"], fA["level"],
            jnp.asarray(unboundA), fA["angle"],
            jnp.asarray(smap.kf_R[kf_new]), jnp.asarray(smap.kf_t[kf_new]),
            pyrA,
            tuple(q["desc"] for q in parts), tuple(q["uv"] for q in parts),
            tuple(q["level"] for q in parts),
            jnp.asarray(validB), tuple(q["angle"] for q in parts),
            jnp.asarray(RB), jnp.asarray(tB),
            tuple(q["pyr"] for q in parts), jnp.asarray(pactive),
            jnp.asarray(self.K.astype(np.float32)), jnp.float32(med_depth),
            n_levels=self.n_levels)
        profiling.tick()
        idx = np.asarray(idx)
        good = np.asarray(good)
        X = np.asarray(X)
        # strongest-covisibility partner (list order) wins per slot
        chosen = np.full(NA, -1, np.int64)
        for j in range(P - 1, -1, -1):
            chosen[good[j]] = j
        slotsA = np.nonzero(chosen >= 0)[0]
        if len(slotsA) == 0:
            return 0
        # only create points whose reference patch captures cleanly
        inb = self.patch_in_bounds(smap.kf_feat_uv[kf_new, slotsA],
                                   smap.kf_feat_level[kf_new, slotsA])
        slotsA = slotsA[inb]
        if len(slotsA) == 0:
            return 0
        cj = chosen[slotsA]
        slotsB = idx[cj, slotsA]
        ids = smap.alloc_points(len(slotsA))
        smap.pt_xyz[ids] = X[cj, slotsA]
        smap.pt_valid[ids] = True
        smap.pt_first_kf[ids] = kf_new
        smap.pt_desc[ids] = smap.kf_feat_desc[kf_new, slotsA]
        smap.bind(kf_new, slotsA, ids)
        for j, p in enumerate(partners):
            m = cj == j
            if m.any():
                smap.bind(p, slotsB[m], ids[m])
        # direct-tracking patches are captured by the caller AFTER local BA
        # so the stored geometry matches the optimized map
        return len(slotsA)

    def patch_in_bounds(self, uv, lvl):
        """True where a REF_PATCH capture at (uv, level) stays inside the
        image. Near-border captures silently sample edge-clamped pixels
        (garbage templates that poison the next frames' tracking)."""
        from ..backend.mapstate import REF_PATCH
        scale = (2.0 ** lvl.astype(np.float32))
        margin = (REF_PATCH / 2 + 2) * scale
        w, h = self.cam.width, self.cam.height
        return ((uv[:, 0] >= margin) & (uv[:, 0] < w - margin)
                & (uv[:, 1] >= margin) & (uv[:, 1] < h - margin))

    def refresh_patches(self, smap: SlamMap, kf: int, pyramid, pt_ids, slots):
        """(Re)capture stored ref patches for points bound to `slots` of kf.
        Points whose patch would cross the border keep their previous
        reference state."""
        pt_ids = np.asarray(pt_ids)
        slots = np.asarray(slots)
        if len(pt_ids) == 0:
            return
        uv = smap.kf_feat_uv[kf, slots]
        lvl = smap.kf_feat_level[kf, slots]
        ok = self.patch_in_bounds(uv, lvl)
        pt_ids = pt_ids[ok]
        slots = slots[ok]
        if len(pt_ids) == 0:
            return
        uv = uv[ok]
        lvl = lvl[ok]
        from ..frontend.direct_tracker import capture_ref_patches
        # fixed-size padded chunks: capture_ref_patches compiles once per
        # (image shape, PATCH_CAP) instead of once per point count
        chunks = []
        for s in range(0, len(pt_ids), PATCH_CAP):
            uv_pad = np.zeros((PATCH_CAP, 2), np.float32)
            lv_pad = np.zeros(PATCH_CAP, np.int32)
            m = min(PATCH_CAP, len(pt_ids) - s)
            uv_pad[:m] = uv[s: s + m]
            lv_pad[:m] = lvl[s: s + m]
            p = np.asarray(capture_ref_patches(
                _pyr_arg(pyramid), jnp.asarray(uv_pad), jnp.asarray(lv_pad),
                n_levels=self.n_levels))
            profiling.tick()
            chunks.append(p[:m])
        patches = np.concatenate(chunks) if len(chunks) > 1 else chunks[0]
        smap.pt_patch[pt_ids] = patches
        smap.pt_ref_uv[pt_ids] = uv
        smap.pt_ref_level[pt_ids] = lvl
        smap.pt_ref_kf[pt_ids] = kf
        smap.pt_ref_R[pt_ids] = smap.kf_R[kf]
        smap.pt_ref_t[pt_ids] = smap.kf_t[kf]

    def update_distinctive_descriptors(self, smap: SlamMap, kf: int,
                                       max_obs: int = 8):
        """Refresh pt_desc for points observed by `kf` to the min-median-
        Hamming descriptor over their keyframe observations (reference
        MapPoint::ComputeDistinctiveDescriptors src/MapPoint.cc:211,
        called whenever observations change). One batched call per KF."""
        binds = smap.kf_feat_pt[kf]
        pt_ids = np.unique(binds[binds >= 0])
        pt_ids = pt_ids[smap.pt_valid[pt_ids]]
        if len(pt_ids) == 0:
            return
        win = smap.local_window(kf, self.window + 4)
        n = len(pt_ids)
        # fixed problem size: growth-triggered bucket jumps (256->512->...)
        # would compile fresh programs MID-RUN, and each server compile
        # degrades the device link for minutes (utils/compile_cache.py)
        cap = 2048
        if n > cap:
            # no-silent-caps: account for descriptor updates shed by the
            # fixed bucket (ADVICE r3)
            self.dropped["desc_update_points"] += n - cap
            keep = np.argsort(-smap.pt_obs[pt_ids])[:cap]
            pt_ids = pt_ids[keep]
            n = cap
        loc = np.full(smap.max_pt, -1, np.int64)
        loc[pt_ids] = np.arange(n)
        stack = np.zeros((cap, max_obs, 256), np.uint8)
        valid = np.zeros((cap, max_obs), bool)
        count = np.zeros(cap, np.int32)
        for k in win:
            if smap.kf_feat_pending[k]:
                continue  # placeholder descriptors (deferred extraction)
            bk = smap.kf_feat_pt[k]
            slots = np.nonzero(bk >= 0)[0]
            lp = loc[bk[slots]]
            keep = (lp >= 0) & (count[np.maximum(lp, 0)] < max_obs)
            slots, lp = slots[keep], lp[keep]
            # first occurrence per point within this KF
            first = np.unique(lp, return_index=True)[1]
            slots, lp = slots[first], lp[first]
            col = count[lp]
            stack[lp, col] = smap.kf_feat_desc[k, slots]
            valid[lp, col] = True
            count[lp] += 1
        multi = count[:n] >= 2
        if not multi.any():
            return
        # bit-pack the [cap,8,256] observation stack (8x smaller upload)
        # and ship it as pool slices; unpack + median happen in ONE jit
        packed = np.packbits(stack, axis=-1)            # [cap,8,32]
        futs = [_UPLOAD_POOL.submit(_put_block, p)
                for p in np.array_split(packed, 2)]
        packed_dev = jnp.concatenate([f.result() for f in futs], axis=0)
        _, desc = matching.distinctive_descriptors_packed(
            packed_dev, jnp.asarray(valid))
        profiling.tick()
        desc = np.asarray(desc)[:n]
        smap.pt_desc[pt_ids[multi]] = desc[multi]

    def median_depth(self, smap: SlamMap, kf: int) -> float:
        pts = smap.kf_feat_pt[kf]
        pts = pts[pts >= 0]
        if len(pts) == 0:
            return 1.0
        Xc = smap.pt_xyz[pts] @ smap.kf_R[kf].T + smap.kf_t[kf]
        return float(np.median(Xc[:, 2]))

    # ------------------------------------------------------------------- BA
    def local_ba(self, smap: SlamMap, kf: int):
        """Window local BA (reference Optimizer::LocalBundleAdjustment)."""
        win = smap.local_window(kf, self.window)
        if len(win) < 2:
            return
        pt_ids = smap.points_in_kfs(win)
        if len(pt_ids) == 0:
            return
        if len(pt_ids) > BA_L:
            self.dropped["local_ba_points"] += len(pt_ids) - BA_L
            pt_ids = pt_ids[np.argsort(-smap.pt_obs[pt_ids])[:BA_L]]
        # fixed ring: KFs outside the window that observe window points
        # enter as fixed poses (reference src/Optimizer.cc:1903-1918) — they
        # pin the gauge (incl. scale) to the older map
        in_win = np.zeros(smap.n_kf, bool)
        in_win[win] = True
        sel = np.isin(smap.kf_feat_pt[: smap.n_kf], pt_ids)
        obs_per_kf = sel.sum(axis=1)
        obs_per_kf[in_win] = 0
        ring = np.argsort(-obs_per_kf)[: max(0, BA_P - len(win))]
        ring = [int(k) for k in ring if obs_per_kf[k] >= 10]
        win = win + ring
        o_kf, o_pt, o_uv, o_lvl, o_ur = smap.observations(win, pt_ids)
        if len(o_kf) > BA_O:
            # rank observations by their landmark's support so the capacity
            # cut sheds weakly-observed points first (not an arbitrary slice)
            self.dropped["local_ba_obs"] += len(o_kf) - BA_O
            order = np.argsort(-smap.pt_obs[pt_ids[o_pt]],
                               kind="stable")[:BA_O]
            o_kf, o_pt, o_uv, o_lvl, o_ur = (o_kf[order], o_pt[order],
                                             o_uv[order], o_lvl[order],
                                             o_ur[order])

        P = BA_P
        n_free = len(win) - len(ring)
        kfR = np.tile(np.eye(3, dtype=np.float32), (P, 1, 1))
        kft = np.zeros((P, 3), np.float32)
        fixed = np.ones(P, bool)
        for i, k in enumerate(win[:P]):
            kfR[i] = smap.kf_R[k]
            kft[i] = smap.kf_t[k]
            fixed[i] = i >= n_free  # ring KFs are fixed
        # gauge anchors: besides the fixed ring, the two oldest KFs of the
        # problem stay fixed (mono BA has a 7-DoF gauge incl. scale)
        order = np.argsort([smap.kf_frame_id[k] for k in win[:P]])
        fixed[order[0]] = True
        if len(win) >= 4:
            fixed[order[1]] = True

        L = BA_L
        pts = np.zeros((L, 3), np.float32)
        pt_valid = np.zeros(L, bool)
        pts[: len(pt_ids)] = smap.pt_xyz[pt_ids]
        pt_valid[: len(pt_ids)] = True

        O = BA_O
        obs_p = np.zeros(O, np.int32)
        obs_l = np.zeros(O, np.int32)
        obs_uv = np.zeros((O, 2), np.float32)
        obs_ur = np.full(O, -1.0, np.float32)
        obs_is2 = np.ones(O, np.float32)
        obs_valid = np.zeros(O, bool)
        n_o = len(o_kf)
        obs_p[:n_o] = o_kf
        obs_l[:n_o] = o_pt
        obs_uv[:n_o] = o_uv
        obs_ur[:n_o] = o_ur
        obs_is2[:n_o] = 0.25 ** o_lvl
        obs_valid[:n_o] = o_kf < P

        res = local_bundle_adjustment(
            jnp.asarray(kfR), jnp.asarray(kft), jnp.asarray(fixed),
            jnp.asarray(pts), jnp.asarray(pt_valid),
            jnp.asarray(obs_p), jnp.asarray(obs_l), jnp.asarray(obs_uv),
            jnp.asarray(obs_is2), jnp.asarray(obs_valid),
            self.intr, n_poses=P, n_points=L,
            obs_ur=jnp.asarray(obs_ur), bf=self.bf)
        profiling.tick()

        newR = np.asarray(res.kf_R)
        newt = np.asarray(res.kf_t)
        for i, k in enumerate(win[:P]):
            if not fixed[i]:
                smap.set_pose(k, newR[i], newt[i])
        smap.pt_xyz[pt_ids] = np.asarray(res.points)[: len(pt_ids)]
        smap.sync_ref_poses()

        # drop observations flagged as outliers
        inl = np.asarray(res.obs_inlier)[:n_o]
        bad = np.nonzero(~inl)[0]
        for b in bad:
            k = win[o_kf[b]]
            lp = int(o_pt[b])
            pid = pt_ids[lp]
            slots = np.nonzero(smap.kf_feat_pt[k] == pid)[0]
            if len(slots):
                smap.kf_feat_pt[k, slots] = -1
                smap.pt_obs[pid] -= len(slots)

    # -------------------------------------------------------------- global BA
    def global_ba(self, smap: SlamMap, phases=(10, 10), max_poses: int = 64):
        """Full-map bundle adjustment (reference GlobalBundleAdjustemnt,
        src/Optimizer.cc:1478; spawned after loop closure and during VINS
        init). Capacities are bucketed so each problem size compiles once;
        maps larger than the biggest bucket optimize the newest `max_poses`
        keyframes against the rest held fixed."""
        kfs = [k for k in range(smap.n_kf) if smap.kf_valid[k]]
        if len(kfs) < 2:
            return
        free = kfs[-max_poses:] if len(kfs) > max_poses else kfs
        # bucket sizes (power-of-two-ish) to bound recompilation
        def bucket(n, opts):
            for o in opts:
                if n <= o:
                    return o
            return opts[-1]

        P = bucket(len(kfs), [8, 16, 32, 64, 128])
        pt_ids = smap.points_in_kfs(kfs)
        L = bucket(len(pt_ids), [2048, 4096, 8192, 16384])
        if len(pt_ids) > L:
            self.dropped["global_ba_points"] += len(pt_ids) - L
            pt_ids = pt_ids[np.argsort(-smap.pt_obs[pt_ids])[:L]]
        o_kf, o_pt, o_uv, o_lvl, o_ur = smap.observations(kfs[:P], pt_ids)
        O = bucket(len(o_kf), [8192, 16384, 32768])
        if len(o_kf) > O:
            # support-ranked cut instead of a silent slice (VERDICT r2 #6)
            self.dropped["global_ba_obs"] += len(o_kf) - O
            order = np.argsort(-smap.pt_obs[pt_ids[o_pt]],
                               kind="stable")[:O]
            o_kf, o_pt, o_uv, o_lvl, o_ur = (o_kf[order], o_pt[order],
                                             o_uv[order], o_lvl[order],
                                             o_ur[order])

        kfR = np.tile(np.eye(3, dtype=np.float32), (P, 1, 1))
        kft = np.zeros((P, 3), np.float32)
        fixed = np.ones(P, bool)
        for i, k in enumerate(kfs[:P]):
            kfR[i] = smap.kf_R[k]
            kft[i] = smap.kf_t[k]
            fixed[i] = k not in free
        fixed[0] = True  # gauge anchor (reference fixes KF0)

        pts = np.zeros((L, 3), np.float32)
        ptv = np.zeros(L, bool)
        pts[: len(pt_ids)] = smap.pt_xyz[pt_ids]
        ptv[: len(pt_ids)] = True
        obs_p = np.zeros(O, np.int32)
        obs_l = np.zeros(O, np.int32)
        obs_uv = np.zeros((O, 2), np.float32)
        obs_ur = np.full(O, -1.0, np.float32)
        obs_is2 = np.ones(O, np.float32)
        obs_valid = np.zeros(O, bool)
        n_o = len(o_kf)
        obs_p[:n_o] = o_kf
        obs_l[:n_o] = o_pt
        obs_uv[:n_o] = o_uv
        obs_ur[:n_o] = o_ur
        obs_is2[:n_o] = 0.25 ** o_lvl
        obs_valid[:n_o] = True

        if self.mesh is not None:
            res = self._global_ba_dist(kfR, kft, fixed, pts, ptv, obs_p,
                                       obs_l, obs_uv, obs_ur,
                                       obs_is2 * obs_valid, P, L,
                                       phases=tuple(phases))
        else:
            res = local_bundle_adjustment(
                jnp.asarray(kfR), jnp.asarray(kft), jnp.asarray(fixed),
                jnp.asarray(pts), jnp.asarray(ptv),
                jnp.asarray(obs_p), jnp.asarray(obs_l), jnp.asarray(obs_uv),
                jnp.asarray(obs_is2), jnp.asarray(obs_valid),
                self.intr, n_poses=P, n_points=L, phases=tuple(phases),
                obs_ur=jnp.asarray(obs_ur), bf=self.bf)
        newR = np.asarray(res.kf_R)
        newt = np.asarray(res.kf_t)
        for i, k in enumerate(kfs[:P]):
            if not fixed[i]:
                smap.set_pose(k, newR[i], newt[i])
        smap.pt_xyz[pt_ids] = np.asarray(res.points)[: len(pt_ids)]
        smap.sync_ref_poses()

    def _global_ba_dist(self, kfR, kft, fixed, pts, ptv, obs_p, obs_l,
                        obs_uv, obs_ur, obs_w, P, L, phases=(10, 10)):
        """Landmark-block-sharded global BA over self.mesh (one compiled
        step per (P, L, O_shard) bucket). Stereo/RGB-D 3-row edges and the
        reference's phased chi2-outlier drops are first-class (VERDICT r3
        #9: --devices N must not be a silent accuracy downgrade)."""
        from ..parallel.dist_ba import (make_distributed_ba,
                                        partition_obs_by_landmark)

        n_dev = self.mesh.devices.size
        op, ol, ouv, our, ow, O_shard = partition_obs_by_landmark(
            obs_p, obs_l, obs_uv, obs_w.astype(np.float32), L, n_dev,
            obs_ur=obs_ur)

        def bucket(n, opts):
            for o in opts:
                if n <= o:
                    return o
            return opts[-1]

        Ob = bucket(O_shard, [1024, 2048, 4096, 8192, 16384, 32768])
        if Ob != O_shard:
            op, ol, ouv, our, ow, O_shard = partition_obs_by_landmark(
                obs_p, obs_l, obs_uv, obs_w.astype(np.float32), L, n_dev,
                pad_to=Ob, obs_ur=obs_ur)

        key = (P, L, O_shard, tuple(phases))
        if key not in self._dist_ba_cache:
            self._dist_ba_cache[key] = make_distributed_ba(
                self.mesh, n_poses=P, n_points=L, phases=tuple(phases))
        ba = self._dist_ba_cache[key]
        return ba(jnp.asarray(kfR), jnp.asarray(kft),
                  jnp.asarray(~fixed), jnp.asarray(pts), jnp.asarray(ptv),
                  jnp.asarray(op), jnp.asarray(ol), jnp.asarray(ouv),
                  jnp.asarray(our), jnp.asarray(ow),
                  tuple(np.float32(v) for v in self.intr),
                  np.float32(self.bf))

    # ------------------------------------------------------------------ fuse
    def bind_map_points(self, smap: SlamMap, kf: int, radius: float = 4.0):
        """Project local-map points into the new KF; bind matches on unbound
        features and FUSE duplicates on bound ones — when a projected point
        lands on a feature already bound to a different landmark, the point
        with fewer observations is merged into the stronger (reference
        SearchInNeighbors -> ORBmatcher::Fuse src/ORBmatcher.cc:748-886 +
        MapPoint::Replace src/MapPoint.cc:155)."""
        win = smap.local_window(kf, self.window + 4)
        pts = smap.points_in_kfs([k for k in win if k != kf])
        return self.project_and_fuse(smap, kf, pts, radius=radius)

    def search_in_neighbors(self, smap: SlamMap, kf: int,
                            radius: float = 4.0, n_direct: int = 10,
                            n_hop2: int = 5, n_reverse: int = 5):
        """Full two-hop SearchInNeighbors (reference
        src/LocalMapping.cc:1228-1326): fuse the covisible (and their
        covisible) map points INTO the new KF, then fuse the new KF's points
        back into its strongest neighbors (the reverse direction)."""
        direct = [k for k in smap.local_window(kf, n_direct + 1)
                  if k != kf and not smap.kf_feat_pending[k]]
        targets = set(direct)
        for k in direct:
            targets.update(smap.local_window(k, n_hop2 + 1))
        targets.discard(kf)
        targets = [k for k in targets
                   if smap.kf_valid[k] and not smap.kf_feat_pending[k]]
        # BOTH directions in ONE batched dispatch: the forward fuse (all
        # neighborhood points into the new KF) rides the same
        # fuse_into_targets program as the reverse direction (the new KF's
        # points into its strongest neighbors). Candidates for both are
        # collected from the pre-fuse state, so a point the forward pass
        # binds misses one reverse opportunity THIS keyframe (retried at
        # the next) — the cost of 1 link round-trip instead of 2+.
        pts = smap.points_in_kfs(targets)
        binds = smap.kf_feat_pt[kf]
        cur_pts = np.unique(binds[binds >= 0])
        cur_pts = cur_pts[smap.pt_valid[cur_pts]]
        fuse_t = [kf]
        fuse_p = [pts]
        rev = direct[:n_reverse]
        if len(cur_pts):
            fuse_t += rev
            fuse_p += [cur_pts] * len(rev)
        return self.fuse_into_targets(smap, fuse_t, fuse_p, radius=radius)

    FUSE_CAP = 1024     # candidate-point pad per fuse target
    FUSE_TARGETS = 6    # fixed target-axis bucket for the batched fuse

    def _fuse_prepare(self, smap: SlamMap, kf: int, pts):
        """Host half 1 of project_and_fuse: filter + project the candidate
        points into `kf`. Returns (pts [n], descA, uvA, vA padded to
        FUSE_CAP) or None when nothing projects."""
        pts = np.asarray(pts)
        pts = pts[smap.pt_valid[pts]]
        bound_here = smap.kf_feat_pt[kf]
        pts = pts[~np.isin(pts, bound_here)]
        if len(pts) == 0:
            return None
        R = smap.kf_R[kf]
        t = smap.kf_t[kf]
        Xc = smap.pt_xyz[pts] @ R.T + t
        z = Xc[:, 2]
        front = z > 0.1
        uv = np.stack([self.cam.fx * Xc[:, 0] / np.maximum(z, 1e-6)
                       + self.cam.cx,
                       self.cam.fy * Xc[:, 1] / np.maximum(z, 1e-6)
                       + self.cam.cy], -1).astype(np.float32)
        inb = (front & (uv[:, 0] > 10) & (uv[:, 0] < self.cam.width - 10)
               & (uv[:, 1] > 10) & (uv[:, 1] < self.cam.height - 10))
        pts = pts[inb]
        uv = uv[inb]
        if len(pts) == 0:
            return None
        cap = self.FUSE_CAP
        n = min(len(pts), cap)
        descA = np.zeros((cap, 256), np.uint8)
        uvA = np.zeros((cap, 2), np.float32)
        vA = np.zeros(cap, bool)
        descA[:n] = smap.pt_desc[pts[:n]]
        uvA[:n] = uv[:n]
        vA[:n] = True
        return pts[:n], descA, uvA, vA

    def _fuse_apply(self, smap: SlamMap, kf: int, pts, idx, ok):
        """Host half 2 of project_and_fuse: bind fresh matches, Replace-fuse
        duplicates. `idx`/`ok` are the match results for `pts`."""
        rows = np.nonzero(ok)[0]
        if len(rows) == 0:
            return 0
        slot_pt = smap.kf_feat_pt[kf, idx[rows]]
        fresh = slot_pt < 0
        smap.bind(kf, idx[rows][fresh], pts[rows][fresh])
        # duplicates: merge weaker into stronger
        for r in np.nonzero(~fresh)[0]:
            a = int(pts[rows[r]])       # projected local-map point
            b = int(slot_pt[r])         # point already bound at the feature
            if a == b or not (smap.pt_valid[a] and smap.pt_valid[b]):
                continue
            keep, drop = (a, b) if smap.pt_obs[a] >= smap.pt_obs[b] \
                else (b, a)
            smap.replace_point(drop, keep)
        return len(rows)

    def project_and_fuse(self, smap: SlamMap, kf: int, pts,
                         radius: float = 4.0):
        """Project candidate landmarks into keyframe `kf`, bind matches on
        unbound features, Replace-fuse on bound ones. Returns match count.

        NOTE: no rotation histogram here BY SPEC — the reference's Fuse
        overloads never apply ComputeThreeMaxima (src/ORBmatcher.cc:748-886
        have no mbCheckOrientation path), and map points carry no single
        orientation to histogram against."""
        prep = self._fuse_prepare(smap, kf, pts)
        if prep is None:
            return 0
        pts_n, descA, uvA, vA = prep
        descA = _UPLOAD_POOL.submit(_put_block, descA)  # overlap w/ mirror
        fT = self.kf_dev_feats(smap, kf)   # target rows: device mirror
        idx, ok = matching.match_with_windows(
            descA.result(), jnp.asarray(vA),
            fT["desc"], fT["valid"],
            uv_pred1=jnp.asarray(uvA),
            uv2=fT["uv"], radius=radius,
            max_dist=matching.TH_LOW, ratio=0.9, mutual=True)
        profiling.tick()
        n = len(pts_n)
        return self._fuse_apply(smap, kf, pts_n, np.asarray(idx)[:n],
                                np.asarray(ok)[:n])

    def fuse_into_targets(self, smap: SlamMap, targets, pts_per_target,
                          radius: float = 4.0):
        """Batched project_and_fuse over several target keyframes: the
        per-target window matches run as ONE vmapped device dispatch
        (matching.match_with_windows_batch), padded to a fixed
        FUSE_TARGETS bucket so the program compiles once (VERDICT r5 #2:
        the round-4 fuse stage was one dispatch per target)."""
        preps, metas = [], []
        for t, pts in zip(targets, pts_per_target):
            prep = self._fuse_prepare(smap, t, pts)
            if prep is not None:
                metas.append(t)
                preps.append(prep)
        if not preps:
            return 0
        T = self.FUSE_TARGETS
        preps = preps[:T]
        metas = metas[:T]
        pad = T - len(preps)
        descA = np.stack([p[1] for p in preps] + [preps[0][1]] * pad)
        uvA = np.stack([p[2] for p in preps] + [preps[0][2]] * pad)
        vA = np.stack([p[3] for p in preps] + [preps[0][3]] * pad)
        kfs = metas + [metas[0]] * pad
        # the [T,1024,256] candidate block is the big upload: split it
        # across pool threads; target-side rows come from the device
        # mirror (tuple args: jit stacks them in-trace, no re-upload)
        futs = [_UPLOAD_POOL.submit(_put_block, s)
                for s in np.array_split(descA, 3)]
        fT = [self.kf_dev_feats(smap, t) for t in kfs]
        descA_dev = jnp.concatenate([f.result() for f in futs], axis=0)
        idx, ok = matching.match_with_windows_batch(
            descA_dev, jnp.asarray(vA),
            tuple(f["desc"] for f in fT),
            tuple(f["valid"] for f in fT),
            jnp.asarray(uvA), tuple(f["uv"] for f in fT),
            radius=radius, max_dist=matching.TH_LOW, ratio=0.9)
        profiling.tick()
        idx = np.asarray(idx)
        ok = np.asarray(ok)
        n = 0
        for i, t in enumerate(metas):
            m = len(preps[i][0])
            n += self._fuse_apply(smap, t, preps[i][0], idx[i][:m],
                                  ok[i][:m])
        return n

    # ---------------------------------------------------------------- culling
    def cull_keyframes(self, smap: SlamMap, kf: int, min_id_gap: int = 3,
                       protect=None):
        """Cull redundant covisible KFs: >=90% of a KF's points observed by
        >=3 other keyframes (reference KeyFrameCulling,
        src/LocalMapping.cc:1419-1500). The newest KFs and KF0 are kept;
        `protect` is an optional set of KF ids that must survive (the VIO
        guards: direct prev-KF + KFs within 0.15 s, :1440-1450)."""
        win = smap.local_window(kf, self.window + 4)
        culled = 0
        for k in win:
            if k == kf or k == 0 or k >= smap.n_kf - min_id_gap:
                continue
            if protect is not None and k in protect:
                continue
            if not smap.kf_valid[k]:
                continue
            binds = smap.kf_feat_pt[k]
            pids = binds[binds >= 0]
            if len(pids) < 20:
                continue
            redundant = (smap.pt_obs[pids] >= 4).mean()
            if redundant < 0.9:
                continue
            # freeze the culled pose relative to a surviving parent so
            # trajectory recovery can walk past it (reference mTcp);
            # covisibility must be read BEFORE the bindings are cleared
            parent = int(smap.kf_parent[k])
            if parent < 0 or not smap.kf_valid[parent]:
                cov = smap.covisibility(k)
                cov = np.where(smap.kf_valid[: smap.n_kf], cov, 0)
                cov[k] = 0
                parent = int(np.argmax(cov)) if cov.max() > 0 else 0
            smap.mark_culled(k, parent)
            # re-home points whose direct-tracking reference this KF is
            refugees = np.unique(pids[smap.pt_ref_kf[pids] == k])
            slots = np.nonzero(binds >= 0)[0]
            smap.kf_feat_pt[k, slots] = -1
            np.add.at(smap.pt_obs, pids, -1)
            smap.kf_valid[k] = False
            smap.kf_pyr[k] = None
            for newref in smap.local_window(kf, self.window + 4):
                if not smap.kf_valid[newref] or len(refugees) == 0:
                    continue
                sel = np.isin(smap.kf_feat_pt[newref], refugees)
                sl = np.nonzero(sel)[0]
                if len(sl) and smap.kf_pyr[newref] is not None:
                    ids = smap.kf_feat_pt[newref, sl]
                    self.refresh_patches(smap, newref, smap.kf_pyr[newref],
                                         ids, sl)
                    refugees = refugees[~np.isin(refugees, ids)]
            # orphaned refugees (no other observer with pyramid): kill them
            if len(refugees):
                smap.kill_points(refugees)
            culled += 1
        return culled

    def cull_points(self, smap: SlamMap, recent_window: int = 3):
        """Found-ratio + observation-count culling
        (reference MapPointCulling src/LocalMapping.cc:930-964)."""
        if smap.n_pt == 0:
            return 0
        ids = np.arange(smap.n_pt)
        valid = smap.pt_valid[ids]
        vis = np.maximum(smap.pt_visible[ids], 1)
        ratio = smap.pt_found[ids] / vis
        age = smap.n_kf - 1 - smap.pt_first_kf[ids]
        # reference: found-ratio < 0.25, or <= 2 KF observations (mono) once
        # 2 KFs have passed since creation — kills the small-parallax 2-obs
        # points whose depths are too noisy to keep feeding pose estimation
        bad = valid & (((ratio < 0.25) & (smap.pt_visible[ids] > 8))
                       | ((age >= 2) & (smap.pt_obs[ids] <= 2)))
        smap.kill_points(ids[bad])
        return int(bad.sum())
