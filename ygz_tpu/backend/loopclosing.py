"""Loop detection + Sim3 computation + loop correction.

Re-design of the reference LoopClosing thread (/root/reference/src/
LoopClosing.cc): DetectLoop (:104-216, BoW candidates above the minimum
covisible score with 3-consecutive-KF consistency), ComputeSim3 (:218-367,
descriptor matches -> Sim3 RANSAC -> acceptance >= 20 inliers), CorrectLoop
(:369-544, Sim3 propagation over the covisible neighborhood, point remap,
essential-graph optimization). Runs synchronously at keyframe rate on the
host, with all numerics (matching, Sim3 RANSAC, pose graph) as batched jitted
calls.

Global BA after loop correction is deferred to the next rounds; the
essential-graph correction is the accuracy-critical step.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .bow import BowIndex
from .mapstate import SlamMap
from .posegraph import optimize_pose_graph
from ..geometry.sim3 import sim3_ransac, sim3_mul, sim3_inv, sim3_apply
from ..ops import matching

MAX_PG_NODES = 256
MAX_PG_EDGES = 2048


class LoopCloser:
    def __init__(self, bow: BowIndex, cam, consistency: int = 3,
                 min_matches: int = 20, covis_weight: int = 30):
        self.bow = bow
        self.cam = cam
        self.consistency_th = consistency
        self.min_matches = min_matches
        self.covis_weight = covis_weight
        self._consistent_groups = []  # list of (set_of_kfs, count)
        self.last_loop_kf = -1
        self._rng = jax.random.PRNGKey(7)

    # ------------------------------------------------------------- detection
    def detect(self, smap: SlamMap, kf: int, bow_vec) -> Optional[int]:
        """Returns a loop-candidate KF id after consistency checks, or None
        (reference trigger: >=10 KFs since the last loop, :114)."""
        if kf < 10 or kf - self.last_loop_kf < 10:
            return None
        cov = smap.covisibility(kf)
        covisible = set(np.nonzero(cov > 0)[0].tolist()) | {kf}
        # min score among strongly covisible KFs
        scores = self.bow.scores(bow_vec)
        strong = [k for k in covisible if k != kf and cov[k] >= 15]
        min_score = min((scores[k] for k in strong), default=0.6)
        cands = self.bow.loop_candidates(bow_vec, min_score=min_score,
                                         exclude=covisible)
        if not cands:
            self._consistent_groups = []
            return None
        # consistency across consecutive KFs: a candidate's covisibility
        # group must reappear `consistency_th` times (ConsistentGroup logic)
        new_groups = []
        accepted = None
        for c in cands:
            group = set(np.nonzero(smap.covisibility(c) > 0)[0].tolist()) | {c}
            count = 1
            for g, n in self._consistent_groups:
                if group & g:
                    count = max(count, n + 1)
            new_groups.append((group, count))
            if count >= self.consistency_th and accepted is None:
                accepted = c
        self._consistent_groups = new_groups
        return accepted

    # ------------------------------------------------------------- sim3
    def compute_sim3(self, smap: SlamMap, kf: int, cand: int):
        """Match map points of kf vs cand, robust Sim3 cand->kf.

        Returns (R, t, s, n_inliers) with S mapping cand-CAMERA coords to
        kf-CAMERA coords, or None."""
        bk = smap.kf_feat_pt[kf] >= 0
        bc = smap.kf_feat_pt[cand] >= 0
        if bk.sum() < self.min_matches or bc.sum() < self.min_matches:
            return None
        idx, ok = matching.match_with_windows(
            jnp.asarray(smap.kf_feat_desc[kf]), jnp.asarray(bk),
            jnp.asarray(smap.kf_feat_desc[cand]), jnp.asarray(bc),
            max_dist=matching.TH_LOW, ratio=0.75, mutual=True)
        idx = np.asarray(idx)
        ok = np.asarray(ok)
        slots_k = np.nonzero(ok)[0]
        if len(slots_k) < self.min_matches:
            return None
        slots_c = idx[slots_k]
        pk = smap.kf_feat_pt[kf, slots_k]
        pc = smap.kf_feat_pt[cand, slots_c]
        # 3-D positions in each KF's camera frame
        Xk = smap.pt_xyz[pk] @ smap.kf_R[kf].T + smap.kf_t[kf]
        Xc = smap.pt_xyz[pc] @ smap.kf_R[cand].T + smap.kf_t[cand]
        n = len(Xk)
        pad = max(0, 64 - n)
        Xk = np.pad(Xk, ((0, pad), (0, 0)))
        Xc = np.pad(Xc, ((0, pad), (0, 0)))
        mask = np.array([True] * n + [False] * pad)
        self._rng, key = jax.random.split(self._rng)
        R, t, s, inl, ni = sim3_ransac(
            jnp.asarray(Xc), jnp.asarray(Xk), jnp.asarray(mask), key,
            num_iters=300, th_b=0.05)
        if int(ni) < self.min_matches:
            return None
        R, t, s = np.asarray(R), np.asarray(t), float(s)

        # SearchBySim3 (reference src/ORBmatcher.cc:1006): project the
        # loop-side local-map points through the estimated S into kf's image
        # and re-match with window-gated descriptors — the RANSAC Sim3 guides
        # a much wider correspondence set than the raw BoW matches.
        Xc2, Xk2 = self._guided_matches(smap, kf, cand, (R, t, s))
        inl_np = np.asarray(inl)[:n]
        Xc_all = np.concatenate([Xc[:n][inl_np], Xc2])
        Xk_all = np.concatenate([Xk[:n][inl_np], Xk2])
        n_total = len(Xc_all)
        # reference final acceptance: >=40 matches after Sim3-guided
        # projection (src/LoopClosing.cc:355)
        if n_total < 2 * self.min_matches:
            return None

        # inlier-iterated Horn refinement on the expanded set (the role of
        # OptimizeSim3's drop-chi2-then-reoptimize loop, Optimizer.cc:2409ff)
        R, t, s, ni = self._refine_sim3(Xc_all, Xk_all, (R, t, s))
        if ni < 2 * self.min_matches:
            return None
        return R, t, s, ni

    def _guided_matches(self, smap: SlamMap, kf: int, cand: int, S_ck,
                        radius: float = 8.0, cap: int = 1024):
        """Sim3-guided 3D-3D correspondences: cand-side local-map points
        projected through S_ck into kf's image, window-gated descriptor match
        against kf's BOUND features. Returns (Xc [M,3], Xk [M,3]) in the two
        cameras' frames."""
        win = smap.local_window(cand, 8)
        pts_c = smap.points_in_kfs(win)
        if len(pts_c) == 0:
            return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32)
        R, t, s = S_ck
        Xc = smap.pt_xyz[pts_c] @ smap.kf_R[cand].T + smap.kf_t[cand]
        Xk_pred = s * (Xc @ R.T) + t
        z = Xk_pred[:, 2]
        uv = np.stack([self.cam.fx * Xk_pred[:, 0] / np.maximum(z, 1e-6)
                       + self.cam.cx,
                       self.cam.fy * Xk_pred[:, 1] / np.maximum(z, 1e-6)
                       + self.cam.cy], -1).astype(np.float32)
        inb = ((z > 0.05) & (uv[:, 0] > 0) & (uv[:, 0] < self.cam.width)
               & (uv[:, 1] > 0) & (uv[:, 1] < self.cam.height))
        pts_c, Xc, uv = pts_c[inb], Xc[inb], uv[inb]
        if len(pts_c) == 0:
            return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32)
        m = min(len(pts_c), cap)
        descA = np.zeros((cap, 256), np.uint8)
        uvA = np.zeros((cap, 2), np.float32)
        vA = np.zeros(cap, bool)
        descA[:m] = smap.pt_desc[pts_c[:m]]
        uvA[:m] = uv[:m]
        vA[:m] = True
        bound_k = smap.kf_feat_pt[kf] >= 0
        idx, ok = matching.match_with_windows(
            jnp.asarray(descA), jnp.asarray(vA),
            jnp.asarray(smap.kf_feat_desc[kf]), jnp.asarray(bound_k),
            uv_pred1=jnp.asarray(uvA),
            uv2=jnp.asarray(smap.kf_feat_uv[kf]), radius=radius,
            max_dist=matching.TH_HIGH, ratio=0.9, mutual=True)
        idx = np.asarray(idx)[:m]
        rows = np.nonzero(np.asarray(ok)[:m])[0]
        if len(rows) == 0:
            return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32)
        pk = smap.kf_feat_pt[kf, idx[rows]]
        good = smap.pt_valid[pk]
        rows, pk = rows[good], pk[good]
        Xk = smap.pt_xyz[pk] @ smap.kf_R[kf].T + smap.kf_t[kf]
        return Xc[rows].astype(np.float32), Xk.astype(np.float32)

    @staticmethod
    def _refine_sim3(Xc, Xk, S0, iters: int = 3, th: float = 0.08):
        """Alternate Horn closed-form fit and relative-residual gating
        (|S(Xc) - Xk| < th * depth)."""
        from ..geometry.sim3 import horn_sim3
        R, t, s = S0
        keep = np.ones(len(Xc), bool)
        ni = int(keep.sum())
        for _ in range(iters):
            pred = s * (Xc @ np.asarray(R).T) + np.asarray(t)
            err = np.linalg.norm(pred - Xk, axis=-1)
            scale_ref = np.maximum(np.abs(Xk[:, 2]), 0.5)
            keep = err < th * scale_ref
            ni = int(keep.sum())
            if ni < 4:
                return np.asarray(R), np.asarray(t), float(s), ni
            R_, t_, s_ = horn_sim3(jnp.asarray(Xc), jnp.asarray(Xk),
                                   jnp.asarray(keep))
            R, t, s = np.asarray(R_), np.asarray(t_), float(s_)
        return R, t, s, ni

    # ------------------------------------------------------------- correction
    def correct(self, smap: SlamMap, kf: int, cand: int, S_ck):
        """Apply the loop: essential-graph optimization with the loop edge.

        S_ck = (R,t,s): cand-camera -> kf-camera similarity measured by
        ComputeSim3. Edges: covisibility chain (weight >= covis_weight) +
        consecutive-KF odometry + the loop edge. Node Sim3 = (R_kw, t_kw, 1).
        """
        K = smap.n_kf
        if K > MAX_PG_NODES:
            # essential-graph capacity guard: beyond this the dense pose-
            # graph solve should move to the sharded path; skip correction
            # rather than crash (loop detection keeps running)
            return False
        Rn = smap.kf_R[:K].copy()
        tn = smap.kf_t[:K].copy()
        sn = np.ones(K, np.float32)

        edges = []  # (i, j, R_ji, t_ji, s_ji, w)

        def rel(i, j):
            # S_ji = S_j * S_i^-1 from current estimates
            Ri, ti, si = sim3_inv(jnp.asarray(Rn[i]), jnp.asarray(tn[i]), 1.0)
            return sim3_mul(jnp.asarray(Rn[j]), jnp.asarray(tn[j]), 1.0,
                            Ri, ti, si)

        for j in range(1, K):
            R_, t_, s_ = rel(j - 1, j)
            edges.append((j - 1, j, np.asarray(R_), np.asarray(t_), float(s_),
                          1.0))
        # strong covisibility edges
        for i in range(K):
            cov = smap.covisibility(i)
            for j in np.nonzero(cov >= self.covis_weight)[0]:
                if j > i + 1:
                    R_, t_, s_ = rel(i, int(j))
                    edges.append((i, int(j), np.asarray(R_), np.asarray(t_),
                                  float(s_), 1.0))
        # the loop edge: S_kf<-cand measured
        Rm, tm, sm = S_ck
        edges.append((cand, kf, Rm, tm, sm, 5.0))

        E = MAX_PG_EDGES
        edges = edges[:E]
        ei = np.zeros(E, np.int32)
        ej = np.zeros(E, np.int32)
        eR = np.tile(np.eye(3, dtype=np.float32), (E, 1, 1))
        et = np.zeros((E, 3), np.float32)
        es = np.ones(E, np.float32)
        ew = np.zeros(E, np.float32)
        for n, (i, j, R_, t_, s_, w_) in enumerate(edges):
            ei[n] = i
            ej[n] = j
            eR[n] = R_
            et[n] = t_
            es[n] = s_
            ew[n] = w_

        fixed = np.zeros(K, bool)
        fixed[cand] = True  # the loop-origin side anchors the gauge
        fixed[0] = True

        res = optimize_pose_graph(
            jnp.asarray(Rn), jnp.asarray(tn), jnp.asarray(sn),
            jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(eR),
            jnp.asarray(et), jnp.asarray(es), jnp.asarray(ew),
            jnp.asarray(fixed), n_nodes=K, iters=25)

        newR = np.asarray(res.R)
        newt = np.asarray(res.t)
        news = np.asarray(res.s)

        # remap points through their reference KF's correction:
        # X' = S_new^-1 ( S_old (X) ) per point, using the ref KF sim3
        for k in range(K):
            pts = smap.kf_feat_pt[k]
            pts = np.unique(pts[pts >= 0])
            pts = pts[smap.pt_ref_kf[pts] == k]
            if len(pts) == 0:
                continue
            Xc_old = smap.pt_xyz[pts] @ smap.kf_R[k].T + smap.kf_t[k]
            Ri, ti, si = sim3_inv(jnp.asarray(newR[k]), jnp.asarray(newt[k]),
                                  float(news[k]))
            Xw_new = np.asarray(sim3_apply(Ri, ti, si, jnp.asarray(Xc_old)))
            smap.pt_xyz[pts] = Xw_new

        # write back SE3 poses: Tcw = [R, t/s] (reference :2320-2330)
        for k in range(K):
            smap.kf_R[k] = newR[k]
            smap.kf_t[k] = newt[k] / news[k]
        smap.sync_ref_poses()
        self.last_loop_kf = kf
        return True

    # ------------------------------------------------------------- entry
    def process_keyframe(self, smap: SlamMap, kf: int, bow_vec) -> bool:
        cand = self.detect(smap, kf, bow_vec)
        if cand is None:
            return False
        s3 = self.compute_sim3(smap, kf, cand)
        if s3 is None:
            return False
        R, t, s, _ = s3
        return self.correct(smap, kf, cand, (R, t, s))
