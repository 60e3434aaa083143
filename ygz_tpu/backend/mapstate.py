"""Struct-of-arrays SLAM map (host-resident, numpy; device views per call).

Replaces the reference's pointer graph (KeyFrame/MapPoint/Map with per-object
mutexes, /root/reference/src/{KeyFrame,MapPoint,Map}.cc) with fixed-capacity
arrays + validity masks. All mutation happens on the host between jitted
steps, so there is no locking; jitted numerics receive padded array views.

Covisibility is recomputed from the binding table (kf_feat_pt) on demand —
the reference maintains it incrementally under mutexes
(KeyFrame::UpdateConnections src/KeyFrame.cc:493); at our capacities a numpy
bincount over bindings is microseconds.

Per-point direct-tracking state: each map point stores a PATCH x PATCH
reference patch captured from its reference keyframe's pyramid level, plus
the capture geometry (pose, uv, level, depth). Direct local-map tracking
warps these stored patches instead of gathering from many keyframe images —
a batched, cache-friendly reformulation of ORBmatcher::FindDirectProjection
(src/ORBmatcher.cc:1573-1602) + SelectNearestKeyframe (src/Tracking.cc:2412).
Patches are refreshed whenever the point is re-observed in a new keyframe.
"""
from __future__ import annotations

import numpy as np

REF_PATCH = 20  # stored ref patch side (warped 10x10 windows sampled inside)


class SlamMap:
    def __init__(self, max_kf: int = 256, max_pt: int = 16384,
                 max_feat: int = 640):
        self.max_kf = max_kf
        self.max_pt = max_pt
        self.max_feat = max_feat

        self.kf_R = np.zeros((max_kf, 3, 3), np.float32)
        self.kf_t = np.zeros((max_kf, 3), np.float32)
        self.kf_valid = np.zeros(max_kf, bool)
        self.kf_ts = np.zeros(max_kf, np.float64)
        self.kf_frame_id = np.zeros(max_kf, np.int64)

        # spanning tree (reference KeyFrame parent/children,
        # include/KeyFrame.h:77-87): parent = strongest-covisibility older
        # KF; culled KFs store their pose RELATIVE to the parent (the
        # reference's mTcp, src/KeyFrame.cc:639) so trajectory recovery can
        # walk past them after later optimizations move the survivors
        # (System::SaveTrajectoryTUM chain walk, src/System.cc:488-494).
        self.kf_parent = np.full(max_kf, -1, np.int64)
        self.kf_cull_R = np.zeros((max_kf, 3, 3), np.float32)  # T_cp rotation
        self.kf_cull_t = np.zeros((max_kf, 3), np.float32)

        self.kf_feat_uv = np.zeros((max_kf, max_feat, 2), np.float32)
        self.kf_feat_level = np.zeros((max_kf, max_feat), np.int32)
        self.kf_feat_desc = np.zeros((max_kf, max_feat, 256), np.uint8)
        self.kf_feat_angle = np.zeros((max_kf, max_feat), np.float32)
        self.kf_feat_valid = np.zeros((max_kf, max_feat), bool)
        self.kf_feat_pt = np.full((max_kf, max_feat), -1, np.int64)
        # right-image u coordinate of stereo/RGB-D observations (the
        # reference's mvuRight, src/Frame.cc:509-701); -1 = monocular. BA and
        # pose optimization turn these into 3-D (u,v,u_r) edges.
        self.kf_feat_ur = np.full((max_kf, max_feat), -1.0, np.float32)
        # True while a deferred keyframe's descriptor/angle rows are still
        # placeholders (async off-thread extraction, tracker._extract_into_kf
        # clears it). Descriptor consumers (ref-KF fallback matching) must
        # skip pending keyframes (ADVICE r4).
        self.kf_feat_pending = np.zeros(max_kf, bool)
        # bumped whenever a KF's feature rows (uv/desc/valid) are written;
        # keys the device-resident feature mirrors (mapping._kf_dev_feats)
        # that keep fuse/triangulate/BoW from re-uploading ~150 KB of
        # descriptors per call over the tunnel (PERF_r05.md). Not persisted
        # — mirrors rebuild lazily after load/reconnect.
        self.kf_feat_version = np.zeros(max_kf, np.int64)

        self.pt_xyz = np.zeros((max_pt, 3), np.float32)
        self.pt_valid = np.zeros(max_pt, bool)
        self.pt_obs = np.zeros(max_pt, np.int32)       # keyframe observations
        self.pt_visible = np.zeros(max_pt, np.int32)   # frustum appearances
        self.pt_found = np.zeros(max_pt, np.int32)     # successful tracks
        self.pt_first_kf = np.full(max_pt, -1, np.int64)
        self.pt_desc = np.zeros((max_pt, 256), np.uint8)

        # direct-tracking reference patch state
        self.pt_patch = np.zeros((max_pt, REF_PATCH, REF_PATCH), np.float32)
        self.pt_ref_uv = np.zeros((max_pt, 2), np.float32)   # level-0 coords
        self.pt_ref_level = np.zeros(max_pt, np.int32)
        self.pt_ref_kf = np.zeros(max_pt, np.int64)           # capture KF
        self.pt_ref_R = np.zeros((max_pt, 3, 3), np.float32)  # world->refcam
        self.pt_ref_t = np.zeros((max_pt, 3), np.float32)

        # per-KF image pyramid (device arrays), used for subpixel
        # re-matching during triangulation and patch refresh
        self.kf_pyr = [None] * max_kf

        self.n_kf = 0
        self.n_pt = 0

    def sync_ref_poses(self):
        """Re-gather every point's stored reference pose from its capture
        keyframe. MUST be called after any optimization that moves keyframe
        poses (local BA, loop correction): a stale capture pose makes the
        direct tracker's affine warps inconsistent with the optimized map —
        the cache splits into two populations and pose estimation turns
        bistable (the root cause of the first E2E divergence)."""
        n = self.n_pt
        if n == 0:
            return
        refs = self.pt_ref_kf[:n]
        self.pt_ref_R[:n] = self.kf_R[refs]
        self.pt_ref_t[:n] = self.kf_t[refs]

    # ------------------------------------------------------------- persistence
    _SAVED = ("kf_R", "kf_t", "kf_valid", "kf_ts", "kf_frame_id",
              "kf_parent", "kf_cull_R", "kf_cull_t",
              "kf_feat_uv", "kf_feat_level", "kf_feat_desc", "kf_feat_angle",
              "kf_feat_valid", "kf_feat_pt", "kf_feat_ur",
              "pt_xyz", "pt_valid", "pt_obs", "pt_visible", "pt_found",
              "pt_first_kf", "pt_desc", "pt_patch", "pt_ref_uv",
              "pt_ref_level", "pt_ref_kf", "pt_ref_R", "pt_ref_t")

    def save(self, path: str, extra: dict = None):
        """Serialize the full map to one .npz (SaveMap is an unimplemented
        TODO in the reference, include/System.h:129-131 — here it is a
        capability: localization-only sessions can start from a saved map).
        Keyframe pyramids are not stored (they are tracking-time caches).
        `extra`: additional arrays stored alongside (e.g. the BoW state)."""
        arrs = {k: getattr(self, k) for k in self._SAVED}
        if extra:
            arrs.update(extra)
        arrs["n_kf"] = np.int64(self.n_kf)
        arrs["n_pt"] = np.int64(self.n_pt)
        arrs["caps"] = np.array([self.max_kf, self.max_pt, self.max_feat],
                                np.int64)
        np.savez_compressed(path, **arrs)

    @classmethod
    def load(cls, path: str) -> "SlamMap":
        z = np.load(path)
        mk, mp, mf = (int(v) for v in z["caps"])
        m = cls(max_kf=mk, max_pt=mp, max_feat=mf)
        for k in cls._SAVED:
            if k in z:  # tolerate maps saved before a field existed
                getattr(m, k)[...] = z[k]
        m.n_kf = int(z["n_kf"])
        m.n_pt = int(z["n_pt"])
        return m

    # ------------------------------------------------------------------ growth
    _KF_ARRS = ("kf_R", "kf_t", "kf_valid", "kf_ts", "kf_frame_id",
                "kf_parent", "kf_cull_R", "kf_cull_t", "kf_feat_uv",
                "kf_feat_level", "kf_feat_desc", "kf_feat_angle",
                "kf_feat_valid", "kf_feat_pt", "kf_feat_ur",
                "kf_feat_pending", "kf_feat_version")
    _PT_ARRS = ("pt_xyz", "pt_valid", "pt_obs", "pt_visible", "pt_found",
                "pt_first_kf", "pt_desc", "pt_patch", "pt_ref_uv",
                "pt_ref_level", "pt_ref_kf", "pt_ref_R", "pt_ref_t")

    def _grow_kf(self):
        """Double keyframe capacity (fixed caps keep jitted shapes static;
        growth re-allocates the host arrays only — device views are made
        fresh per call)."""
        new = self.max_kf * 2
        for name in self._KF_ARRS:
            arr = getattr(self, name)
            pad = np.zeros((new - self.max_kf,) + arr.shape[1:], arr.dtype)
            if name in ("kf_feat_pt", "kf_parent", "kf_feat_ur"):
                pad[...] = -1
            setattr(self, name, np.concatenate([arr, pad]))
        self.kf_pyr = self.kf_pyr + [None] * (new - self.max_kf)
        self.max_kf = new

    def _grow_pt(self):
        new = self.max_pt * 2
        for name in self._PT_ARRS:
            arr = getattr(self, name)
            pad = np.zeros((new - self.max_pt,) + arr.shape[1:], arr.dtype)
            if name == "pt_first_kf":
                pad[...] = -1
            setattr(self, name, np.concatenate([arr, pad]))
        self.max_pt = new

    # ---------------------------------------------------------------- keyframes
    def add_keyframe(self, R, t, feats, ts=0.0, frame_id=0,
                     pyramid=None) -> int:
        """feats: dict-like with uv [M,2], level, angle, desc, valid (numpy)."""
        if self.n_kf >= self.max_kf:
            self._grow_kf()
        k = self.n_kf
        self.n_kf += 1
        self.kf_pyr[k] = pyramid
        self.kf_R[k] = R
        self.kf_t[k] = t
        self.kf_valid[k] = True
        self.kf_ts[k] = ts
        self.kf_frame_id[k] = frame_id
        m = min(len(feats["uv"]), self.max_feat)
        self.kf_feat_uv[k, :m] = feats["uv"][:m]
        self.kf_feat_level[k, :m] = feats["level"][:m]
        self.kf_feat_desc[k, :m] = feats["desc"][:m]
        self.kf_feat_angle[k, :m] = feats["angle"][:m]
        self.kf_feat_valid[k, :m] = feats["valid"][:m]
        if "ur" in feats:
            self.kf_feat_ur[k, :m] = feats["ur"][:m]
        self.kf_feat_version[k] += 1
        return k

    def set_pose(self, k, R, t):
        self.kf_R[k] = R
        self.kf_t[k] = t

    # ------------------------------------------------------------ spanning tree
    def assign_parent(self, k: int):
        """Set k's spanning-tree parent to its strongest-covisibility OLDER
        valid keyframe (reference KeyFrame::UpdateConnections first-call
        parent assignment, src/KeyFrame.cc:529-537). Older-only keeps the
        tree acyclic. No-op if a parent is already set or none qualifies."""
        if k >= self.n_kf or self.kf_parent[k] >= 0 or k == 0:
            return
        cov = self.covisibility(k)
        cov = cov[:k]  # older KFs only
        cov = np.where(self.kf_valid[:k], cov, 0)
        if len(cov) and cov.max() > 0:
            self.kf_parent[k] = int(np.argmax(cov))

    def mark_culled(self, k: int, parent: int):
        """Freeze a culled KF's pose relative to `parent` (reference
        KeyFrame::SetBadFlag storing mTcp, src/KeyFrame.cc:639-741).
        `parent` may itself be culled — its current pose is resolved through
        the chain. Already-culled children keep pointing at k (their stored
        T_cp composes through k's); only live children are re-parented."""
        Rp, tp = self.resolve_pose(parent)
        self.kf_cull_R[k] = self.kf_R[k] @ Rp.T
        self.kf_cull_t[k] = self.kf_t[k] - self.kf_cull_R[k] @ tp
        self.kf_parent[k] = parent
        children = np.nonzero(self.kf_parent[: self.n_kf] == k)[0]
        children = children[(children != k) & self.kf_valid[children]]
        self.kf_parent[children] = parent

    def resolve_pose(self, k: int):
        """Current world->cam pose of KF k, walking the culled chain: a
        culled KF's pose is T_cp composed onto its (possibly also culled)
        parent's resolved pose."""
        R = np.eye(3, dtype=np.float32)
        t = np.zeros(3, np.float32)
        hops = 0
        while not self.kf_valid[k] and self.kf_parent[k] >= 0 \
                and hops < self.max_kf:
            R2 = R @ self.kf_cull_R[k]
            t = R @ self.kf_cull_t[k] + t
            R = R2
            k = int(self.kf_parent[k])
            hops += 1
        return R @ self.kf_R[k], R @ self.kf_t[k] + t

    # ---------------------------------------------------------------- points
    def alloc_points(self, n: int) -> np.ndarray:
        while self.n_pt + n > self.max_pt:
            self._grow_pt()
        ids = np.arange(self.n_pt, self.n_pt + n)
        self.n_pt += n
        return ids

    def bind(self, kf: int, slots, pt_ids):
        """Associate feature slots of a KF with map points (observation)."""
        slots = np.asarray(slots)
        pt_ids = np.asarray(pt_ids)
        old = self.kf_feat_pt[kf, slots]
        newly = old != pt_ids
        self.kf_feat_pt[kf, slots] = pt_ids
        np.add.at(self.pt_obs, pt_ids[newly & (pt_ids >= 0)], 1)
        np.add.at(self.pt_obs, old[newly & (old >= 0)], -1)

    def replace_point(self, old: int, new: int):
        """Merge duplicate landmarks: rebind every observation of `old` onto
        `new` and kill `old` (reference MapPoint::Replace,
        src/MapPoint.cc:155). A keyframe keeps at most one binding per point:
        where a KF already observes `new`, the old observation is dropped.
        Track statistics accumulate so found-ratio culling stays fair."""
        if old == new:
            return
        sel = self.kf_feat_pt[: self.n_kf] == old
        has_new = (self.kf_feat_pt[: self.n_kf] == new).any(axis=1)
        for k in np.nonzero(sel.any(axis=1))[0]:
            slots = np.nonzero(sel[k])[0]
            if has_new[k]:
                self.kf_feat_pt[k, slots] = -1
            else:
                self.kf_feat_pt[k, slots[0]] = new
                self.kf_feat_pt[k, slots[1:]] = -1
                self.pt_obs[new] += 1
        self.pt_found[new] += self.pt_found[old]
        self.pt_visible[new] += self.pt_visible[old]
        self.pt_valid[old] = False
        self.pt_obs[old] = 0

    def kill_points(self, pt_ids):
        """Cull map points: invalidate + unbind everywhere."""
        pt_ids = np.asarray(pt_ids)
        if len(pt_ids) == 0:
            return
        self.pt_valid[pt_ids] = False
        sel = np.isin(self.kf_feat_pt[: self.n_kf], pt_ids)
        self.kf_feat_pt[: self.n_kf][sel] = -1
        self.pt_obs[pt_ids] = 0

    # ------------------------------------------------------------- covisibility
    def covisibility(self, kf: int):
        """[n_kf] shared-point counts between `kf` and every other KF."""
        pts = self.kf_feat_pt[kf]
        pts = pts[pts >= 0]
        counts = np.zeros(self.n_kf, np.int64)
        if len(pts) == 0:
            return counts
        mask = np.isin(self.kf_feat_pt[: self.n_kf], pts)
        counts = mask.sum(axis=1)
        counts[kf] = 0
        return counts

    def covisibility_matrix(self):
        """[n_kf, n_kf] shared-point counts for ALL keyframe pairs — the
        batched form of per-KF UpdateConnections (src/KeyFrame.cc:493),
        used to build the essential graph's covisibility edges in one shot."""
        K = self.n_kf
        binds = self.kf_feat_pt[:K]
        kk, ss = np.nonzero(binds >= 0)
        pids = binds[kk, ss]
        uniq, inv = np.unique(pids, return_inverse=True)
        inc = np.zeros((K, len(uniq)), np.float32)
        inc[kk, inv] = 1.0
        C = inc @ inc.T
        np.fill_diagonal(C, 0)
        return C.astype(np.int64)

    def local_window(self, kf: int, size: int):
        """KF ids of the covisibility-ranked local window including `kf`."""
        cov = self.covisibility(kf)
        order = np.argsort(-cov)
        sel = [kf] + [int(i) for i in order if cov[i] > 0][: size - 1]
        return sel

    def points_in_kfs(self, kf_ids):
        """Unique valid point ids observed by the given KFs."""
        pts = self.kf_feat_pt[kf_ids]
        pts = np.unique(pts[pts >= 0])
        return pts[self.pt_valid[pts]]

    def observations(self, kf_ids, pt_ids):
        """Observation table restricted to (kf_ids x pt_ids).

        Returns (obs_kf_local, obs_pt_local, obs_uv, obs_level, obs_ur) with
        local indices into kf_ids / pt_ids; obs_ur is the right-image u
        coordinate (-1 for monocular observations).
        """
        kf_ids = np.asarray(kf_ids)
        pt_map = np.full(self.max_pt, -1, np.int64)
        pt_map[pt_ids] = np.arange(len(pt_ids))
        o_kf, o_pt, o_uv, o_lvl, o_ur = [], [], [], [], []
        for loc, k in enumerate(kf_ids):
            binds = self.kf_feat_pt[k]
            slots = np.nonzero(binds >= 0)[0]
            lp = pt_map[binds[slots]]
            keep = lp >= 0
            slots = slots[keep]
            lp = lp[keep]
            o_kf.append(np.full(len(slots), loc, np.int32))
            o_pt.append(lp.astype(np.int32))
            o_uv.append(self.kf_feat_uv[k, slots])
            o_lvl.append(self.kf_feat_level[k, slots])
            o_ur.append(self.kf_feat_ur[k, slots])
        return (np.concatenate(o_kf), np.concatenate(o_pt),
                np.concatenate(o_uv), np.concatenate(o_lvl),
                np.concatenate(o_ur))
