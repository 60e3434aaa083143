"""Monocular tracking front-end: host state machine over jitted device steps.

Re-design of the reference Tracking thread (/root/reference/src/Tracking.cc
:399-738): the same pipeline — initialize -> predict pose (sparse direct
alignment seeded by a motion model) -> direct local-map tracking with a point
cache -> pose-only GN -> keyframe decision — but with all numerics as a few
batched jitted megafunctions and all map state functional (no map-wide mutex;
the reference holds Map::mMutexMapUpdate for the whole Track() call,
src/Tracking.cc:407).

Per-frame device work: build pyramid; sparse_image_align; track_local_map
(warp + KLT + pose GN). Host work is O(#points) bookkeeping in numpy.
"""
from __future__ import annotations

import enum
import queue
import threading
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..backend.mapstate import SlamMap
from ..backend.mapping import LocalMapper
from ..backend.bow import train_vocabulary, BowIndex
from ..backend.loopclosing import LoopCloser
from ..backend.pnp import pnp_ransac
from ..geometry import camera as cam_mod
from ..geometry.twoview import two_view_reconstruct
from ..ops import matching, select
from ..ops.image import build_pyramid
from .extractor import OrbExtractor, describe_at
from .sparse_align import sparse_image_align
from .direct_tracker import track_local_map_direct, capture_ref_patches


class State(enum.Enum):
    NOT_INITIALIZED = 0
    OK = 1
    LOST = 2


@dataclass
class TrackerConfig:
    n_features: int = 512
    keypoint_mode: str = "grid"   # 'grid' (DSO selector) | 'octree'
    n_levels: int = 4
    scale_factor: float = 2.0
    fast_th: float = 20.0
    fast_th_min: float = 7.0
    max_track: int = 512          # direct-tracking cache capacity
    cache_refill_below: int = 150  # reference Tracking.CacheFeatures default
    min_align_points: int = 30    # reference needs >=30 to sparse-align
    min_track_inliers: int = 30   # TrackLocalMap success gate
    min_init_matches: int = 100   # monocular init gate (reference :842)
    kf_ratio: float = 0.75        # c2: inliers < 0.75 * ref-KF tracked
    kf_min_gap: int = 3           # min frames between KFs
    kf_max_gap: int = 30          # force KF after this many frames
    ba_window: int = 6
    enable_loop_closing: bool = True
    enable_relocalization: bool = True
    vocab_branching: int = 8
    vocab_depth: int = 3
    # run the mapping tail (triangulation, fusion, BA, culling, loop
    # closing) on a background thread — the async counterpart of the
    # reference's LocalMapping thread. Tracking then returns the pre-BA
    # frame pose; BA corrections land through the shared map under a lock.
    async_mapping: bool = False


@dataclass
class FrameRecord:
    """Per-frame trajectory log entry. R/t is the live world->cam estimate
    at track time; ref_kf + (R_r, t_r) store the pose RELATIVE to the
    reference keyframe (the reference's mlRelativeFramePoses,
    include/Tracking.h:108-114) so later map optimizations (local/global BA,
    loop correction) propagate into the exported trajectory."""
    ts: float
    R: np.ndarray
    t: np.ndarray
    state: str
    ref_kf: int = -1
    R_r: np.ndarray = None
    t_r: np.ndarray = None


class MonoTracker:
    def __init__(self, cam: cam_mod.Camera, cfg: TrackerConfig = None):
        self.cam = cam
        self.cfg = cfg or TrackerConfig()
        self.intr = (cam.fx, cam.fy, cam.cx, cam.cy)
        self.extractor = OrbExtractor(
            n_features=self.cfg.n_features, n_levels=self.cfg.n_levels,
            scale_factor=self.cfg.scale_factor, fast_th=self.cfg.fast_th,
            fast_th_min=self.cfg.fast_th_min, mode=self.cfg.keypoint_mode)
        self.map = SlamMap(max_feat=1024)
        self.mapper = LocalMapper(cam, n_levels=self.cfg.n_levels,
                                  window=self.cfg.ba_window)
        self.state = State.NOT_INITIALIZED
        self.frame_id = -1
        self.trajectory: list[FrameRecord] = []

        # undistortion remap (None when the camera has no distortion)
        if float(np.abs(np.asarray(cam.dist)).sum()) > 0:
            mu, mv = cam_mod.undistort_remap_grid(cam)
            self._remap = (mu, mv)
        else:
            self._remap = None

        # init bootstrap state
        self._init_feats = None
        self._init_pyr = None
        self._init_ts = None

        # last-frame state for sparse alignment
        self._last_pyr = None
        self._last_R = None
        self._last_t = None
        self._last_uv = None        # [max_track,2] tracked uv (level-0)
        self._last_Xc = None        # [max_track,3] points in last cam frame
        self._last_valid = None
        self._vel = (np.eye(3, dtype=np.float32), np.zeros(3, np.float32))

        self._cache = np.zeros(0, np.int64)   # map point ids in direct cache
        self.debug = {}
        # place recognition: vocabulary trained in-system at map init
        self.bow_index: BowIndex = None
        self.loop_closer: LoopCloser = None
        self.n_loops_closed = 0
        self._last_kf = -1
        self._last_kf_frame = -1
        self._kf_ref_tracked = 0
        self._rng = jax.random.PRNGKey(0)
        # localization-only: track against the frozen map, no KFs/mapping
        # (reference ActivateLocalizationMode, src/System.cc:97-125)
        self.localization_only = False

        # async mapping pipeline (reference: LocalMapping thread,
        # src/System.cc:221-222). The map lock replaces the reference's
        # Map::mMutexMapUpdate but is held only for array reads/commits,
        # never across device computation.
        self._map_lock = threading.RLock()
        self._map_queue: queue.Queue = queue.Queue()
        self._map_worker = None
        self._map_worker_error = None
        if self.cfg.async_mapping:
            self._map_worker = threading.Thread(
                target=self._mapping_worker, daemon=True)
            self._map_worker.start()

    def _mapping_worker(self):
        while True:
            job = self._map_queue.get()
            if job is None:
                self._map_queue.task_done()
                return
            try:
                job()
            except Exception as e:  # surfaced via wait_mapping_idle
                self._map_worker_error = e
            finally:
                self._map_queue.task_done()

    def wait_mapping_idle(self):
        """Block until the background mapping queue drains."""
        self._map_queue.join()
        if self._map_worker_error is not None:
            err = self._map_worker_error
            self._map_worker_error = None
            raise err

    def reset(self, keep_trajectory: bool = True):
        """Clear map and tracking state (reference Tracking::Reset,
        src/Tracking.cc:1980-2028)."""
        traj = self.trajectory if keep_trajectory else []
        # bake relative-pose records to absolute against the dying map —
        # their ref_kf ids would otherwise dangle into the NEW map
        for rec in traj:
            if rec.ref_kf >= 0:
                rec.R, rec.t = self.recovered_pose(rec)
                rec.ref_kf, rec.R_r, rec.t_r = -1, None, None
        fid = self.frame_id
        self.__init__(self.cam, self.cfg)
        self.trajectory = traj
        self.frame_id = fid

    # ------------------------------------------------------------------ utils
    def _build_pyramid(self, img):
        img = jnp.asarray(img, jnp.float32)
        if self._remap is not None:
            from ..ops.image import remap
            img = remap(img, *self._remap)
        return build_pyramid(img, self.cfg.n_levels, self.cfg.scale_factor)

    def _pose_np(self, R, t):
        return np.asarray(R), np.asarray(t)

    # ------------------------------------------------------------------ entry
    def track(self, img, ts: float, depth=None):
        """Process one grayscale frame. Returns (state, R, t) with (R,t) the
        world->camera pose estimate (identity until initialized).
        `depth`: optional [H,W] metric depth map (RGB-D mode)."""
        self.frame_id += 1
        self._cur_depth = depth
        pyr = self._build_pyramid(img)

        if self.state == State.NOT_INITIALIZED:
            ok = self._try_initialize(pyr, ts)
            R = self.map.kf_R[self.map.n_kf - 1] if ok else np.eye(3)
            t = self.map.kf_t[self.map.n_kf - 1] if ok else np.zeros(3)
            self._log(ts, R, t)
            return self.state, R, t

        if self.state == State.LOST:
            if self.cfg.enable_relocalization and self._relocalize(pyr):
                self.state = State.OK
            else:
                self._log(ts, self._last_R, self._last_t)
                return self.state, self._last_R, self._last_t

        ok, R, t = self._track_frame(pyr, ts)
        self._log(ts, R, t)
        return self.state, R, t

    def _log(self, ts, R, t):
        R = np.array(R, np.float32)
        t = np.array(t, np.float32)
        ref, R_r, t_r = -1, None, None
        if self.state == State.OK and self._last_kf >= 0:
            with self._map_lock:
                ref = self._last_kf
                Rk, tk = self.map.kf_R[ref], self.map.kf_t[ref]
            # T_cr = T_cw(frame) * inv(T_cw(ref))
            R_r = R @ Rk.T
            t_r = t - R_r @ tk
        self.trajectory.append(FrameRecord(
            ts=ts, R=R, t=t, state=self.state.name,
            ref_kf=ref, R_r=R_r, t_r=t_r))

    def recovered_pose(self, rec: FrameRecord):
        """Frame pose with all post-hoc map corrections applied: compose the
        logged relative pose onto the ref KF's CURRENT pose, walking the
        spanning tree past culled KFs (reference System::SaveTrajectoryTUM,
        src/System.cc:452-508)."""
        if rec.ref_kf < 0 or rec.R_r is None:
            return rec.R, rec.t
        with self._map_lock:
            Rk, tk = self.map.resolve_pose(rec.ref_kf)
        return rec.R_r @ Rk, rec.R_r @ tk + rec.t_r

    @staticmethod
    def _feats_to_dict(feats):
        f = jax.tree.map(np.asarray, feats)
        return {"uv": f.uv, "level": f.level, "angle": f.angle,
                "desc": f.desc, "valid": f.valid}

    # ----------------------------------------------------------------- init
    def _try_initialize(self, pyr, ts) -> bool:
        feats = self.extractor(pyr)
        if self._init_feats is None:
            if int(np.asarray(feats.valid).sum()) >= self.cfg.min_init_matches:
                self._init_feats = self._feats_to_dict(feats)
                self._init_pyr = pyr
                self._init_ts = ts
            return False

        f0, f1 = self._init_feats, feats
        idx, ok = matching.match_with_windows(
            jnp.asarray(f0["desc"]), jnp.asarray(f0["valid"]),
            f1.desc, f1.valid,
            uv_pred1=jnp.asarray(f0["uv"]), uv2=f1.uv, radius=100.0,
            max_dist=matching.TH_LOW, ratio=0.9,
            ang1=jnp.asarray(f0["angle"]), ang2=f1.angle, mutual=True)
        idx = np.asarray(idx)
        okm = np.asarray(ok)
        n_matches = int(okm.sum())
        if n_matches < self.cfg.min_init_matches:
            # stale reference: restart bootstrapping from this frame
            self._init_feats = self._feats_to_dict(feats)
            self._init_pyr = pyr
            self._init_ts = ts
            return False

        uv1 = f0["uv"]
        uv2 = np.asarray(f1.uv)[np.clip(idx, 0, len(np.asarray(f1.uv)) - 1)]
        self._rng, key = jax.random.split(self._rng)
        res = two_view_reconstruct(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(okm),
            jnp.asarray(self.cam.K), key)
        if not bool(res.ok):
            return False

        self._create_initial_map(res, idx, feats, pyr, ts)
        return True

    def _create_initial_map(self, res, idx, feats1, pyr1, ts1):
        """Two KFs + triangulated points; scale so median depth = 1
        (reference CreateInitialMapMonocular src/Tracking.cc:863)."""
        good = np.asarray(res.good)
        X = np.asarray(res.points)          # in cam0 frame == world
        R1 = np.asarray(res.R)
        t1 = np.asarray(res.t)
        med = float(np.median(X[good][:, 2]))
        X = X / med
        t1 = t1 / med

        f0 = self._init_feats
        smap = self.map
        kf0 = smap.add_keyframe(np.eye(3, dtype=np.float32),
                                np.zeros(3, np.float32), f0,
                                ts=self._init_ts, frame_id=self.frame_id - 1,
                                pyramid=self._init_pyr)
        kf1 = smap.add_keyframe(R1, t1, self._feats_to_dict(feats1), ts=ts1,
                                frame_id=self.frame_id, pyramid=pyr1)

        slots0 = np.nonzero(good)[0]
        slots1 = idx[slots0]
        # only keep points whose reference patch (captured from KF1) is clean
        inb = self.mapper.patch_in_bounds(
            smap.kf_feat_uv[kf1, slots1], smap.kf_feat_level[kf1, slots1])
        slots0 = slots0[inb]
        slots1 = slots1[inb]
        ids = smap.alloc_points(len(slots0))
        smap.pt_xyz[ids] = X[slots0]
        smap.pt_valid[ids] = True
        smap.pt_first_kf[ids] = kf0
        smap.pt_desc[ids] = f0["desc"][slots0]
        smap.bind(kf0, slots0, ids)
        smap.bind(kf1, slots1, ids)
        self.mapper.refresh_patches(smap, kf1, pyr1, ids, slots1)

        # initial bundle adjustment over the 2-KF map
        self.mapper.local_ba(smap, kf1)
        # re-normalize scale after BA (BA may drift the free scale gauge)
        med2 = self.mapper.median_depth(smap, kf0)
        smap.pt_xyz[: smap.n_pt] /= med2
        smap.kf_t[:2] /= med2
        self.mapper.refresh_patches(smap, kf1, pyr1, ids, slots1)

        # train the place-recognition vocabulary on the initial descriptors
        # (the reference ships an offline 1M-word ORBvoc; we train in-system
        # on the engine's own BRIEF pattern — small but self-consistent)
        if self.cfg.enable_loop_closing or self.cfg.enable_relocalization:
            desc = np.concatenate([
                f0["desc"][f0["valid"]],
                self._feats_to_dict(feats1)["desc"][np.asarray(feats1.valid)]])
            doc = np.concatenate([
                np.zeros(int(f0["valid"].sum()), np.int64),
                np.ones(int(np.asarray(feats1.valid).sum()), np.int64)])
            vocab = train_vocabulary(desc, branching=self.cfg.vocab_branching,
                                    depth=self.cfg.vocab_depth, doc_ids=doc)
            self.bow_index = BowIndex(vocab, max_kf=smap.max_kf)
            self.loop_closer = LoopCloser(self.bow_index, self.cam)
            for k in (kf0, kf1):
                _, bow = self.bow_index.quantize(
                    smap.kf_feat_desc[k], smap.kf_feat_valid[k])
                self.bow_index.add_keyframe(k, bow)

        smap.kf_parent[kf1] = kf0
        self.state = State.OK
        self._last_kf = kf1
        self._last_kf_frame = self.frame_id
        self._kf_ref_tracked = len(ids)
        self._rebuild_cache()
        self._set_last_frame(pyr1, smap.kf_R[kf1], smap.kf_t[kf1],
                             cache_uv=None)
        R0, t0 = smap.kf_R[kf0], smap.kf_t[kf0]
        self._vel = (np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
        del R0, t0

    # ------------------------------------------------------------- main track
    def _track_frame(self, pyr, ts):
        cfg = self.cfg
        smap = self.map

        # motion-model prediction: T_pred = T_vel * T_last (the mono-VI
        # subclass overrides _predict_pose with IMU propagation,
        # reference PredictNavStateByIMU src/Tracking.cc:2078)
        pred = self._predict_pose()
        if pred is not None:
            R_pred, t_pred = pred
        else:
            Rv, tv = self._vel
            R_pred = Rv @ self._last_R
            t_pred = Rv @ self._last_t + tv

        # ---- sparse image alignment from last frame ----------------------
        self.debug = {"n_align_in": int(self._last_valid.sum())}
        n_align = self.debug["n_align_in"]
        if n_align >= cfg.min_align_points:
            # init from identity, not the velocity model: the coarse-level
            # basin covers normal inter-frame motion, and seeding with the
            # velocity couples extrapolated error into the measurement loop
            # (velocity extrapolation doubles pose error per frame; with any
            # under-correction downstream the loop gain exceeds 1)
            res = sparse_image_align(
                self._last_pyr, pyr,
                jnp.asarray(self._last_uv), jnp.asarray(self._last_Xc),
                jnp.asarray(self._last_valid), self.intr,
                jnp.eye(3), jnp.zeros(3),
                levels=tuple(range(cfg.n_levels - 1, 0, -1)), iters=10)
            self.debug["align_n"] = int(res.n_meas)
            self.debug["align_res"] = float(res.mean_res)
            if int(res.n_meas) >= cfg.min_align_points:
                R_cl, t_cl = self._pose_np(res.R, res.t)
                R_pred = R_cl @ self._last_R
                t_pred = R_cl @ self._last_t + t_cl

        # ---- direct local-map tracking ------------------------------------
        # the gather holds the map lock so the async mapper never commits a
        # half-written map state under us (SURVEY §5: snapshot/commit
        # replaces the reference's Map::mMutexMapUpdate)
        with self._map_lock:
            if len(self._cache) < cfg.cache_refill_below:
                self._rebuild_cache()
            ids = self._cache
            n = len(ids)
            cap = cfg.max_track
            pad = cap - n
            g = lambda a: np.concatenate(
                [a[ids], np.zeros((pad,) + a.shape[1:], a.dtype)]) \
                if pad > 0 else a[ids][:cap]
            pvalid = np.concatenate([smap.pt_valid[ids],
                                     np.zeros(pad, bool)]) if pad > 0 \
                else smap.pt_valid[ids][:cap]
            gathered = (g(smap.pt_xyz), g(smap.pt_patch), g(smap.pt_ref_uv),
                        g(smap.pt_ref_level), g(smap.pt_ref_R),
                        g(smap.pt_ref_t))

        g_xyz, g_patch, g_ruv, g_rlvl, g_rR, g_rt = gathered
        dres = track_local_map_direct(
            pyr, jnp.asarray(R_pred.astype(np.float32)),
            jnp.asarray(t_pred.astype(np.float32)),
            jnp.asarray(g_xyz), jnp.asarray(pvalid),
            jnp.asarray(g_patch), jnp.asarray(g_ruv),
            jnp.asarray(g_rlvl), jnp.asarray(g_rR),
            jnp.asarray(g_rt), self.intr,
            n_levels=cfg.n_levels)

        n_inliers = int(dres.n_inliers)
        self.debug.update(
            n_cache=n, n_visible=int(np.asarray(dres.visible)[:n].sum()),
            n_aligned=int(np.asarray(dres.aligned)[:n].sum()),
            n_inliers=n_inliers)
        tracked = np.asarray(dres.tracked)[:n]
        visible = np.asarray(dres.visible)[:n]
        uv = np.asarray(dres.uv)[:n]
        lvl = np.asarray(dres.level)[:n]
        self.debug["viz_uv"] = uv[tracked]  # for viz.draw_tracked_frame

        # update found/visible statistics
        np.add.at(smap.pt_visible, ids[visible], 1)
        np.add.at(smap.pt_found, ids[tracked], 1)

        if n_inliers < cfg.min_track_inliers:
            if self._on_vision_failed(pyr, ts, R_pred, t_pred):
                # IMU-only fallback kept the state alive (vision-weak mode,
                # reference src/Tracking.cc:684-698)
                self._set_last_frame(pyr, R_pred, t_pred, cache_uv=None)
                return True, R_pred, t_pred
            last_R = self._last_R
            last_t = self._last_t
            self.state = State.LOST
            # reset-on-early-loss: a map of <=5 KFs is not worth relocalizing
            # against (reference src/Tracking.cc:703-711)
            if smap.n_kf <= 5 and not self.localization_only:
                self.reset()
                self.state = State.NOT_INITIALIZED
            return False, last_R, last_t

        R_cur, t_cur = self._pose_np(dres.R, dres.t)
        # sensor-fusion hook (mono-VI: NavState optimization with the
        # tracked observations + preintegration factor)
        fused = self._fuse_pose(R_cur, t_cur, ids[tracked], uv[tracked],
                                lvl[tracked])
        if fused is not None:
            R_cur, t_cur = fused
        self.state = State.OK

        # velocity model update
        Rl_inv = self._last_R.T
        self._vel = (R_cur @ Rl_inv,
                     t_cur - (R_cur @ Rl_inv) @ self._last_t)

        # NOTE: no single-frame-failure eviction. Evicting points that
        # disagree with the current pose estimate self-selects the cache for
        # drift-compatible points and collapses the correction gain of the
        # tracker (measured: the divergence gain of the whole loop flips
        # above 1). Bad points are removed by found-ratio culling at KFs
        # (the reference evicts more eagerly but re-searches the FULL local
        # map every frame, src/Tracking.cc:2271-2330, which restores lost
        # points — our cache rebuild at KFs plays that role).

        # ---- keyframe decision -------------------------------------------
        gap = self.frame_id - self._last_kf_frame
        need_kf = (not self.localization_only
                   and gap >= cfg.kf_min_gap
                   and (n_inliers < cfg.kf_ratio * self._kf_ref_tracked
                        or gap >= cfg.kf_max_gap
                        or n_inliers < 50))
        if need_kf:
            R_ba, t_ba = self._create_keyframe(pyr, ts, R_cur, t_cur,
                                               ids[tracked], uv[tracked],
                                               lvl[tracked])
            # adopt the BA-corrected pose for this frame
            R_cur, t_cur = R_ba, t_ba

        # ---- record last-frame state for next sparse align ----------------
        self._set_last_frame(pyr, R_cur, t_cur,
                             cache_uv=(ids[tracked], uv[tracked]))
        return True, R_cur, t_cur

    def _set_last_frame(self, pyr, R, t, cache_uv):
        smap = self.map
        cap = self.cfg.max_track
        self._last_pyr = pyr
        self._last_R = np.array(R, np.float32)
        self._last_t = np.array(t, np.float32)
        uv = np.zeros((cap, 2), np.float32)
        Xc = np.zeros((cap, 3), np.float32)
        valid = np.zeros(cap, bool)
        if cache_uv is None:
            # fresh after init: project current map points
            ids = self._cache
            X = smap.pt_xyz[ids]
            Xc_all = X @ self._last_R.T + self._last_t
            uvp = np.stack([
                self.cam.fx * Xc_all[:, 0] / Xc_all[:, 2] + self.cam.cx,
                self.cam.fy * Xc_all[:, 1] / Xc_all[:, 2] + self.cam.cy], -1)
            m = min(len(ids), cap)
            uv[:m] = uvp[:m]
            Xc[:m] = Xc_all[:m]
            valid[:m] = Xc_all[:m, 2] > 0.1
        else:
            ids, uvs = cache_uv
            m = min(len(ids), cap)
            uv[:m] = uvs[:m]
            X = smap.pt_xyz[ids[:m]]
            Xc[:m] = X @ self._last_R.T + self._last_t
            valid[:m] = Xc[:m, 2] > 0.1
        self._last_uv = uv
        self._last_Xc = Xc
        self._last_valid = valid

    def _rebuild_cache(self):
        """Refill the direct cache with local-map points (reference
        SearchLocalPointsDirect cache widening, src/Tracking.cc:2334-2406)."""
        smap = self.map
        if smap.n_kf == 0:
            return
        ref_kf = self._last_kf if self._last_kf >= 0 else smap.n_kf - 1
        win = smap.local_window(ref_kf, 10)
        pts = smap.points_in_kfs(win)
        if len(pts) > self.cfg.max_track:
            order = np.argsort(-smap.pt_obs[pts])
            pts = pts[order[: self.cfg.max_track]]
        self._cache = pts

    # -------------------------------------------------------------- keyframes
    def _create_keyframe(self, pyr, ts, R, t, tracked_ids, tracked_uv,
                         tracked_lvl):
        smap = self.map
        cfg = self.cfg
        cap = cfg.max_track
        m = min(len(tracked_ids), cap)

        # descriptors/angles at tracked positions (deferred extraction — the
        # core of the reference's 3x speedup, include/Frame.h:298)
        uv_pad = np.zeros((cap, 2), np.float32)
        lvl_pad = np.zeros(cap, np.int32)
        val_pad = np.zeros(cap, bool)
        uv_pad[:m] = tracked_uv[:m]
        lvl_pad[:m] = tracked_lvl[:m]
        val_pad[:m] = True
        ang, desc = describe_at(pyr, jnp.asarray(uv_pad),
                                jnp.asarray(lvl_pad), jnp.asarray(val_pad),
                                n_levels=cfg.n_levels,
                                scale_factor=cfg.scale_factor)
        ang = np.asarray(ang)
        desc = np.asarray(desc)

        # occupancy around tracked points, per level
        occ = []
        for l in range(cfg.n_levels):
            s = 0.5 ** l
            h, w = (np.asarray(pyr[l]).shape)
            uv_l = (uv_pad + 0.5) * s - 0.5
            occ.append(select.stamp_occupancy(
                h, w, jnp.asarray(uv_l), jnp.asarray(val_pad),
                radius=max(4, int(8 * s))))
        new_feats = self.extractor(pyr, occupancy=occ)
        nf = jax.tree.map(np.asarray, new_feats)

        feats = {
            "uv": np.concatenate([uv_pad, nf.uv]),
            "level": np.concatenate([lvl_pad, nf.level]),
            "angle": np.concatenate([ang, nf.angle]),
            "desc": np.concatenate([desc, nf.desc]),
            "valid": np.concatenate([val_pad, nf.valid]),
        }
        kf = smap.add_keyframe(R, t, feats, ts=ts, frame_id=self.frame_id,
                               pyramid=pyr)
        smap.bind(kf, np.arange(m), tracked_ids[:m])
        # depth-seeded map points (RGB-D / stereo-depth path; reference
        # CreateNewKeyFrame close-point insertion src/Tracking.cc:1556-1608)
        if self._depth_source_available():
            self._create_depth_points(smap, kf, pyr)
        self._last_kf = kf
        self._last_kf_frame = self.frame_id
        self._kf_ref_tracked = int((smap.kf_feat_pt[kf] >= 0).sum())

        if self.cfg.async_mapping and self._map_worker is not None:
            self._map_queue.put(lambda: self._mapping_tail(kf, pyr))
            # tracking keeps the pre-BA pose; corrections land via the map
            return smap.kf_R[kf].copy(), smap.kf_t[kf].copy()
        self._mapping_tail(kf, pyr)
        # report the post-BA pose of this keyframe to the caller
        return smap.kf_R[kf].copy(), smap.kf_t[kf].copy()

    def _mapping_tail(self, kf, pyr):
        """The LocalMapping duties for one keyframe (triangulate, fuse, BA,
        cull, place recognition, loop closing). Runs synchronously or on the
        mapping worker thread; map mutations hold the map lock."""
        smap = self.map
        with self._map_lock:
            # triangulate new points against recent covisible keyframes
            cov = smap.covisibility(kf)
            partners = list(np.argsort(-cov)[:3])
            for prev in partners:
                if cov[prev] > 0 or prev == self._last_kf:
                    self.mapper.create_new_points(smap, kf, int(prev), pyr)
            # grow observations by binding local-map points to this KF
            self.mapper.bind_map_points(smap, kf)
            smap.assign_parent(kf)
            self.mapper.update_distinctive_descriptors(smap, kf)
            self._run_local_ba(smap, kf)
            self.mapper.cull_points(smap)
            n_culled = self.mapper.cull_keyframes(smap, kf)
            if n_culled and self.bow_index is not None:
                m = min(len(self.bow_index.kf_valid), smap.n_kf)
                self.bow_index.kf_valid[:m] &= smap.kf_valid[:m]

            # refresh direct patches for ALL points bound to this KF with
            # the POST-BA geometry — stale capture geometry after BA was the
            # main divergence mode of the first implementation
            slots = np.nonzero(smap.kf_feat_pt[kf] >= 0)[0]
            ids = smap.kf_feat_pt[kf, slots]
            self.mapper.refresh_patches(smap, kf, pyr, ids, slots)

            # place recognition: index this KF, attempt loop closure
            if self.bow_index is not None:
                _, bow = self.bow_index.quantize(smap.kf_feat_desc[kf],
                                                 smap.kf_feat_valid[kf])
                self.bow_index.add_keyframe(kf, bow)
                if (self.cfg.enable_loop_closing
                        and self.loop_closer is not None):
                    if self.loop_closer.process_keyframe(smap, kf, bow):
                        self.n_loops_closed += 1
                        # global BA after loop correction (the reference
                        # spawns RunGlobalBundleAdjustment,
                        # src/LoopClosing.cc:538)
                        self.mapper.global_ba(smap)
                        slots = np.nonzero(smap.kf_feat_pt[kf] >= 0)[0]
                        self.mapper.refresh_patches(
                            smap, kf, pyr, smap.kf_feat_pt[kf, slots], slots)
                        self._vel = (np.eye(3, dtype=np.float32),
                                     np.zeros(3, np.float32))

            self._rebuild_cache()

    def _run_local_ba(self, smap, kf):
        """Local BA dispatch; the mono-VI tracker swaps in the NavState
        window BA once VINS-initialized."""
        self.mapper.local_ba(smap, kf)

    # ------------------------------------------------------------ vio hooks
    def _predict_pose(self):
        """Optional pose prediction override (mono-VI: IMU propagation).
        Return (R_pred, t_pred) or None to use the velocity model."""
        return None

    def _fuse_pose(self, R_cur, t_cur, ids, uv, lvl):
        """Optional sensor-fusion refinement of the visually tracked pose.
        Return (R, t) or None to keep the visual pose."""
        return None

    def _on_vision_failed(self, pyr, ts, R_pred, t_pred) -> bool:
        """Called when direct tracking fails. Return True to keep tracking
        with the predicted pose (IMU dead-reckoning); False -> LOST."""
        return False

    # ------------------------------------------------------------ depth seeds
    def _depth_source_available(self) -> bool:
        return getattr(self, "_cur_depth", None) is not None

    def _feature_depths(self, smap, kf, slots):
        """Per-slot metric depths for depth-seeded point creation.
        RGB-D: direct lookup in the frame's depth map. Overridden by the
        stereo tracker (disparity search)."""
        depth = self._cur_depth
        uv = smap.kf_feat_uv[kf, slots]
        xi = np.clip(np.round(uv[:, 0]).astype(int), 0, depth.shape[1] - 1)
        yi = np.clip(np.round(uv[:, 1]).astype(int), 0, depth.shape[0] - 1)
        return np.asarray(depth)[yi, xi]

    def _create_depth_points(self, smap, kf, pyr, max_depth: float = 40.0):
        """Create map points for unbound features with valid depth."""
        unbound = smap.kf_feat_valid[kf] & (smap.kf_feat_pt[kf] < 0)
        slots = np.nonzero(unbound)[0]
        if len(slots) == 0:
            return 0
        d = self._feature_depths(smap, kf, slots)
        uv = smap.kf_feat_uv[kf, slots]
        ok = (d > 0.1) & (d < max_depth) & np.isfinite(d)
        ok &= np.asarray(self.mapper.patch_in_bounds(
            uv, smap.kf_feat_level[kf, slots]))
        slots = slots[ok]
        if len(slots) == 0:
            return 0
        uv = uv[ok]
        d = d[ok]
        xn = np.stack([(uv[:, 0] - self.cam.cx) / self.cam.fx,
                       (uv[:, 1] - self.cam.cy) / self.cam.fy], -1)
        Xc = np.concatenate([xn * d[:, None], d[:, None]], -1)
        R = smap.kf_R[kf]
        t = smap.kf_t[kf]
        Xw = (Xc - t) @ R  # R^T (Xc - t)
        ids = smap.alloc_points(len(slots))
        smap.pt_xyz[ids] = Xw.astype(np.float32)
        smap.pt_valid[ids] = True
        smap.pt_first_kf[ids] = kf
        smap.pt_desc[ids] = smap.kf_feat_desc[kf, slots]
        smap.bind(kf, slots, ids)
        self.mapper.refresh_patches(smap, kf, pyr, ids, slots)
        return len(slots)

    # ---------------------------------------------------------- relocalization
    def _relocalize(self, pyr) -> bool:
        """BoW candidates + robust PnP (reference Tracking::Relocalization
        src/Tracking.cc:1826-1978, via our batched linear-PnP RANSAC)."""
        if self.bow_index is None:
            return False
        smap = self.map
        feats = self.extractor(pyr)
        f = self._feats_to_dict(feats)
        _, bow = self.bow_index.quantize(f["desc"], f["valid"])
        cands = self.bow_index.reloc_candidates(bow, max_candidates=5)
        for kf in cands:
            bound = smap.kf_feat_pt[kf] >= 0
            if bound.sum() < 15:
                continue
            idx, ok = matching.match_with_windows(
                jnp.asarray(f["desc"]), jnp.asarray(f["valid"]),
                jnp.asarray(smap.kf_feat_desc[kf]), jnp.asarray(bound),
                max_dist=matching.TH_LOW, ratio=0.75, mutual=True)
            idx = np.asarray(idx)
            okm = np.asarray(ok)
            rows = np.nonzero(okm)[0]
            if len(rows) < 10:
                continue
            pt_ids = smap.kf_feat_pt[kf, idx[rows]]
            cap = 512
            n = min(len(rows), cap)
            X = np.zeros((cap, 3), np.float32)
            uv = np.zeros((cap, 2), np.float32)
            valid = np.zeros(cap, bool)
            X[:n] = smap.pt_xyz[pt_ids[:n]]
            uv[:n] = f["uv"][rows[:n]]
            valid[:n] = smap.pt_valid[pt_ids[:n]]
            self._rng, key = jax.random.split(self._rng)
            res = pnp_ransac(jnp.asarray(X), jnp.asarray(uv),
                             jnp.asarray(valid), self.intr, key,
                             min_inliers=15)
            if bool(res.ok):
                R = np.asarray(res.R)
                t = np.asarray(res.t)
                self._vel = (np.eye(3, dtype=np.float32),
                             np.zeros(3, np.float32))
                self._last_kf = kf
                self._rebuild_cache()
                self._set_last_frame(pyr, R, t, cache_uv=None)
                return True
        return False


class RgbdTracker(MonoTracker):
    """RGB-D tracking: instant metric initialization from the depth map
    (reference Tracking::StereoInitialization src/Tracking.cc:745-793), then
    the same direct pipeline; new map points are depth-seeded at keyframes
    with triangulation as a complement for far features."""

    def _try_initialize(self, pyr, ts) -> bool:
        if self._cur_depth is None:
            return False
        smap = self.map
        feats = self.extractor(pyr)
        f = self._feats_to_dict(feats)
        if int(f["valid"].sum()) < 100:
            return False
        kf0 = smap.add_keyframe(np.eye(3, dtype=np.float32),
                                np.zeros(3, np.float32), f, ts=ts,
                                frame_id=self.frame_id, pyramid=pyr)
        n = self._create_depth_points(smap, kf0, pyr)
        if n < 50:
            return False

        if self.cfg.enable_loop_closing or self.cfg.enable_relocalization:
            from ..backend.bow import train_vocabulary, BowIndex
            from ..backend.loopclosing import LoopCloser

            desc = f["desc"][f["valid"]]
            vocab = train_vocabulary(desc, branching=self.cfg.vocab_branching,
                                     depth=self.cfg.vocab_depth)
            self.bow_index = BowIndex(vocab, max_kf=smap.max_kf)
            self.loop_closer = LoopCloser(self.bow_index, self.cam)
            _, bow = self.bow_index.quantize(smap.kf_feat_desc[kf0],
                                             smap.kf_feat_valid[kf0])
            self.bow_index.add_keyframe(kf0, bow)

        self.state = State.OK
        self._last_kf = kf0
        self._last_kf_frame = self.frame_id
        self._kf_ref_tracked = n
        self._rebuild_cache()
        self._set_last_frame(pyr, smap.kf_R[kf0], smap.kf_t[kf0],
                             cache_uv=None)
        self._vel = (np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
        return True


class StereoTracker(RgbdTracker):
    """Stereo tracking on rectified pairs: feature depths come from the
    batched disparity search (ops/stereo.py; the reference computes them in
    Frame::ComputeStereoMatches src/Frame.cc:509-682). Initialization and
    point seeding reuse the depth-seeded path (metric scale from baseline)."""

    def track(self, img, ts: float, depth=None, right=None):
        self._cur_right = right
        return super().track(img, ts, depth=depth)

    def _depth_source_available(self) -> bool:
        return getattr(self, "_cur_right", None) is not None

    def _try_initialize(self, pyr, ts) -> bool:
        # reuse the RGB-D instant init; depths come from _feature_depths
        if getattr(self, "_cur_right", None) is None:
            return False
        self._cur_depth = True  # sentinel: RgbdTracker init checks not-None
        ok = super()._try_initialize(pyr, ts)
        self._cur_depth = None
        return ok

    def _feature_depths(self, smap, kf, slots):
        from ..ops.stereo import stereo_match_features

        bf = self.cam.bf
        assert bf > 0, "stereo requires Camera.bf (baseline * fx)"
        uv = smap.kf_feat_uv[kf, slots]
        cap = self.map.max_feat
        uv_pad = np.zeros((cap, 2), np.float32)
        v_pad = np.zeros(cap, bool)
        n = len(slots)
        uv_pad[:n] = uv
        v_pad[:n] = True
        imgL = smap.kf_pyr[kf][0]  # level-0 left image of this keyframe
        disp, ok = stereo_match_features(
            imgL, jnp.asarray(self._cur_right, dtype=jnp.float32),
            jnp.asarray(uv_pad), jnp.asarray(v_pad))
        disp = np.asarray(disp)[:n]
        ok = np.asarray(ok)[:n]
        d = np.where(ok & (disp > 0.1), bf / np.maximum(disp, 1e-3), -1.0)
        return d.astype(np.float32)
