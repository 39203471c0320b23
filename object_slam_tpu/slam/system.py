"""System facade: the per-frame orchestration loop.

Parity with `System` (`System.{h,cc}`): construction wires the front end,
map, and back end; `track_rgbd` / `track_stereo` are the per-frame entry
points (`System.cc:125-238`); trajectory savers live in eval/trajectory_io.
The reference's four threads (tracking / local mapping / loop closing /
viewer, `System.cc:89-106`) become: a latency-critical jitted tracking
chain on-device + keyframe-rate mapping work dispatched by this host loop
(optionally deferred), with the functional MapState replacing the
mutex-guarded shared map.

State machine (Tracking.h:99-105): NOT_INITIALIZED -> OK <-> LOST.
"""

from __future__ import annotations

import math
import os
import time
from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from object_slam_tpu.config import SlamConfig
from object_slam_tpu.geometry import se3, camera as cam_mod
from object_slam_tpu.slam import map_ops, tracking as trk, local_mapping
from object_slam_tpu.slam.frame import FrameBuilder, FrameData
from object_slam_tpu.slam.map_state import init_map, MapState
from object_slam_tpu.slam.objects import ObjectEngine
from object_slam_tpu.solvers.epnp import pnp_ransac

NOT_INITIALIZED, OK, LOST = 0, 1, 2

# config-keyed shared jit bundles (see __init__; frame.py has the full
# rationale — per-instance jax.jit recompiles everything). The cache
# stores _SystemKernels objects, which hold ONLY config-derived constants:
# jitting bound SlamSystem methods would pin the first instance — and its
# final HBM map slabs — in this module-level cache forever (ADVICE r3).
_SYS_JIT_CACHE: dict = {}


class _SystemKernels:
    """The compiled per-frame/per-keyframe program set for one config.

    Every jitted callable closes over nothing but camera intrinsics,
    pyramid constants, and the (equally constants-only) ObjectEngine
    kernels — safe to share across SlamSystem instances and to outlive
    them all."""

    def __init__(self, cfg: SlamConfig, K, scale_factors, inv_sigma2,
                 log_scale: float, objects: Optional[ObjectEngine]):
        self.cfg = cfg
        self.K = K
        self.scale_factors = scale_factors
        self.inv_sigma2 = inv_sigma2
        self.log_scale = log_scale
        self.objects = objects
        self.stereo_init = jax.jit(self._stereo_init_impl)
        self.motion = jax.jit(self._motion_impl)
        self.motion_vo = jax.jit(self._motion_vo_impl)
        self.refkf = jax.jit(self._refkf_impl)
        self.local = jax.jit(self._local_impl)
        self.insert = jax.jit(self._insert_impl)
        self.mapping = jax.jit(self._mapping_impl)
        self.mapping_fast = jax.jit(self._mapping_fast_impl)
        self.reloc_try = jax.jit(self._reloc_try_impl)
        self.fused = jax.jit(self._fused_impl)
        self.kf_policy = jax.jit(self._kf_policy_impl)

    def _kf_policy_impl(self, m, depth, kp_pt, valid, last_kf, min_obs):
        """All keyframe-policy scalars (Tracking.cc:1242-1326 inputs) in
        ONE device program -> int32[3], so the host pays a single round
        trip instead of three (the remote-attached-chip profile showed
        each separate int() pull costing a full network RTT)."""
        cam = self.cfg.camera
        close = (depth > 0) & (depth < cam.th_depth * cam.baseline)
        tracked = kp_pt >= 0
        n_close_trk = jnp.sum(close & tracked & valid)
        n_close_untrk = jnp.sum(close & ~tracked & valid)
        # reference tracked points with >= nMinObs observations
        # (Tracking.cc:1261-1266)
        ref_pt = m.kf_kp_pt[last_kf]
        P = m.pt_xyz.shape[0]
        ref_matches = jnp.sum(
            (ref_pt >= 0)
            & (m.pt_n_obs[jnp.clip(ref_pt, 0, P - 1)] >= min_obs)
            & m.pt_valid[jnp.clip(ref_pt, 0, P - 1)])
        return jnp.stack([n_close_trk, n_close_untrk,
                          ref_matches]).astype(jnp.int32)

    def _stereo_init_impl(self, m, frame, frame_id):
        create = frame.valid & (frame.depth > 0)
        m, kf_id = map_ops.insert_keyframe(
            self.K, m, frame, jnp.eye(4), self.scale_factors, create,
            frame_id=frame_id)
        kp_pt = m.kf_kp_pt[kf_id]
        return m, kf_id, kp_pt

    def _motion_impl(self, m, frame, last_uv, last_pt, last_level,
                     last_valid, T_pred, radius, T_last, last_angle):
        return trk.track_motion_model(
            self.K, m, frame, last_uv, last_pt, last_level, last_valid,
            T_pred, self.scale_factors, self.inv_sigma2, radius_th=radius,
            T_last=T_last, last_angle=last_angle)

    def _motion_vo_impl(self, m, frame, last, T_pred):
        return trk.track_motion_model_vo(
            self.K, m, frame, last, T_pred, self.scale_factors,
            self.inv_sigma2)

    def _refkf_impl(self, m, frame, ref_kf, T0):
        return trk.track_reference_kf(self.K, m, frame, ref_kf, T0,
                                      self.inv_sigma2)

    def _local_impl(self, m, frame, tr, T_last):
        return trk.track_local_map(
            self.K, m, frame, tr, self.scale_factors, self.inv_sigma2,
            self.log_scale, T_last=T_last,
            local_cap=self.cfg.caps.local_search_pts,
            radius_mult=self.cfg.tracking.local_radius_mult,
            level_window=self.cfg.tracking.local_level_window)

    def _insert_impl(self, m, frame, Tcw, kp_pt, close_mask, frame_id):
        frame = frame._replace(kp_pt=kp_pt)
        # CreateNewKeyFrame spawns all close untracked points AND tops up
        # with the nearest untracked points to >= 100 regardless of the
        # depth threshold (Tracking.cc:1352-1396 sorts by depth and keeps
        # inserting past thDepth until 100) — without the top-up, scenes
        # whose structure sits beyond thDepth starve the map.
        untracked = frame.valid & (frame.depth > 0) & (kp_pt < 0)
        depth_key = jnp.where(untracked, -frame.depth, -jnp.inf)
        N = frame.depth.shape[0]
        _, nearest = jax.lax.top_k(depth_key, min(100, N))
        topup = jnp.zeros((N,), bool).at[nearest].set(True) & untracked
        spawn = close_mask | topup
        return map_ops.insert_keyframe(self.K, m, frame, Tcw,
                                       self.scale_factors, spawn,
                                       frame_id=frame_id)

    def _mapping_impl(self, m, kf_id):
        return local_mapping.process_new_keyframe(
            self.K, m, kf_id, self.scale_factors, self.inv_sigma2, self.cfg)

    def _mapping_fast_impl(self, m, kf_id):
        """The under-pressure mapping pass: abbreviated local-BA schedule
        (the mbAbortBA interruption analogue, config.MappingConfig
        ba_abort_*) — dispatched when keyframes arrive faster than
        ba_abort_pressure_gap frames apart."""
        return local_mapping.process_new_keyframe(
            self.K, m, kf_id, self.scale_factors, self.inv_sigma2, self.cfg,
            ba_iters=tuple(self.cfg.mapping.ba_abort_iters))

    def _reloc_try_impl(self, m, frame, kf_id, rng):
        return trk.relocalize_try(self.K, m, frame, kf_id, rng,
                                  self.scale_factors, self.inv_sigma2)

    def _fused_impl(self, m, frame, last, velocity, last_kf_id,
                    frames_since_kf, frame_id, last_kf_inliers):
        cfg = self.cfg
        # object stages fold into the SAME one-sync program when objects
        # are enabled (the reference runs TrackObject + PoseOptimization2
        # + UpdateCurrentObject inline in Track(); Tracking.cc:453-545)
        hooks = None
        if self.objects is not None:
            hooks = (self.objects.assoc_impl,
                     self.objects.semopt_impl
                     if cfg.objects.semopt_enabled else None,
                     self.objects.update_impl)
        return trk.track_frame_fused(
            self.K, m, frame, last, velocity, last_kf_id, frames_since_kf,
            frame_id, last_kf_inliers,
            self.scale_factors, self.inv_sigma2, self.log_scale,
            motion_radius=cfg.tracking.motion_model_radius,
            close_depth=cfg.camera.th_depth * cfg.camera.baseline,
            max_frames_between_kf=cfg.tracking.max_frames_between_kf,
            obj_hooks=hooks, local_cap=cfg.caps.local_search_pts,
            local_radius_mult=cfg.tracking.local_radius_mult,
            local_level_window=cfg.tracking.local_level_window,
            motion_rot_check=cfg.tracking.motion_rot_check,
            semopt_adopt=os.environ.get("OSLAM_SEMOPT_ADOPT", "full"))


@dataclass
class FrameRecord:
    timestamp: float
    Tcw: np.ndarray            # [4, 4] absolute (at track time)
    ref_kf: int
    Tcr: np.ndarray            # pose relative to reference KF
    tracked: bool


class _AsyncMapping:
    """Mapping off the frame-critical path — the functional analogue of
    the LocalMapping thread + interruptible-BA contract
    (LocalMapping.cc:48-113, :556-627, mbAbortBA at :119).

    dispatch() launches process_new_keyframe on a SNAPSHOT of the map:
    with a second device it runs there concurrently; single-chip it is an
    async XLA dispatch the host never blocks on (the device pipeline
    absorbs it while the host renders/decodes the next frame). merge()
    adopts the mapping result and re-applies everything the tracker wrote
    in the meantime — the tracker's writes are additive counters (point
    visible/found, label votes) and the object slabs, so the merge is a
    commutative overlay, not a lock.
    """

    def __init__(self, fn, device=None, home_device=None, fn_fast=None):
        self.fn = fn
        self.fn_fast = fn_fast or fn
        self.device = device
        self.home = home_device
        self.pending = None
        self.pending_kf = -1
        self._jit_merge = jax.jit(self._merge_impl)

    @staticmethod
    def _merge_impl(res, m_now, s_vis, s_found, s_lc, s_lt):
        obj_fields = {f: getattr(m_now, f) for f in MapState._fields
                      if f.startswith("obj_")}
        return res._replace(
            pt_visible=res.pt_visible + (m_now.pt_visible - s_vis),
            pt_found=res.pt_found + (m_now.pt_found - s_found),
            pt_label_cnt=res.pt_label_cnt + (m_now.pt_label_cnt - s_lc),
            pt_label_tot=res.pt_label_tot + (m_now.pt_label_tot - s_lt),
            pt_obj=jnp.where(res.pt_valid, m_now.pt_obj, -1),
            n_obj=m_now.n_obj, next_track_id=m_now.next_track_id,
            **obj_fields)

    def dispatch(self, m: MapState, kf_id: int, fast: bool = False):
        """fast=True runs the abbreviated-BA mapping program — the
        mbAbortBA interruption analogue under keyframe pressure (see
        SlamSystem._mapping_fn)."""
        m_in = jax.device_put(m, self.device) if self.device else m
        res = (self.fn_fast if fast else self.fn)(m_in, np.int32(kf_id))
        self.pending = (res, m.pt_visible, m.pt_found,
                        m.pt_label_cnt, m.pt_label_tot)
        self.pending_kf = kf_id

    def ready(self) -> bool:
        if self.pending is None:
            return False
        try:
            return bool(self.pending[0].n_pt.is_ready())
        except AttributeError:
            return True

    def merge(self, m_now: MapState) -> MapState:
        """Adopt the mapping result; overlay the tracker's in-flight
        writes (additive counters + object ownership/slabs). One jitted
        program — the eager form cost ~a dozen per-op dispatches on a
        remote-attached chip."""
        if self.pending is None:
            return m_now
        res, s_vis, s_found, s_lc, s_lt = self.pending
        self.pending = None
        self.pending_kf = -1
        if self.device is not None and self.home is not None:
            res = jax.device_put(res, self.home)
        return self._jit_merge(res, m_now, s_vis, s_found, s_lc, s_lt)


class SlamSystem:
    def __init__(self, cfg: Optional[SlamConfig] = None,
                 enable_objects: bool = True,
                 enable_mapping: bool = True,
                 enable_loop: bool = False,
                 async_mapping: bool = False,
                 vocab_path: Optional[str] = None,
                 metrics=None):
        self.cfg = cfg or SlamConfig()
        self.builder = FrameBuilder(self.cfg)
        self.K = self.builder.K
        self.inv_sigma2 = self.builder.inv_sigma2
        self.scale_factors = self.builder.scale_factors
        self.log_scale = math.log(self.cfg.orb.scale_factor)
        self.map = init_map(self.cfg.caps,
                            self.cfg.objects.history_capacity)
        self.objects = ObjectEngine(self.cfg, self.K) if enable_objects else None
        self.enable_mapping = enable_mapping
        self.loop_closer = None
        if enable_loop:
            from object_slam_tpu.loop.loop_closing import LoopCloser
            vocab = None
            if vocab_path:
                # drop-in external vocabulary (ORBvoc.txt-style DBoW2
                # text; System.cc:69 loads the same format)
                from object_slam_tpu.loop.vocabulary import Vocabulary
                vocab = Vocabulary.load_dbow2_text(vocab_path)
            self.loop_closer = LoopCloser(
                self.cfg, self.K, vocab=vocab,
                fix_scale=self.cfg.sensor != "mono")
            n_words = self.loop_closer.vocab.n_words
            self.map = self.map._replace(
                kf_bow=jnp.zeros((self.cfg.caps.max_keyframes, n_words)))

        from object_slam_tpu.utils.profiling import StageProfiler
        self.profiler = StageProfiler(enabled=False)
        # structured per-frame metrics JSONL (utils/metrics.MetricsStream
        # or None) — the FrameDrawer-status-bar/cout analogue, SURVEY §5
        self.metrics = metrics

        self.state = NOT_INITIALIZED
        self.last_frame: Optional[FrameData] = None
        self.velocity = np.eye(4, dtype=np.float32)   # T_cur_last
        self.last_kf_id = -1
        self.frames_since_kf = 0
        self.frame_id = 0
        self.trajectory: List[FrameRecord] = []
        self.rng = jax.random.PRNGKey(0)
        self._host_ts = 0.0
        self._fused_pending = None   # lagged fused readback (see _track_fused)

        # same-config systems share one compiled program set (see
        # slam/frame.py rationale: per-instance jax.jit re-compiles, and
        # the remote backend has no cross-process cache). The cached
        # object is a constants-only _SystemKernels — never this instance.
        key = (repr(self.cfg), enable_objects,
               self.loop_closer.vocab.n_words if self.loop_closer else 0)
        kern = _SYS_JIT_CACHE.get(key)
        if kern is None:
            kern = _SystemKernels(self.cfg, self.K, self.scale_factors,
                                  self.inv_sigma2, self.log_scale,
                                  self.objects)
            _SYS_JIT_CACHE[key] = kern
        self.kernels = kern
        self._jit_stereo_init = kern.stereo_init
        self._jit_motion = kern.motion
        self._jit_motion_vo = kern.motion_vo
        self._jit_refkf = kern.refkf
        self._jit_local = kern.local
        self._jit_insert = kern.insert
        self._jit_mapping = kern.mapping
        self._jit_mapping_fast = kern.mapping_fast
        self._jit_reloc_try = kern.reloc_try
        self._jit_fused = kern.fused
        self._jit_kf_policy = kern.kf_policy
        self._async = None
        if async_mapping:
            devs = jax.devices()
            side = devs[1] if len(devs) > 1 else None
            self._async = _AsyncMapping(self._jit_mapping, device=side,
                                        home_device=devs[0],
                                        fn_fast=self._jit_mapping_fast)

    # ------------------------------------------------------------------
    # public per-frame API
    # ------------------------------------------------------------------
    def track_rgbd(self, gray, depth, rgb, sem_arrays=None, timestamp=0.0):
        """gray [H,W] f32 0..255; depth [H,W] metric; rgb [H,W,3] f32."""
        if sem_arrays is None:
            sem_arrays = self.builder.empty_semantics()
        frame = self.builder.build_rgbd(gray, depth, rgb, sem_arrays,
                                        timestamp)
        self._host_ts = float(timestamp)
        return self._track_and_emit(frame)

    def track_rgbd_blob(self, blob, inst_valid, timestamp=0.0):
        """Single-transfer RGB-D entry: blob from
        FrameBuilder.pack_frame_blob (one host->device copy per frame
        instead of six — each separate transfer costs a dispatch RPC on a
        remote-attached chip and a DMA setup on PCIe)."""
        frame = self.builder.build_rgbd_blob(blob, inst_valid, timestamp)
        self._host_ts = float(timestamp)
        return self._track_and_emit(frame)

    def track_stereo(self, gray_l, gray_r, rgb, sem_arrays=None,
                     timestamp=0.0):
        if sem_arrays is None:
            sem_arrays = self.builder.empty_semantics()
        frame = self.builder.build_stereo(gray_l, gray_r, rgb, sem_arrays,
                                          timestamp)
        self._host_ts = float(timestamp)
        return self._track_and_emit(frame)

    def track_mono(self, gray, timestamp=0.0):
        """Monocular entry point (Tracking::GrabImageMonocular analogue).
        Initialization = two-view H/F-gated essential-matrix bootstrap
        (solvers/initializer.py) instead of depth-based point spawning."""
        frame = self.builder.build_mono(gray, timestamp)
        self._host_ts = float(timestamp)
        if self.state == NOT_INITIALIZED:
            return self._mono_initialize(frame)
        return self._track_and_emit(frame)

    def _track_and_emit(self, frame: FrameData):
        """Run _track and append one structured metrics record — all
        fields are host state the loop already holds, so the stream adds
        zero device round trips (utils/metrics.py)."""
        if self.metrics is None:
            return self._track(frame)
        prev_kf = self.last_kf_id
        fid = self.frame_id
        t0 = time.perf_counter()
        out = self._track(frame)
        dt_ms = (time.perf_counter() - t0) * 1e3
        state = {NOT_INITIALIZED: "NOT_INITIALIZED", OK: "OK",
                 LOST: "LOST"}[self.state]
        self.metrics.emit(
            frame=fid, ts=self._host_ts, state=state,
            track_ms=round(dt_ms, 3),
            n_inliers=int(getattr(self, "_last_n_inliers", -1)),
            kf_inserted=self.last_kf_id != prev_kf,
            ref_kf=self.last_kf_id,
            frames_since_kf=self.frames_since_kf)
        return out

    def _mono_initialize(self, frame: FrameData):
        from object_slam_tpu.features import matching as match_mod
        from object_slam_tpu.solvers.initializer import initialize_mono
        ref = getattr(self, "_mono_ref", None)
        if ref is None or int(jnp.sum(frame.valid)) < 100:
            self._mono_ref = frame
            self._record(frame, False)
            self.last_frame = frame
            self.frame_id += 1
            return frame
        midx, mok = match_mod.brute_match(
            ref.desc, ref.valid, frame.desc, frame.valid,
            th_dist=50, nn_ratio=0.9, angle_a=ref.angle,
            angle_b=frame.angle)
        if int(jnp.sum(mok)) < self.cfg.tracking.min_init_matches:
            self._mono_ref = frame
            self._record(frame, False)
            self.last_frame = frame
            self.frame_id += 1
            return frame
        N = frame.uv.shape[0]
        mi = jnp.clip(midx, 0, N - 1)
        self.rng, k = jax.random.split(self.rng)
        init = initialize_mono(k, self.K, ref.uv, frame.uv[mi], mok,
                               min_inliers=self.cfg.tracking.min_init_inliers)
        if not bool(init.ok):
            self._record(frame, False)
            self.last_frame = frame
            self.frame_id += 1
            return frame
        # scale so median depth = 1 (Tracking::CreateInitialMapMonocular)
        z = init.pw[:, 2]
        med = jnp.median(jnp.where(init.good, z, jnp.nan))
        med = jnp.nan_to_num(med, nan=1.0)
        pw = init.pw / jnp.maximum(med, 1e-6)
        T21 = init.T21.at[:3, 3].set(init.T21[:3, 3] / jnp.maximum(med, 1e-6))

        # KF0 at identity with ref frame features; spawn the triangulated
        # points via a fake-depth path (depth = z of pw in ref frame)
        ref2 = ref._replace(depth=jnp.where(init.good, pw[:, 2], -1.0))
        self.map, kf0 = self._jit_insert(
            self.map, ref2, jnp.eye(4), jnp.full((N,), -1, jnp.int32),
            init.good, np.int32(max(self.frame_id - 1, 0)))
        kp_pt_ref = np.asarray(self.map.kf_kp_pt[int(kf0)])
        # KF1: same points observed at matched indices
        kp_pt1 = jnp.full((N,), -1, jnp.int32)
        kp_pt1 = kp_pt1.at[mi].set(jnp.where(init.good, jnp.asarray(kp_pt_ref),
                                             kp_pt1[mi]))
        self.map, kf1 = self._jit_insert(
            self.map, frame, T21, kp_pt1, jnp.zeros((N,), bool),
            np.int32(self.frame_id))
        frame = frame._replace(Tcw=T21, kp_pt=kp_pt1,
                               pose_ok=jnp.array(True))
        self.state = OK
        self.last_kf_id = int(kf1)
        self.frames_since_kf = 0
        self._record(frame, True)
        self.last_frame = frame
        self.frame_id += 1
        return frame

    # ------------------------------------------------------------------
    def _track(self, frame: FrameData):
        cfg = self.cfg
        self._last_presem_Tcw = None   # set by the host semopt path only
        if self.enable_mapping and self.state == OK and cfg.tracking.fused:
            # one-sync fused program, objects on or off. Routed BEFORE
            # resolving the previous frame's lagged readback: the dispatch
            # must go out first or the device idles a full completion
            # round trip per frame (see _track_fused). The state check is
            # one frame stale — a pending LOST costs one wasted dispatch.
            return self._track_fused(frame)
        # non-fused paths: fold in any lagged fused result first so the
        # state machine (KF insertion, LOST) is current
        self._resolve_fused_pending()
        if self.state == NOT_INITIALIZED:
            n_depth = int(jnp.sum((frame.depth > 0) & frame.valid))
            if n_depth > 100:
                self.map, kf_id, kp_pt = self._jit_stereo_init(
                    self.map, frame, np.int32(self.frame_id))
                frame = frame._replace(kp_pt=kp_pt, Tcw=jnp.eye(4),
                                       pose_ok=jnp.array(True))
                if self.objects is not None:
                    self.map, frame = self.objects.update(self.map, frame)
                self.state = OK
                self.last_kf_id = int(kf_id)
                self.frames_since_kf = 0
                self._kf_inliers = n_depth
                if self.loop_closer is not None:
                    self.map, _ = self.loop_closer.on_keyframe(
                        self.map, int(kf_id))
                self._record(frame, True)
            else:
                self._record(frame, False)
            self.last_frame = frame
            self.frame_id += 1
            return frame

        if self.enable_mapping and self.state == OK and cfg.tracking.fused:
            # one-sync fused program, objects on or off (round 3: the
            # object stages are hooks inside the same compiled chain)
            return self._track_fused(frame)

        # --- initial pose ---
        last = self.last_frame
        T_pred = jnp.asarray(self.velocity) @ last.Tcw
        vo_mode = False
        with self.profiler.span("track.motion_model"):
            if not self.enable_mapping:
                # localization-only: temporal VO points keep the motion
                # model fed where the frozen map is sparse
                # (Tracking.cc:384-514); mbVO = few matches to MAP points
                tr, n_map = self._jit_motion_vo(self.map, frame, last,
                                                T_pred)
                vo_mode = int(n_map) < 10
            else:
                tr = self._jit_motion(self.map, frame, last.uv, last.kp_pt,
                                      last.level, last.valid, T_pred,
                                      cfg.tracking.motion_model_radius,
                                      last.Tcw, last.angle)
                # ONE packed pull for both gate scalars (each separate
                # int() costs a full RTT on a remote-attached chip)
                nm, ni = (int(x) for x in np.asarray(
                    jnp.stack([tr.n_matches, tr.n_inliers])))
                if nm < 20:
                    # wide-window retry (Tracking.cc:967-975 doubles th)
                    tr = self._jit_motion(
                        self.map, frame, last.uv, last.kp_pt,
                        last.level, last.valid, T_pred,
                        2.0 * cfg.tracking.motion_model_radius, last.Tcw,
                        last.angle)
                    nm, ni = (int(x) for x in np.asarray(
                        jnp.stack([tr.n_matches, tr.n_inliers])))
        if not self.enable_mapping:
            # localization-only branch: same single packed pull (2 RTTs->1)
            nm, ni = (int(x) for x in np.asarray(
                jnp.stack([tr.n_matches, tr.n_inliers])))
        thin = nm < 20 or ni < 10
        tr_ni = ni
        if thin:
            # the reference REFUSES a thin motion-model consensus before
            # optimizing (Tracking.cc:977 `if(nmatches<20) return false`) —
            # a dozen spatially-consistent wrong matches can pass the chi2
            # gates and poison the map at high pan rates
            tr_kf = self._jit_refkf(self.map, frame,
                                    jnp.int32(max(self.last_kf_id, 0)),
                                    last.Tcw)
            kf_ni = int(tr_kf.n_inliers)
            if kf_ni > tr_ni:
                tr, tr_ni = tr_kf, kf_ni
        if tr_ni < 10:
            tr = self._relocalize(frame)
            if tr is None:
                self.state = LOST
                self._record(frame._replace(Tcw=last.Tcw), False)
                self.last_frame = frame._replace(Tcw=last.Tcw)
                self.frame_id += 1
                return self.last_frame
            tr_ni = int(tr.n_inliers)

        # --- object association (before local map, Tracking.cc:453) ---
        if self.objects is not None:
            with self.profiler.span("track.obj_associate"):
                frame = frame._replace(Tcw=tr.Tcw)
                frame = self.objects.associate(self.map, frame, last)

        # --- local map tracking ---
        if vo_mode:
            # pure-VO survival mode: the frozen map has no local coverage,
            # the temporal-point pose is the result (Tracking.cc:445-450
            # skips TrackLocalMap when mbOnlyTracking && mbVO)
            tr2, ref_kf = tr, self.last_kf_id
            n_inl = int(tr.n_inliers)
            ok = n_inl >= 20
            self._last_n_inliers = n_inl
            self.state = OK if ok else LOST
            self.debug_last = {"tr_motion": tr, "tr_local": tr2,
                               "T_pred": T_pred, "frame": frame}
            frame = frame._replace(Tcw=tr.Tcw, kp_pt=tr.kp_pt,
                                   pose_ok=jnp.array(ok))
            if ok:
                self.velocity = tr.Tcw @ se3.inverse(last.Tcw)
            self._record(frame, ok)
            self.last_frame = frame
            self.frame_id += 1
            return frame
        with self.profiler.span("track.local_map"):
            if self.objects is not None and bool(jnp.any(frame.obj3d >= 0)):
                tr2, self.map, n_sem, Tcw_pre = \
                    self.objects.track_local_map_semantic(
                        self.map, frame, tr)
                ref_kf = self.last_kf_id
                self._last_presem_Tcw = Tcw_pre
                # one packed pull: inlier count + semantic-constraint
                # count (N_AllSemanticConstraintNum accumulation)
                packed = np.asarray(jnp.stack(
                    [tr2.n_inliers, jnp.asarray(n_sem, jnp.int32)]))
                n_inl = int(packed[0])
                self.objects.semantic_constraints += int(packed[1])
            else:
                tr2, self.map, ref_kf = self._jit_local(self.map, frame, tr,
                                                        last.Tcw)
                ref_kf = int(ref_kf)
                n_inl = int(tr2.n_inliers)
        ok = n_inl >= 30 or (n_inl >= 10 and self.frame_id < 5)
        if not ok and tr_ni >= 10:
            # reference-KF fallback BEFORE declaring LOST: when the
            # motion-model chain degraded through local-map tracking, retry
            # from a brute match against the reference keyframe and run the
            # local map again (Tracking.cc:364-379 tries
            # TrackReferenceKeyFrame whenever the primary estimate fails;
            # round 1 skipped this rung and went straight to LOST)
            tr_kf = self._jit_refkf(self.map, frame,
                                    jnp.int32(max(self.last_kf_id, 0)),
                                    last.Tcw)
            if int(tr_kf.n_inliers) >= 10:
                tr2_kf, map_kf, ref2 = self._jit_local(self.map, frame,
                                                       tr_kf, last.Tcw)
                if int(tr2_kf.n_inliers) > n_inl:
                    tr, tr2, self.map, ref_kf = \
                        tr_kf, tr2_kf, map_kf, int(ref2)
                    n_inl = int(tr2.n_inliers)
                    ok = n_inl >= 30 or (n_inl >= 10 and self.frame_id < 5)
        self._last_n_inliers = n_inl
        self.state = OK if ok else LOST
        # per-frame stage snapshots for diagnostics (scripts/diag_retention)
        self.debug_last = {"tr_motion": tr, "tr_local": tr2,
                           "T_pred": T_pred, "frame": frame}

        frame = frame._replace(Tcw=tr2.Tcw, kp_pt=tr2.kp_pt,
                               pose_ok=jnp.array(ok))

        # --- object landmark update (map mutation — skipped in
        # localization-only mode, as all map building is) ---
        if self.objects is not None and ok and self.enable_mapping:
            with self.profiler.span("track.obj_update"):
                self.map, frame = self.objects.update(self.map, frame)

        # --- motion model ---
        if ok:
            # stays a device array: forcing it to host costs an RTT per
            # frame on a remote-attached chip; every consumer re-wraps
            # with jnp.asarray anyway
            self.velocity = tr2.Tcw @ se3.inverse(last.Tcw)

        # --- keyframe policy ---
        if ok and self.enable_mapping:
            if self._async is not None and self._async.ready():
                # adopt a finished mapping pass as soon as it lands
                merged_kf = self._async.pending_kf
                self.map = self._async.merge(self.map)
                if self.loop_closer is not None and merged_kf >= 0:
                    with self.profiler.span("loop.on_keyframe"):
                        self.map, _ = self.loop_closer.on_keyframe(
                            self.map, merged_kf)
            with self.profiler.span("track.kf_policy"):
                pol = np.asarray(self._jit_kf_policy(
                    self.map, frame.depth, frame.kp_pt, frame.valid,
                    np.int32(max(self.last_kf_id, 0)),
                    np.int32(3 if self.n_keyframes > 2 else 1)))
            n_close_trk, n_close_untrk, ref_matches = (int(x) for x in pol)
            if os.environ.get("OSLAM_DEBUG"):
                print(f"[kf-policy] f={self.frame_id} inl={n_inl} "
                      f"ref={ref_matches} close_trk={n_close_trk} "
                      f"close_untrk={n_close_untrk} "
                      f"since={self.frames_since_kf}", flush=True)
            if trk.need_new_keyframe(
                    n_inl, ref_matches, n_close_trk, n_close_untrk,
                    self.frames_since_kf,
                    max_frames=cfg.tracking.max_frames_between_kf,
                    last_kf_inliers=getattr(self, "_kf_inliers", 0),
                    min_gap=cfg.tracking.min_frames_between_kf):
                close = (frame.depth > 0) & (
                    frame.depth < cfg.camera.th_depth * cfg.camera.baseline)
                spawn = close & (frame.kp_pt < 0) & frame.valid
                if self._async is not None and self._async.pending:
                    # a mapping pass is still in flight: fold it in before
                    # inserting on top (the KF-rate barrier — non-KF
                    # frames never wait; LocalMapping's queue analogue)
                    merged_kf = self._async.pending_kf
                    self.map = self._async.merge(self.map)
                    if self.loop_closer is not None and merged_kf >= 0:
                        self.map, _ = self.loop_closer.on_keyframe(
                            self.map, merged_kf)
                self.map, kf_id = self._jit_insert(
                    self.map, frame, tr2.Tcw, tr2.kp_pt, spawn,
                    np.int32(self.frame_id))
                # adopt the spawned point bindings into the live frame so
                # the next frame's motion-model search tracks them
                # (CreateNewKeyFrame fills mCurrentFrame.mvpMapPoints,
                # Tracking.cc:1352-1396) — without this, matches decay no
                # matter how many keyframes spawn
                frame = frame._replace(kp_pt=self.map.kf_kp_pt[int(kf_id)])
                kf_gap = self.frames_since_kf
                self.last_kf_id = int(kf_id)
                self.frames_since_kf = 0
                self._kf_inliers = n_inl
                if self._async is not None:
                    with self.profiler.span("mapping.dispatch"):
                        self._async.dispatch(
                            self.map, int(kf_id),
                            fast=self._mapping_fn(kf_gap)
                            is self._jit_mapping_fast)
                else:
                    with self.profiler.span("mapping.process_kf"):
                        self.map = self._mapping_fn(kf_gap)(
                            self.map, jnp.int32(kf_id))
                    if self.loop_closer is not None:
                        with self.profiler.span("loop.on_keyframe"):
                            self.map, closed = self.loop_closer.on_keyframe(
                                self.map, int(kf_id))
            else:
                self.frames_since_kf += 1
                # peak-anchored decay (see _resolve_one)
                self._kf_inliers = max(getattr(self, "_kf_inliers", 0),
                                       n_inl)

        self._record(frame, ok)
        self.last_frame = frame
        self.frame_id += 1
        return frame

    # ------------------------------------------------------------------
    def _track_fused(self, frame: FrameData):
        """Latency-optimal per-frame path (mapping on): the whole tracking
        chain — including the object association / semantic pose opt /
        object update stages when objects are enabled — runs as ONE device
        program, and the packed host-facing vector is read back ONE FRAME
        LATE: a device->host readback on a remote-attached chip costs a
        full tunnel round trip (~24 ms measured — more than the whole
        fused program), but `copy_to_host_async` issued at dispatch lands
        while the NEXT frame builds, making the lagged read ~free. All
        host bookkeeping for a frame (records, state machine, keyframe
        insertion, relocalization) happens in _resolve_fused_pending at
        the next call. The returned frame's pose_ok is a DEVICE scalar:
        callers that need the strict per-frame answer (tests, interactive
        probes) force the sync themselves by reading it; the throughput
        path never does. cfg.tracking.pipelined_readback=False restores
        the strict one-sync-per-frame behavior."""
        last = self.last_frame
        with self.profiler.span("track.fused"):
            self.map, tr2, obj3d, packed, vel, okd = self._jit_fused(
                self.map, frame, last, self.velocity,
                np.int32(max(self.last_kf_id, 0)),
                np.int32(self.frames_since_kf), np.int32(self.frame_id),
                np.int32(getattr(self, "_kf_inliers", 0)))
        if self.objects is not None:
            frame = frame._replace(obj3d=obj3d)
        frame = frame._replace(Tcw=tr2.Tcw, kp_pt=tr2.kp_pt, pose_ok=okd)
        self.debug_last = {"tr_motion": tr2, "tr_local": tr2,
                           "frame": frame}
        # velocity provisionally advances as a DEVICE output of the same
        # program (zero eager per-frame ops — each eager op is a dispatch
        # RPC on a remote chip); a LOST/reloc outcome resets it during
        # resolve, before the next dispatch reads it
        self.velocity = vel
        try:
            packed.copy_to_host_async()
        except AttributeError:
            pass
        prev = self._fused_pending
        # ref_kf: the id Tcr was computed against ON DEVICE. Pipelined
        # resolve may insert a KF before this frame's record is written —
        # recording the resolve-time last_kf_id against the dispatch-time
        # Tcr corrupted every post-KF frame's final_trajectory pose by
        # the full inter-KF displacement (~2.4 m at KITTI motion; the
        # r5a drive read ATE 1.28 m from a trajectory whose true endpoint
        # error was 0.3 m).
        self._fused_pending = {"packed": packed, "frame": frame,
                               "ts": self._host_ts, "fid": self.frame_id,
                               "ref": max(self.last_kf_id, 0)}
        self.last_frame = frame
        self.frame_id += 1
        # resolve the PREVIOUS frame only now — AFTER this frame's
        # dispatch went out. Resolve blocks on the previous packed
        # readback (program completion + tunnel round trip); with the
        # round-3 resolve-first order the device sat idle that whole
        # wait, every frame (~20 of 40 ms measured in the loop trace).
        # Dispatch-first keeps the queue fed; the previous frame's KF
        # insertion then lands AFTER this frame's tracking program, which
        # is safe: the insert only adds a KF row + spawns points, and
        # this frame's updates never reference them.
        if prev is not None:
            self._resolve_one(prev, latest=False)
        if not self.cfg.tracking.pipelined_readback:
            self._resolve_fused_pending()
            return self.last_frame
        return frame

    def _resolve_fused_pending(self):
        """Consume the lagged packed result of the newest fused dispatch —
        strict catch-up for mode switches, state queries, and shutdown."""
        pend = self._fused_pending
        if pend is None:
            return
        self._fused_pending = None
        self._resolve_one(pend, latest=True)

    def _resolve_one(self, pend, latest: bool):
        """Per-frame host bookkeeping for one fused dispatch (trajectory
        record, state machine, KF insertion + mapping + loop detection,
        relocalization). latest=False means a newer frame is already
        in flight: last_frame must not be rolled back to this one."""
        cfg = self.cfg
        frame = pend["frame"]
        with self.profiler.span("track.resolve"):
            p = np.asarray(pend["packed"])
        Tcw_np = p[0:16].reshape(4, 4)
        ok = p[48] > 0.5
        # min-gap gate applied HERE, where frames_since_kf is current —
        # on-device it is one frame stale under pipelined readback (see
        # track_frame_fused packed[57])
        need_soft = p[49] > 0.5
        need_hard = len(p) > 57 and p[57] > 0.5
        need_kf = bool(need_hard) or (
            bool(need_soft)
            and self.frames_since_kf >= cfg.tracking.min_frames_between_kf)
        n_inl = int(p[50])
        self._last_n_inliers = n_inl
        if os.environ.get("OSLAM_DEBUG"):
            print(f"[fused] f={pend['fid']} ok={int(p[48])} "
                  f"need_kf={int(need_kf)} inl={n_inl} "
                  f"matches={int(p[51])} ref_kf={int(p[52])} "
                  f"close_trk={int(p[53])} close_untrk={int(p[54])} "
                  f"motion_inl={int(p[55])} n_sem={int(p[56])} "
                  f"since={self.frames_since_kf}", flush=True)
        if self.objects is not None:
            # N_AllSemanticConstraintNum analogue, from the same packed
            # readback (ObjectOptimizer.cc:23,1233)
            self.objects.semantic_constraints += int(p[56])

        relocalized = False
        if not ok and n_inl < 10:
            tr_rel = self._relocalize(frame)
            if tr_rel is None:
                self.state = LOST
                self.velocity = np.eye(4, dtype=np.float32)
                self._record_np(pend["ts"], Tcw_np, False)
                if latest:
                    self.last_frame = frame
                return
            frame = frame._replace(Tcw=tr_rel.Tcw, kp_pt=tr_rel.kp_pt)
            Tcw_np = np.asarray(tr_rel.Tcw)
            ok, need_kf = True, False
            relocalized = True
            self.velocity = np.eye(4, dtype=np.float32)
            n_inl = int(tr_rel.n_inliers)

        self.state = OK if ok else LOST
        if ok and need_kf:
            close = frame.valid & (frame.depth > 0) & (
                frame.depth < cfg.camera.th_depth * cfg.camera.baseline)
            spawn = close & (frame.kp_pt < 0)
            if self._async is not None and self._async.pending:
                merged_kf = self._async.pending_kf
                self.map = self._async.merge(self.map)
                if self.loop_closer is not None and merged_kf >= 0:
                    self.map, _ = self.loop_closer.on_keyframe(
                        self.map, merged_kf)
            self.map, kf_id = self._jit_insert(
                self.map, frame, frame.Tcw, frame.kp_pt, spawn,
                np.int32(pend["fid"]))
            frame = frame._replace(kp_pt=self.map.kf_kp_pt[int(kf_id)])
            kf_gap = self.frames_since_kf
            self.last_kf_id = int(kf_id)
            self.frames_since_kf = 0
            self._kf_inliers = n_inl
            if self._async is not None:
                self._async.dispatch(
                    self.map, int(kf_id),
                    fast=self._mapping_fn(kf_gap) is self._jit_mapping_fast)
            else:
                with self.profiler.span("mapping.process_kf"):
                    self.map = self._mapping_fn(kf_gap)(self.map,
                                                        np.int32(kf_id))
                if self.loop_closer is not None:
                    with self.profiler.span("loop.on_keyframe"):
                        self.map, _ = self.loop_closer.on_keyframe(
                            self.map, int(kf_id))
            self._record_np(pend["ts"], Tcw_np, True)
        elif ok:
            self.frames_since_kf += 1
            # the decay trigger anchors to the PEAK inlier count since
            # the last insertion, not the count AT insertion: a keyframe
            # born at a weak moment (58 inliers) otherwise anchors the
            # 0.6x decay threshold at 35 and lets a coverage-exit
            # freefall (measured r5: 583 -> 64 inliers over 18 frames on
            # the TUM circuit pan) run unanswered until the weak-ratio
            # trigger's stale reference finally fires
            self._kf_inliers = max(getattr(self, "_kf_inliers", 0), n_inl)
            if relocalized:
                # the packed Tcr belongs to the FAILED fused attempt;
                # recompute from the reloc pose (ADVICE r3)
                self._record_np(pend["ts"], Tcw_np, True)
            else:
                # Tcr came back in the same packed readback — record with
                # NO extra device traffic, against the DISPATCH-time ref
                # (pend["ref"]), which is the KF the device composed
                # Tcr with
                self._record_precomputed(pend["ts"], Tcw_np,
                                         p[32:48].reshape(4, 4), True,
                                         ref_kf=pend.get("ref"))
        else:
            self._record_np(pend["ts"], Tcw_np, False)
        if latest:
            self.last_frame = frame

    def _record_precomputed(self, timestamp, Tcw_np, Tcr_np, tracked,
                            ref_kf=None):
        if ref_kf is None:
            ref_kf = max(self.last_kf_id, 0)
        self.trajectory.append(FrameRecord(
            timestamp=float(timestamp), Tcw=Tcw_np,
            ref_kf=int(ref_kf), Tcr=Tcr_np, tracked=tracked))

    def _record_np(self, timestamp, Tcw_np, tracked):
        ref = max(self.last_kf_id, 0)
        Tkw = np.asarray(self.map.kf_pose[ref])
        self.trajectory.append(FrameRecord(
            timestamp=float(timestamp), Tcw=Tcw_np, ref_kf=ref,
            Tcr=Tcw_np @ np.linalg.inv(Tkw), tracked=tracked))

    # ------------------------------------------------------------------
    def _relocalize(self, frame):
        """Relocalization (Tracking.cc:1606-1767). With a vocabulary:
        BoW candidates (KeyFrameDatabase::DetectRelocalizationCandidates,
        KeyFrameDatabase.cc:199-310), then the full per-candidate protocol
        — match -> PnP RANSAC -> pose opt -> guided projection re-search —
        accepted at >= 50 inliers (:1752). Without a vocabulary the match
        runs once against the whole map-point slab (weaker gate)."""
        m = self.map
        P = m.pt_xyz.shape[0]
        pt_sel = m.pt_valid
        if self.loop_closer is not None and m.kf_bow.shape[1] > 1:
            from object_slam_tpu.loop import kfdb
            _, bow = self.loop_closer.vocab.transform(frame.desc, frame.valid)
            cand, scores = kfdb.detect_reloc_candidates(
                m.kf_bow, m.kf_valid, bow)
            cand_np = np.asarray(cand)
            if cand_np.any():
                # the reference iterates ALL candidates, each with its own
                # RANSAC + optimization, until one reaches 50 inliers
                # (Tracking.cc:1640-1751 while(nCandidates>0)); score
                # order gives the early exit its best shot
                order = np.argsort(-np.asarray(scores) * cand_np)
                for kf in order[:int(cand_np.sum())]:
                    if not cand_np[kf]:
                        break
                    self.rng, k = jax.random.split(self.rng)
                    tr = self._jit_reloc_try(m, frame, np.int32(kf), k)
                    if int(tr.n_inliers) >= 50:
                        return tr
                return None
        # match frame descriptors against the candidate point set
        from object_slam_tpu.features import matching as match_mod
        midx, mok = match_mod.brute_match(
            frame.desc, frame.valid, m.pt_desc,
            pt_sel, th_dist=50, nn_ratio=0.75, check_rotation=False)
        if int(jnp.sum(mok)) < 30:
            return None
        self.rng, k = jax.random.split(self.rng)
        pw = m.pt_xyz[jnp.clip(midx, 0, P - 1)]
        res = pnp_ransac(k, self.K, pw, frame.uv, mok,
                         min_inliers=max(
                             self.cfg.solver.epnp_min_inliers, 25))
        # a relocalization is only trusted with a strong consensus AND a
        # sane pose (Tracking.cc:1752-1764 requires 50 inliers post-opt);
        # accepting weak PnP poses is how a lost tracker teleports
        if not bool(res.ok) or int(res.n_inliers) < 30:
            return None
        t_norm = float(jnp.linalg.norm(res.Tcw[:3, 3]))
        if not np.isfinite(t_norm) or t_norm > 1e3:
            return None
        kp_pt = jnp.where(res.inliers, midx, -1)
        return trk.TrackResult(Tcw=res.Tcw, kp_pt=kp_pt,
                               inlier=res.inliers,
                               n_matches=jnp.sum(mok.astype(jnp.int32)),
                               n_inliers=res.n_inliers)

    # ------------------------------------------------------------------
    def _record(self, frame, tracked: bool):
        ref = max(self.last_kf_id, 0)
        # one packed pull for both poses (2 RTTs -> 1 on a remote chip)
        pair = np.asarray(jnp.stack([jnp.asarray(frame.Tcw),
                                     self.map.kf_pose[ref]]))
        Tcw, Tkw = pair[0], pair[1]
        Tcr = Tcw @ np.linalg.inv(Tkw)
        self.trajectory.append(FrameRecord(
            timestamp=float(frame.timestamp), Tcw=Tcw, ref_kf=ref,
            Tcr=Tcr, tracked=tracked))

    def _mapping_fn(self, kf_gap: int):
        """Pick the full or abbreviated mapping program (the mbAbortBA
        interruption analogue): when this keyframe arrived within
        ba_abort_pressure_gap frames of the previous one, the tracker is
        outrunning the mapper and the local BA runs its abbreviated
        schedule exactly as the reference's interrupt would cut it short
        (LocalMapping.cc:119; config.MappingConfig.ba_abort_*)."""
        gap_cfg = self.cfg.mapping.ba_abort_pressure_gap
        if gap_cfg > 0 and kf_gap < gap_cfg:
            return self._jit_mapping_fast
        return self._jit_mapping

    def flush_mapping(self):
        """Fold any in-flight async mapping pass into the live map (the
        Shutdown-time thread join analogue) — without this the last
        keyframe's triangulation/BA would be dropped on save."""
        self._resolve_fused_pending()
        if self._async is not None and self._async.pending:
            merged_kf = self._async.pending_kf
            self.map = self._async.merge(self.map)
            if self.loop_closer is not None and merged_kf >= 0:
                self.map, _ = self.loop_closer.on_keyframe(
                    self.map, merged_kf)

    def final_trajectory(self):
        """Recompose each frame pose from its reference KF's (possibly
        BA/loop-corrected) pose, as SaveTrajectoryTUM (System.cc:378-436).
        Records whose reference KF was culled hop the spanning tree via
        the frozen T_child_parent (the reference's while-isBad walk,
        System.cc:400-410) so they still inherit corrections."""
        self.flush_mapping()
        kf_pose = np.asarray(self.map.kf_pose)
        kf_valid = np.asarray(self.map.kf_valid)
        kf_parent = np.asarray(self.map.kf_parent)
        kf_tcp = np.asarray(self.map.kf_tcp)
        Kcap = kf_pose.shape[0]
        out = []
        for rec in self.trajectory:
            ref, Tcr = rec.ref_kf, rec.Tcr
            hops = 0
            while (0 <= ref < Kcap and not kf_valid[ref]
                   and kf_parent[ref] >= 0 and hops < Kcap):
                Tcr = Tcr @ kf_tcp[ref]
                ref = int(kf_parent[ref])
                hops += 1
            Tcw = Tcr @ kf_pose[ref]
            out.append((rec.timestamp, Tcw, rec.tracked))
        return out

    # ------------------------------------------------------------------
    # mode / lifecycle API (System.h:64-130 parity)
    # ------------------------------------------------------------------
    def activate_localization_mode(self):
        """Tracking-only: stop inserting keyframes / mutating the map
        (System::ActivateLocalizationMode, System.cc:133-150)."""
        self._resolve_fused_pending()
        self.enable_mapping = False

    def deactivate_localization_mode(self):
        self.enable_mapping = True

    def reset(self):
        """Clear map + trajectory + tracker state (System::Reset ->
        Tracking::Reset, Tracking.cc:1769-1815). The reference also does
        this automatically when lost with <= 5 KFs (Tracking.cc:553-561) —
        the caller drives that policy here."""
        self.map = init_map(self.cfg.caps, self.cfg.objects.history_capacity)
        if self.loop_closer is not None:
            n_words = self.loop_closer.vocab.n_words
            self.map = self.map._replace(
                kf_bow=jnp.zeros((self.cfg.caps.max_keyframes, n_words)))
            self.loop_closer.consistent_groups = []
            self.loop_closer.last_loop_kf = -10
        if self.objects is not None:
            self.objects.semantic_constraints = 0
        self.state = NOT_INITIALIZED
        self.last_frame = None
        self.velocity = np.eye(4, dtype=np.float32)
        self.last_kf_id = -1
        self.frames_since_kf = 0
        self.trajectory = []
        self._mono_ref = None
        self._fused_pending = None

    def get_tracking_state(self) -> int:
        """NOT_INITIALIZED=0 / OK=1 / LOST=2 (Tracking.h:99-105). Forces
        the lagged fused readback so the answer reflects the last frame."""
        self._resolve_fused_pending()
        return self.state

    def shutdown(self, checkpoint_path: Optional[str] = None):
        """Flush state; optionally snapshot the map (the reference's
        Shutdown only joins threads — there are none here; the useful
        analogue is a final checkpoint). flush_mapping first: with
        pipelined_readback/async mapping a checkpoint taken mid-flight
        would drop the last frame's bookkeeping, a pending keyframe
        insertion, and any in-flight mapping pass (ADVICE r3)."""
        self.flush_mapping()
        if checkpoint_path:
            from object_slam_tpu.slam import checkpoint
            checkpoint.save_system(checkpoint_path, self)

    @property
    def n_keyframes(self):
        self._resolve_fused_pending()
        return int(self.map.n_kf)

    @property
    def n_points(self):
        self._resolve_fused_pending()
        return int(jnp.sum(self.map.pt_valid))
