"""Front-end tracking: the per-frame pose pipeline.

Parity with `Tracking` (`Tracking.{h,cc}`): state machine
(NOT_INITIALIZED / OK / LOST, `Tracking.h:99-105`), stereo/RGB-D
initialization (`Tracking.cc:590-650`), motion-model tracking
(`:948-1009`), reference-KF tracking (`:838-880`), relocalization
(`:1606-1767`), local-map tracking (`:1011-1056`, `:1408-1604`), keyframe
policy (`:1242-1326`).

TPU redesign: each stage is one jitted masked-dense computation; the host
only sequences stages and reads tiny scalars (inlier counts) to drive the
state machine. Map point "local window" selection is a top-k compaction to
a static slab so the hot matching matrices keep fixed shapes.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from object_slam_tpu.geometry import se3, camera as cam_mod
from object_slam_tpu.features import matching
from object_slam_tpu.solvers.pose_opt import (PoseObs, pose_optimize,
                                              pose_optimize_best)
from object_slam_tpu.slam.frame import FrameData
from object_slam_tpu.slam.map_state import MapState, covisibility

MAX_LOCAL_POINTS = 4096


class TrackResult(NamedTuple):
    Tcw: jnp.ndarray
    kp_pt: jnp.ndarray          # [N] matched point per keypoint (-1)
    inlier: jnp.ndarray         # [N] bool pose-opt inliers
    n_matches: jnp.ndarray      # [] int32
    n_inliers: jnp.ndarray
    kp_pt_all: jnp.ndarray = None   # [N] pre-inlier-filter match table


# ---------------------------------------------------------------------------
# Stage: motion-model tracking
# ---------------------------------------------------------------------------

def _motion_level_bounds(K, T_pred, T_last, last_level, n_levels):
    """Per-row pyramid-level search bounds for the frame-to-frame search
    (ORBmatcher.cc:1341-1360): under FORWARD motion (current camera center
    more than one baseline ahead in the last camera's frame) a close point
    looms roughly one pyramid level per frame, so the window is one-sided
    and unbounded upward [last, n_levels); BACKWARD mirrors it; otherwise
    the symmetric +-1 window. Returns (lvl_lo, lvl_hi) [N] int32 or
    (None, None) when no last pose is available to classify the motion."""
    if T_last is None:
        return None, None
    baseline = K.bf / K.fx
    cw = -T_pred[:3, :3].T @ T_pred[:3, 3]      # current camera center (world)
    tlc_z = (T_last[2, :3] @ cw + T_last[2, 3])
    forward = tlc_z > baseline
    backward = tlc_z < -baseline
    # Measured deviation from the reference's hard one-sided window
    # (minLevel = nLastOctave exactly): detection level jitters +-1 even
    # under pure looming, and the -1 bucket held MORE recoverable matches
    # than all >= +2 buckets combined on the KITTI probe
    # (scripts/diag_kitti_retention.py: symmetric+-1 62.6%, one-sided
    # from last-1 68.3%) — so the open end keeps the reference semantics
    # and the closed end keeps the +-1 jitter tolerance.
    lo = jnp.where(forward, last_level - 1,
                   jnp.where(backward, 0, last_level - 1))
    hi = jnp.where(forward, n_levels - 1,
                   jnp.where(backward, last_level + 1, last_level + 1))
    return lo.astype(jnp.int32), hi.astype(jnp.int32)


def track_motion_model(K, m: MapState, frame: FrameData,
                       last_uv, last_pt, last_level, last_valid,
                       T_pred, scale_factors, inv_sigma2_lvl,
                       radius_th: float = 15.0,
                       min_matches: int = 20, T_last=None,
                       last_angle=None) -> TrackResult:
    """SearchByProjection(cur, last) + PoseOptimization
    (Tracking.cc:948-1009, ORBmatcher.cc:1328-1470).

    last_*: the previous frame's keypoint slab and its point matches.
    """
    P = m.pt_xyz.shape[0]
    rows_ok = last_valid & (last_pt >= 0)
    ptc = jnp.clip(last_pt, 0, P - 1)
    pw = m.pt_xyz[ptc]
    rows_ok = rows_ok & m.pt_valid[ptc]

    pc = se3.apply(T_pred, pw[None])[0]
    uv = cam_mod.project(K, pc)
    rows_ok = rows_ok & (pc[:, 2] > 0) & cam_mod.in_image(K, uv)

    lvl = jnp.clip(last_level, 0, scale_factors.shape[0] - 1)
    radius = radius_th * scale_factors[lvl]
    ur_pred = uv[:, 0] - K.bf / jnp.maximum(pc[:, 2], 1e-6)

    lvl_lo, lvl_hi = _motion_level_bounds(K, T_pred, T_last, lvl,
                                          scale_factors.shape[0])
    midx, mok = matching.search_by_projection(
        uv, last_level, m.pt_desc[ptc], rows_ok,
        frame.uv, frame.level, frame.desc, frame.valid,
        radius_per_row=radius, th_dist=100, nn_ratio=None,
        kp_ur=frame.ur, proj_ur=ur_pred, r_ur=radius,
        lvl_lo=lvl_lo, lvl_hi=lvl_hi,
        angle_a=last_angle, angle_b=frame.angle)

    # build per-keypoint match table
    N = frame.uv.shape[0]
    kp_pt = jnp.full((N,), -1, jnp.int32)
    tgt = jnp.clip(midx, 0, N - 1)
    kp_pt = kp_pt.at[tgt].set(jnp.where(mok, last_pt, kp_pt[tgt]))

    return _optimize_from_matches(K, m, frame, T_pred, kp_pt,
                                  inv_sigma2_lvl, min_matches,
                                  T_alt=T_last)


def _optimize_from_matches(K, m, frame, T0, kp_pt, inv_sigma2_lvl,
                           min_matches, T_alt=None) -> TrackResult:
    """Pose solve over the matched set. When T_alt is given, BOTH inits
    are optimized and the lower-cost result wins (pose_optimize_best) —
    the escape hatch from the velocity-extrapolation feedback loop."""
    P = m.pt_xyz.shape[0]
    matched = (kp_pt >= 0) & frame.valid
    ptc = jnp.clip(kp_pt, 0, P - 1)
    obs = PoseObs(
        uv=frame.uv, ur=jnp.where(matched, frame.ur, -1.0),
        pw=m.pt_xyz[ptc],
        inv_sigma2=inv_sigma2_lvl[jnp.clip(frame.level, 0,
                                           inv_sigma2_lvl.shape[0] - 1)],
        valid=matched)
    n_matches = jnp.sum(matched.astype(jnp.int32))
    if T_alt is not None:
        inits = jnp.stack([T0, T_alt])
        Tcw, inlier, n_inl = pose_optimize_best(K, inits, obs)
    else:
        Tcw, inlier, n_inl = pose_optimize(K, T0, obs)
    kp_pt_out = jnp.where(inlier, kp_pt, -1)
    return TrackResult(Tcw=Tcw, kp_pt=kp_pt_out, inlier=inlier,
                       n_matches=n_matches, n_inliers=n_inl,
                       kp_pt_all=kp_pt)


def track_motion_model_vo(K, m: MapState, frame: FrameData,
                          last: FrameData, T_pred, scale_factors,
                          inv_sigma2_lvl, radius_th: float = 15.0):
    """Localization-mode motion tracking with temporal VO points
    (Tracking.cc:384-514): every last-frame keypoint with measured depth
    but no map point acts as a TEMPORARY 3D point (the reference's
    UpdateLastFrame spawns mlpTemporalPoints and deletes them at
    :509-514), so tracking-only mode survives regions the frozen map never
    covered. Temporal matches contribute to the pose solve but never gain
    map-point ids.

    Returns (TrackResult, n_map_inliers []) — the second output drives the
    mbVO state (Tracking.h mbVO: "few matches to MAP points").
    """
    P = m.pt_xyz.shape[0]
    N = frame.uv.shape[0]
    ptc = jnp.clip(last.kp_pt, 0, P - 1)
    has_pt = last.valid & (last.kp_pt >= 0) & m.pt_valid[ptc]
    temporal = last.valid & ~has_pt & (last.depth > 0)
    rows_ok = has_pt | temporal

    pc_last = cam_mod.backproject(K, last.uv, jnp.maximum(last.depth, 1e-6))
    pw_tmp = se3.apply(se3.inverse(last.Tcw), pc_last[None])[0]
    pw = jnp.where(has_pt[:, None], m.pt_xyz[ptc], pw_tmp)
    desc = jnp.where(has_pt[:, None], m.pt_desc[ptc], last.desc)

    pc = se3.apply(T_pred, pw[None])[0]
    uv = cam_mod.project(K, pc)
    rows_ok = rows_ok & (pc[:, 2] > 0) & cam_mod.in_image(K, uv)
    lvl = jnp.clip(last.level, 0, scale_factors.shape[0] - 1)
    radius = radius_th * scale_factors[lvl]
    ur_pred = uv[:, 0] - K.bf / jnp.maximum(pc[:, 2], 1e-6)

    lvl_lo, lvl_hi = _motion_level_bounds(K, T_pred, last.Tcw, lvl,
                                          scale_factors.shape[0])
    midx, mok = matching.search_by_projection(
        uv, last.level, desc, rows_ok,
        frame.uv, frame.level, frame.desc, frame.valid,
        radius_per_row=radius, th_dist=100, nn_ratio=None,
        kp_ur=frame.ur, proj_ur=ur_pred, r_ur=radius,
        lvl_lo=lvl_lo, lvl_hi=lvl_hi,
        angle_a=last.angle, angle_b=frame.angle)

    tgt = jnp.clip(midx, 0, N - 1)
    kp_pw = jnp.zeros((N, 3), pw.dtype)
    kp_pw = kp_pw.at[tgt].set(jnp.where(mok[:, None], pw, kp_pw[tgt]))
    kp_obs = jnp.zeros((N,), bool).at[tgt].max(mok)
    kp_pt = jnp.full((N,), -1, jnp.int32)
    kp_pt = kp_pt.at[tgt].set(
        jnp.where(mok & has_pt, last.kp_pt, kp_pt[tgt]))

    matched = kp_obs & frame.valid
    obs = PoseObs(
        uv=frame.uv, ur=jnp.where(matched, frame.ur, -1.0), pw=kp_pw,
        inv_sigma2=inv_sigma2_lvl[jnp.clip(frame.level, 0,
                                           inv_sigma2_lvl.shape[0] - 1)],
        valid=matched)
    Tcw, inlier, n_inl = pose_optimize_best(
        K, jnp.stack([T_pred, last.Tcw]), obs)
    kp_pt_out = jnp.where(inlier, kp_pt, -1)
    n_map_inl = jnp.sum((kp_pt_out >= 0).astype(jnp.int32))
    res = TrackResult(Tcw=Tcw, kp_pt=kp_pt_out, inlier=inlier,
                      n_matches=jnp.sum(matched.astype(jnp.int32)),
                      n_inliers=n_inl, kp_pt_all=kp_pt)
    return res, n_map_inl


# ---------------------------------------------------------------------------
# Stage: reference-keyframe tracking (fallback)
# ---------------------------------------------------------------------------

def track_reference_kf(K, m: MapState, frame: FrameData, ref_kf,
                       T0, inv_sigma2_lvl,
                       min_matches: int = 15) -> TrackResult:
    """Brute descriptor match against the reference KF's mapped keypoints
    then pose optimization (Tracking.cc:838-880; SearchByBoW replaced by a
    dense Hamming matrix — see features/matching.py rationale)."""
    N = frame.uv.shape[0]
    kf_desc = m.kf_kp_desc[ref_kf]
    kf_pt = m.kf_kp_pt[ref_kf]
    P = m.pt_xyz.shape[0]
    rows_ok = m.kf_kp_valid[ref_kf] & (kf_pt >= 0) & \
        m.pt_valid[jnp.clip(kf_pt, 0, P - 1)]
    midx, mok = matching.brute_match(
        kf_desc, rows_ok, frame.desc, frame.valid,
        th_dist=50, nn_ratio=0.7,
        angle_a=m.kf_kp_angle[ref_kf], angle_b=frame.angle,
        check_rotation=True)
    kp_pt = jnp.full((N,), -1, jnp.int32)
    tgt = jnp.clip(midx, 0, N - 1)
    kp_pt = kp_pt.at[tgt].set(jnp.where(mok, kf_pt, kp_pt[tgt]))
    return _optimize_from_matches(K, m, frame, T0, kp_pt,
                                  inv_sigma2_lvl, min_matches)


# ---------------------------------------------------------------------------
# Stage: per-candidate relocalization
# ---------------------------------------------------------------------------

def relocalize_try(K, m: MapState, frame: FrameData, kf_id, rng,
                   scale_factors, inv_sigma2_lvl) -> TrackResult:
    """One relocalization attempt against candidate keyframe kf_id — the
    full per-candidate protocol of Tracking::Relocalization
    (Tracking.cc:1606-1767): descriptor match to the candidate's mapped
    keypoints -> PnP RANSAC -> pose optimization -> guided projection
    re-search against the candidate's covisible point set -> final pose
    optimization. The caller gates acceptance at >= 50 inliers (:1752).
    """
    N = frame.uv.shape[0]
    P = m.pt_xyz.shape[0]
    Kcap = m.kf_pose.shape[0]

    # 1. match to the candidate's mapped keypoints (SearchByBoW analogue)
    kf_pt = m.kf_kp_pt[kf_id]
    rows_ok = m.kf_kp_valid[kf_id] & (kf_pt >= 0) \
        & m.pt_valid[jnp.clip(kf_pt, 0, P - 1)]
    midx, mok = matching.brute_match(
        m.kf_kp_desc[kf_id], rows_ok, frame.desc, frame.valid,
        th_dist=50, nn_ratio=0.75,
        angle_a=m.kf_kp_angle[kf_id], angle_b=frame.angle)
    kp_pt = jnp.full((N,), -1, jnp.int32)
    tgt = jnp.clip(midx, 0, N - 1)
    kp_pt = kp_pt.at[tgt].set(jnp.where(mok, kf_pt, kp_pt[tgt]))
    matched = (kp_pt >= 0) & frame.valid

    # 2. PnP RANSAC for an absolute pose hypothesis
    from object_slam_tpu.solvers.epnp import pnp_ransac
    pw = m.pt_xyz[jnp.clip(kp_pt, 0, P - 1)]
    pnp = pnp_ransac(rng, K, pw, frame.uv, matched, min_inliers=10)

    # 3. pose optimization on the matches
    tr = _optimize_from_matches(K, m, frame, pnp.Tcw, kp_pt,
                                inv_sigma2_lvl, 10)

    # 4. guided projection re-search over the candidate's covisible point
    # set (Tracking.cc:1694-1744 re-searches by projection when the first
    # optimization is short of 50)
    W = covisibility(m)[kf_id]
    nbr = (W > 0) | (jnp.arange(Kcap) == kf_id)
    A = m.kf_kp_pt
    cand_pts = jnp.zeros((P,), bool).at[
        jnp.clip(A, 0, P - 1).reshape(-1)].max(
        ((A >= 0) & m.kf_kp_valid & nbr[:, None]).reshape(-1))
    cand_pts = cand_pts & m.pt_valid

    pc = se3.apply(tr.Tcw, m.pt_xyz[None])[0]
    uv = cam_mod.project(K, pc)
    already = jnp.zeros((P,), bool).at[
        jnp.clip(tr.kp_pt, 0, P - 1)].max(tr.kp_pt >= 0)
    vis = cand_pts & ~already & (pc[:, 2] > 0) & cam_mod.in_image(K, uv)
    kp_free = frame.valid & (tr.kp_pt < 0)
    midx2, mok2 = matching.search_by_projection(
        uv, jnp.zeros((P,), jnp.int32), m.pt_desc, vis,
        frame.uv, frame.level, frame.desc, kp_free,
        radius_per_row=jnp.full((P,), 10.0), th_dist=100,
        nn_ratio=None, level_window=8)
    kp_pt2 = tr.kp_pt
    tgt2 = jnp.clip(midx2, 0, N - 1)
    kp_pt2 = kp_pt2.at[tgt2].set(
        jnp.where(mok2, jnp.arange(P, dtype=jnp.int32), kp_pt2[tgt2]))

    # 5. final optimization over the widened match set
    tr2 = _optimize_from_matches(K, m, frame, tr.Tcw, kp_pt2,
                                 inv_sigma2_lvl, 50)
    sane = jnp.all(jnp.isfinite(tr2.Tcw)) & pnp.ok
    return tr2._replace(n_inliers=jnp.where(sane, tr2.n_inliers, 0))


# ---------------------------------------------------------------------------
# Stage: local-map tracking
# ---------------------------------------------------------------------------

def select_local_points(m: MapState, kp_pt, n_local_kf: int = 16,
                        cap: int = MAX_LOCAL_POINTS):
    """UpdateLocalKeyFrames/Points (Tracking.cc:1460-1604): keyframes that
    share points with the current frame + their covisible neighbors; all
    their points become the local set, compacted to `cap`.

    Gather-form voting: a [P] matched-set scatter (N writes) + a [K, N]
    membership gather — this runs EVERY frame inside the fused program,
    and the round-3 form scattered a full [K, P] incidence slab per frame
    (64 MB and 2M scattered writes at KITTI capacities).

    Compaction ranks RECENT spawns above established points: ranking by
    observation count alone let long-lived landmarks crowd every fresh
    spawn out of the capped set late in a sequence — close-point
    retention then decayed to ZERO over ~200 KITTI frames (the tracker
    could never re-find what the keyframes spawned) and the close-budget
    KF policy spiralled. The reference has no cap at all (it searches
    every local point); recency-first is the static-shape analogue."""
    Kcap, N = m.kf_kp_pt.shape
    P = m.pt_xyz.shape[0]
    matched = kp_pt >= 0
    ptc = jnp.clip(kp_pt, 0, P - 1)

    matched_set = jnp.zeros((P,), bool).at[ptc].max(matched)
    obs_ok = (m.kf_kp_pt >= 0) & m.kf_kp_valid & m.kf_valid[:, None]
    votes = jnp.sum(matched_set[jnp.clip(m.kf_kp_pt, 0, P - 1)] & obs_ok,
                    axis=1)                                    # [K]

    _, local_kfs = jax.lax.top_k(votes, min(n_local_kf, Kcap))
    kf_ok = votes[local_kfs] > 0

    # local point mask: observed by any local KF (scatter over L*N only)
    sel = m.kf_kp_pt[local_kfs]                                # [L, N]
    sel_ok = (sel >= 0) & m.kf_kp_valid[local_kfs] & kf_ok[:, None]
    local_mask = jnp.zeros((P,), bool).at[
        jnp.clip(sel, 0, P - 1).reshape(-1)].max(sel_ok.reshape(-1))
    local_mask = local_mask & m.pt_valid
    # compact: fresh spawns (created within the last 3 KFs) first, then
    # by observation count
    recent = m.pt_first_kf >= m.n_kf - 3
    score = jnp.where(local_mask,
                      m.pt_n_obs + jnp.where(recent, 100000, 0), -1)
    _, local_pts = jax.lax.top_k(score, min(cap, P))
    local_ok = score[local_pts] >= 0
    ref_kf = local_kfs[0]
    return local_pts, local_ok, ref_kf


def track_local_map(K, m: MapState, frame: FrameData, tr: TrackResult,
                    scale_factors, inv_sigma2_lvl, log_scale: float,
                    radius_th: float = 7.0,
                    view_cos_limit: float = 0.5, T_last=None,
                    local_cap: int = MAX_LOCAL_POINTS,
                    radius_mult: float = 1.0, level_window: int = 1):
    """SearchLocalPoints + pose re-optimization (Tracking.cc:1011-1056,
    :1408-1456). Returns (TrackResult, updated map visibility counters,
    ref_kf)."""
    local_pts, local_ok, ref_kf = select_local_points(m, tr.kp_pt,
                                                      cap=local_cap)
    pw = m.pt_xyz[local_pts]

    ok, uv, z, dist, view_cos = cam_mod.frustum_check(
        K, tr.Tcw, pw, m.pt_normal[local_pts],
        m.pt_min_dist[local_pts] * 0.8, m.pt_max_dist[local_pts] * 1.2,
        view_cos_limit)
    ok = ok & local_ok

    # already-matched points are not searched again
    P = m.pt_xyz.shape[0]
    already = jnp.zeros((P,), bool).at[
        jnp.clip(tr.kp_pt, 0, P - 1)].max(tr.kp_pt >= 0)
    ok_search = ok & ~already[local_pts]

    lvl = cam_mod.predict_scale_level(dist, m.pt_max_dist[local_pts],
                                      log_scale, scale_factors.shape[0])
    # radius by viewing angle as the reference (2.5 if cos>0.998 else 4.0);
    # radius_mult/level_window widen the windows for outdoor looming
    # (TrackingConfig.local_radius_mult rationale — parity at 1.0/1)
    r0 = jnp.where(view_cos > 0.998, 2.5, 4.0)
    radius = r0 * scale_factors[lvl] * (radius_th / 7.0) * radius_mult

    ur_pred = uv[:, 0] - K.bf / jnp.maximum(z, 1e-6)
    kp_free = frame.valid & (tr.kp_pt < 0)
    # TH_HIGH + 0.9 ratio as the reference's SearchByProjection(Frame,
    # vpMapPoints) (ORBmatcher.cc:45-129, TH_HIGH=100, mfNNratio=0.9) —
    # TH_LOW here starves retention of slightly-perturbed descriptors
    midx, mok = matching.search_by_projection(
        uv, lvl, m.pt_desc[local_pts], ok_search,
        frame.uv, frame.level, frame.desc, kp_free,
        radius_per_row=radius, th_dist=100, nn_ratio=0.9,
        level_window=level_window,
        kp_ur=frame.ur, proj_ur=ur_pred, r_ur=radius)

    N = frame.uv.shape[0]
    kp_pt = tr.kp_pt
    tgt = jnp.clip(midx, 0, N - 1)
    kp_pt = kp_pt.at[tgt].set(jnp.where(mok, local_pts, kp_pt[tgt]))

    res = _optimize_from_matches(K, m, frame, tr.Tcw, kp_pt,
                                 inv_sigma2_lvl, 30, T_alt=T_last)

    # visibility/found counters for culling (MapPoint::Increase*)
    vis_ids = jnp.where(ok, local_pts, 0)
    m = m._replace(
        pt_visible=m.pt_visible.at[vis_ids].add(ok.astype(jnp.int32)))
    inl_ids = jnp.clip(res.kp_pt, 0, P - 1)
    m = m._replace(
        pt_found=m.pt_found.at[inl_ids].add((res.kp_pt >= 0).astype(jnp.int32)))
    return res, m, ref_kf


# ---------------------------------------------------------------------------
# Fused per-frame step: one device program, one host sync
# ---------------------------------------------------------------------------

def _tree_where(pred, a, b):
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(pred, x, y), a, b)


def track_frame_fused(K, m: MapState, frame: FrameData, last: FrameData,
                      velocity, last_kf_id, frames_since_kf, frame_id,
                      last_kf_inliers,
                      scale_factors, inv_sigma2_lvl, log_scale: float,
                      motion_radius: float, close_depth: float,
                      max_frames_between_kf: int, obj_hooks=None,
                      local_cap: int = MAX_LOCAL_POINTS,
                      local_radius_mult: float = 1.0,
                      local_level_window: int = 1,
                      motion_rot_check: bool = True,
                      semopt_adopt: str = "full"):
    """The whole per-frame tracking chain as ONE compiled program:
    motion-model (+ wide-window retry) -> reference-KF fallback ->
    [object association] -> local-map tracking -> pre-LOST retry ->
    [semantic pose refinement] -> [object landmark update] -> keyframe
    decision, with every host-facing scalar packed into a single flat
    vector.

    Why: the reference's control flow reads a dozen booleans per frame;
    as separate jitted stages each read is a device->host sync, and on a
    remote-attached TPU a sync is a network round trip — the latency
    floor was syncs, not FLOPs. All gates become lax.cond branches (XLA
    executes exactly one) and the host reads ONE array per frame. Round 3
    folds the OBJECT pipeline in the same way: the reference runs
    TrackObject (Tracking.cc:1058), PoseOptimization2
    (ObjectOptimizer.cc:624 via Tracking.cc:1022), and UpdateCurrentObject
    + ObjectMapRegularization (Tracking.cc:1079-1209, :542) inline in its
    per-frame Track(); here they are the obj_hooks stages of the SAME
    one-sync program (the round-2 host-sequenced object path measured
    0.55 fps against the 189.8 fps tracking core — all syncs, no FLOPs).

    obj_hooks: None, or (assoc_fn, semopt_fn, update_fn) — pure jittable
    transforms from slam/objects.ObjectEngine:
      assoc_fn(m, frame, last) -> obj3d [I]
      semopt_fn(m, frame, tr)  -> (Tcw, kp_pt, inlier, n_sem)
      update_fn(m, frame)      -> (m, obj3d)

    Returns (m, TrackResult, obj3d [I], packed [57] f32):
      packed[0:16]  Tcw (row-major)
      packed[16:32] velocity = Tcw @ inv(last.Tcw)
      packed[32:48] Tcr = Tcw @ inv(kf_pose[last_kf_id])
      packed[48]    ok (1/0)         packed[49] need_kf (1/0)
      packed[50]    n_inliers        packed[51] n_matches
      packed[52]    ref_kf           packed[53] n_close_tracked
      packed[54]    n_close_untracked  packed[55] motion n_inliers
      packed[56]    n_semantic_constraints (0 without obj_hooks)
      packed[57]    need_kf with close/decay triggers suppressed — the
                    host applies the min-gap gate with its CURRENT
                    frames_since_kf (the on-device value is one frame
                    stale under pipelined readback)

    Returns (m, TrackResult, obj3d, packed, vel, ok): vel and ok are
    DEVICE outputs so the host state machine advances with zero eager
    per-frame ops (each eager op is a dispatch RPC on a remote chip);
    velocity (the input) is last frame's vel, and the motion prediction
    T_pred = velocity @ last.Tcw folds into the program.
    """
    T_pred = velocity @ last.Tcw
    # --- stage A: motion model, wide-window retry on thin matches
    motion_angle = last.angle if motion_rot_check else None
    tr = track_motion_model(
        K, m, frame, last.uv, last.kp_pt, last.level, last.valid,
        T_pred, scale_factors, inv_sigma2_lvl, radius_th=motion_radius,
        T_last=last.Tcw, last_angle=motion_angle)

    def wide(_):
        return track_motion_model(
            K, m, frame, last.uv, last.kp_pt, last.level, last.valid,
            T_pred, scale_factors, inv_sigma2_lvl,
            radius_th=2.0 * motion_radius, T_last=last.Tcw,
            last_angle=motion_angle)

    tr = jax.lax.cond(tr.n_matches < 20, wide, lambda _: tr, None)

    # --- stage B: reference-KF fallback (Tracking.cc:364-379; the <20
    # pre-opt refusal is :977)
    def refkf(_):
        tr_kf = track_reference_kf(K, m, frame, last_kf_id, last.Tcw,
                                   inv_sigma2_lvl)
        return _tree_where(tr_kf.n_inliers > tr.n_inliers, tr_kf, tr)

    tr = jax.lax.cond((tr.n_matches < 20) | (tr.n_inliers < 10),
                      refkf, lambda _: tr, None)
    tr_motion_inl = tr.n_inliers

    # --- object association (before local-map tracking, Tracking.cc:453)
    # — skipped at trace level when the frame carries no detections
    # (XLA executes one cond branch; detection-free frames pay nothing)
    if obj_hooks is not None:
        assoc_fn, semopt_fn, update_fn = obj_hooks
        has_dets = jnp.any(frame.obj.valid)
        obj3d = jax.lax.cond(
            has_dets,
            lambda: assoc_fn(m, frame._replace(Tcw=tr.Tcw), last),
            lambda: frame.obj3d)
        frame = frame._replace(obj3d=obj3d)

    # --- stage C: local-map tracking
    tr2, m2, ref_kf = track_local_map(
        K, m, frame, tr, scale_factors, inv_sigma2_lvl, log_scale,
        T_last=last.Tcw, local_cap=local_cap,
        radius_mult=local_radius_mult, level_window=local_level_window)

    # --- stage D: pre-LOST retry through the reference KF
    def retry(_):
        tr_kf = track_reference_kf(K, m, frame, last_kf_id, last.Tcw,
                                   inv_sigma2_lvl)
        tr2b, m2b, refb = track_local_map(
            K, m, frame, tr_kf, scale_factors, inv_sigma2_lvl, log_scale,
            T_last=last.Tcw, local_cap=local_cap,
            radius_mult=local_radius_mult,
            level_window=local_level_window)
        better = tr2b.n_inliers > tr2.n_inliers
        return (_tree_where(better, tr2b, tr2),
                _tree_where(better, m2b, m2),
                jnp.where(better, refb, ref_kf))

    tr2, m2, ref_kf = jax.lax.cond(
        (tr2.n_inliers < 30) & (tr.n_inliers >= 10),
        retry, lambda _: (tr2, m2, ref_kf), None)
    m = m2

    # --- semantically constrained refinement of the local-map pose
    # (the PoseOptimization2 swap-in, Tracking.cc:1011-1022) — only when
    # a detection matched a map object; XLA executes one branch.
    n_sem = jnp.int32(0)
    if obj_hooks is not None and semopt_fn is not None:
        def do_sem(tr_in):
            Tcw, kp_pt, inl, ns = semopt_fn(m, frame, tr_in)
            if semopt_adopt == "none":        # diagnostic: count only
                return tr_in, ns
            if semopt_adopt == "pose":        # diagnostic: pose, no regate
                return tr_in._replace(Tcw=Tcw), ns
            return tr_in._replace(
                Tcw=Tcw, kp_pt=kp_pt, inlier=inl,
                n_inliers=jnp.sum((kp_pt >= 0).astype(jnp.int32))), ns

        tr2, n_sem = jax.lax.cond(
            jnp.any(frame.obj3d >= 0), do_sem,
            lambda tr_in: (tr_in, jnp.int32(0)), tr2)

    ok = (tr2.n_inliers >= 30) | ((tr2.n_inliers >= 10) & (frame_id < 5))

    # --- object landmark create/update + map regularization
    # (Tracking.cc:1079-1209, :542) — a pure MapState transform, gated on
    # a good pose exactly like the reference's bOK gate (Tracking.cc:537);
    # with zero detections every sub-stage is a no-op (no creates, no
    # votes, no ring writes), so the whole stage skips at trace level
    obj3d_out = frame.obj3d
    if obj_hooks is not None:
        frame_upd = frame._replace(Tcw=tr2.Tcw, kp_pt=tr2.kp_pt)

        def do_upd(m_in):
            return update_fn(m_in, frame_upd)

        m, obj3d_out = jax.lax.cond(
            ok & has_dets, do_upd, lambda m_in: (m_in, frame.obj3d), m)

    # --- stage E: keyframe decision (NeedNewKeyFrame, Tracking.cc:1242)
    close = frame.valid & (frame.depth > 0) & (frame.depth < close_depth)
    tracked = tr2.kp_pt >= 0
    n_close_trk = jnp.sum((close & tracked).astype(jnp.int32))
    n_close_untrk = jnp.sum((close & ~tracked).astype(jnp.int32))
    P = m.pt_xyz.shape[0]
    ref_pt = m.kf_kp_pt[last_kf_id]
    min_obs = jnp.where(m.n_kf > 2, 3, 1)
    ref_matches = jnp.sum(((ref_pt >= 0)
                           & (m.pt_n_obs[jnp.clip(ref_pt, 0, P - 1)]
                              >= min_obs)
                           & m.pt_valid[jnp.clip(ref_pt, 0, P - 1)])
                          .astype(jnp.int32))
    # single source of truth shared with the host path (kf_decision; the
    # decay trigger rationale lives in its docstring). The min-gap gate
    # CANNOT be applied here: frames_since_kf is the value at DISPATCH
    # time, one frame stale in the pipelined mode — a KF inserted while
    # this program was in flight is invisible, which is precisely the
    # duplicate-insertion artifact the gate exists to stop. So pack TWO
    # flags: the full decision (soft) and the decision with the
    # close-budget/decay triggers suppressed (hard); the host resolver
    # applies `hard | (soft & since >= min_gap)` with its CURRENT
    # frames_since_kf (slam/system._resolve_one).
    need_kf = ok & kf_decision(
        tr2.n_inliers, ref_matches, n_close_trk, n_close_untrk,
        frames_since_kf, max_frames_between_kf,
        sensor_is_mono=False, last_kf_inliers=last_kf_inliers,
        min_gap=0)
    need_kf_hard = ok & kf_decision(
        tr2.n_inliers, ref_matches, n_close_trk, n_close_untrk,
        frames_since_kf, max_frames_between_kf,
        sensor_is_mono=False, last_kf_inliers=last_kf_inliers,
        min_gap=10 ** 9)

    vel = tr2.Tcw @ se3.inverse(last.Tcw)
    Tcr = tr2.Tcw @ se3.inverse(m.kf_pose[jnp.clip(last_kf_id, 0,
                                                   m.kf_pose.shape[0] - 1)])
    packed = jnp.concatenate([
        tr2.Tcw.reshape(-1), vel.reshape(-1), Tcr.reshape(-1),
        jnp.stack([ok.astype(jnp.float32), need_kf.astype(jnp.float32),
                   tr2.n_inliers.astype(jnp.float32),
                   tr2.n_matches.astype(jnp.float32),
                   ref_kf.astype(jnp.float32),
                   n_close_trk.astype(jnp.float32),
                   n_close_untrk.astype(jnp.float32),
                   tr_motion_inl.astype(jnp.float32),
                   n_sem.astype(jnp.float32),
                   need_kf_hard.astype(jnp.float32)])])
    return m, tr2, obj3d_out, packed, vel, ok


# ---------------------------------------------------------------------------
# Keyframe policy
# ---------------------------------------------------------------------------

def kf_decision(n_inliers, n_ref_matches, n_close_tracked,
                n_close_untracked, frames_since_kf,
                max_frames: int, sensor_is_mono: bool = False,
                last_kf_inliers=0, min_gap: int = 0):
    """NeedNewKeyFrame (Tracking.cc:1242-1326), reduced to its decision
    variables: tracked-vs-reference ratio, close-point budget, frame gap,
    the c1c collapse trigger (:1296), plus the decay trigger vs the inlier
    count at the LAST insertion (see track_frame_fused for the rationale).

    The SINGLE source of truth for the keyframe policy: the fused device
    program traces it with jnp scalars, the host path calls it with ints
    (need_new_keyframe) — round 2 carried two diverging copies (VERDICT
    item 6). Polymorphic: & | on bools works for both worlds.

    min_gap — deviation from the reference, 0 (= parity) by default.
    The pipelined fused program dispatches frame t+1 BEFORE frame t's
    keyframe decision resolves on the host, so a new KF's spawned close
    points are invisible to the very next frame's tracking: its
    n_close_tracked measures the PRE-keyframe map, re-fires the close
    budget, and inserts a near-duplicate KF (measured on the KITTI
    drive: every close-budget KF at frame t was followed by another at
    t+1 with close_trk ~50, recovering to >100 at t+2 once the spawned
    points reached a dispatch; 42 KFs in 80 frames). The reference has
    no such lag — its tracker matches against new points on the very
    next frame (Tracking.cc:1352-1396 fills mvpMapPoints immediately and
    LocalMapping runs concurrently). Gating the close-budget and decay
    triggers on frames_since_kf >= min_gap (= the pipeline depth + 1)
    suppresses only those lag-artifact duplicates; the collapse trigger
    (inl < 0.25*ref) and the max-gap trigger stay ungated as emergency
    paths.
    """
    gap_ok = frames_since_kf >= min_gap
    need_close = (n_close_tracked < 100) & (n_close_untracked > 70) & gap_ok
    ratio = 0.9 if sensor_is_mono else 0.75
    weak = n_inliers < n_ref_matches * ratio
    decayed = (n_inliers < 0.6 * last_kf_inliers) & gap_ok
    c1a = frames_since_kf >= max_frames
    # c1b (mapper idle) is implicitly true: mapping is synchronous or
    # merged by the next keyframe decision. c1c: tracking is collapsing
    # relative to the reference KF — insert NOW (Tracking.cc:1296)
    if sensor_is_mono:
        c1c = need_close & False
    else:
        c1c = (n_inliers < n_ref_matches * 0.25) | need_close
    c2 = weak | need_close | decayed
    ok_inliers = n_inliers > 15
    return ok_inliers & (c1a | c1c | c2)


def need_new_keyframe(n_inliers, n_ref_matches, n_close_tracked,
                      n_close_untracked, frames_since_kf,
                      max_frames: int, sensor_is_mono: bool = False,
                      last_kf_inliers: int = 0, min_gap: int = 0):
    """Host-side wrapper of kf_decision (all args ints, returns bool)."""
    return bool(kf_decision(n_inliers, n_ref_matches, n_close_tracked,
                            n_close_untracked, frames_since_kf, max_frames,
                            sensor_is_mono, last_kf_inliers, min_gap))
