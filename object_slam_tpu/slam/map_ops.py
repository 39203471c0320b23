"""Pure-functional map mutations: keyframe insertion, point spawning,
culling, triangulation, fusion.

Parity targets:
  * `Tracking::StereoInitialization` (`Tracking.cc:590-650`): first KF +
    points for every kp with depth.
  * `Tracking::CreateNewKeyFrame` (`Tracking.cc:1328-1400`): KF insert +
    close-point spawning.
  * `LocalMapping::MapPointCulling` (`LocalMapping.cc:171-206`).
  * `LocalMapping::CreateNewMapPoints` (`LocalMapping.cc:208-453`):
    epipolar triangulation against covisible KFs.
  * `ORBmatcher::Fuse` + `LocalMapping::SearchInNeighbors`
    (`LocalMapping.cc:455-554`): duplicate merging.
  * `KeyFrame::UpdateConnections` spanning-tree parent
    (`KeyFrame.cc:289-416`).

All functions are MapState -> MapState pytree transforms with static
shapes; "allocation" is cursor + masked scatter (compacted with cumsum).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from object_slam_tpu.geometry import se3, camera as cam_mod, triangulation as tri_mod
from object_slam_tpu.features import matching
from object_slam_tpu.slam.frame import FrameData
from object_slam_tpu.slam.map_state import MapState, covisibility, camera_centers


def _alloc_indices(valid_mask, create_mask, capacity):
    """FREE-SLOT allocation: the k-th created row takes the k-th INVALID
    slab row. The round-1..3 monotone cursor never recycled culled
    points, so a KITTI-scale drive exhausted the 65536-row slab after
    ~140 keyframes and spawning silently stopped — tracking then starved
    within ten frames (the mid-sequence collapse of every r3/r4 KITTI
    run). Callers must clear stale slab references (kf_kp_pt rows of
    dead points) BEFORE slots recycle — cull_points and run_local_ba do.

    Returns (idx [N], ok [N], n_valid_after [])."""
    free = ~valid_mask
    fpos = jnp.cumsum(free.astype(jnp.int32)) - 1
    free_idx = jnp.full((capacity + 1,), capacity - 1, jnp.int32).at[
        jnp.where(free, fpos, capacity)].set(
        jnp.arange(capacity, dtype=jnp.int32), mode='drop')[:capacity]
    n_free = jnp.sum(free.astype(jnp.int32))
    cpos = jnp.cumsum(create_mask.astype(jnp.int32)) - 1
    ok = create_mask & (cpos < n_free)
    idx = free_idx[jnp.clip(cpos, 0, capacity - 1)]
    idx = jnp.where(ok, idx, capacity - 1)
    n_valid = jnp.sum(valid_mask.astype(jnp.int32)) \
        + jnp.sum(ok.astype(jnp.int32))
    return idx, ok, n_valid


def spawn_points(K, m: MapState, frame: FrameData, kf_id, Tcw,
                 create_mask, scale_factors):
    """Create map points from frame keypoints with valid depth.

    create_mask [N]: which keypoints spawn a point. Returns (m, kp_pt [N])
    with the new point ids merged into frame.kp_pt.
    """
    P = m.pt_xyz.shape[0]
    idx, ok, n_pt = _alloc_indices(m.pt_valid, create_mask, P)

    Twc = se3.inverse(Tcw)
    pc = cam_mod.backproject(K, frame.uv, jnp.maximum(frame.depth, 1e-6))
    pw = se3.apply(Twc, pc[None])[0]

    cam_c = Twc[:3, 3]
    view = pw - cam_c
    dist = jnp.linalg.norm(view, axis=-1)
    normal = view / jnp.maximum(dist[:, None], 1e-9)
    lvl_scale = scale_factors[jnp.clip(frame.level, 0, scale_factors.shape[0] - 1)]
    max_dist = dist * lvl_scale
    min_dist = max_dist / scale_factors[-1]

    def scat(arr, vals):
        return arr.at[idx].set(jnp.where(ok.reshape((-1,) + (1,) * (vals.ndim - 1)),
                                         vals, arr[idx]))

    m = m._replace(
        pt_xyz=scat(m.pt_xyz, pw),
        pt_desc=scat(m.pt_desc, frame.desc),
        pt_normal=scat(m.pt_normal, normal),
        pt_min_dist=scat(m.pt_min_dist, min_dist),
        pt_max_dist=scat(m.pt_max_dist, max_dist),
        pt_valid=m.pt_valid.at[idx].set(
            jnp.where(ok, True, m.pt_valid[idx])),
        pt_first_kf=scat(m.pt_first_kf, jnp.full_like(idx, kf_id)),
        pt_ref_kf=scat(m.pt_ref_kf, jnp.full_like(idx, kf_id)),
        pt_visible=scat(m.pt_visible, jnp.ones_like(idx)),
        pt_found=scat(m.pt_found, jnp.ones_like(idx)),
        n_pt=n_pt)
    kp_pt = jnp.where(ok, idx, frame.kp_pt)
    return m, kp_pt


def insert_keyframe(K, m: MapState, frame: FrameData, Tcw,
                    scale_factors, spawn_close_mask, frame_id=-1):
    """Write the KF row, record observations, spawn close points.

    spawn_close_mask [N]: keypoints that should create new points (close
    depth, not already matched — Tracking.cc:1352-1396).
    frame_id: the source frame's sequence index (KeyFrame::mnFrameId) —
    recorded in kf_frame_id for creation-order tooling (map viewer replay).
    Returns (m, kf_id).
    """
    K_cap = m.kf_pose.shape[0]
    kf_id = jnp.minimum(m.n_kf, K_cap - 1)

    m, kp_pt = spawn_points(K, m, frame, kf_id, Tcw, spawn_close_mask,
                            scale_factors)

    # observation bookkeeping for matched points
    P = m.pt_xyz.shape[0]
    obs_ok = (kp_pt >= 0) & frame.valid
    ptc = jnp.clip(kp_pt, 0, P - 1)
    m = m._replace(
        pt_n_obs=m.pt_n_obs.at[ptc].add(obs_ok.astype(jnp.int32)),
        kf_pose=m.kf_pose.at[kf_id].set(Tcw),
        kf_valid=m.kf_valid.at[kf_id].set(True),
        kf_timestamp=m.kf_timestamp.at[kf_id].set(frame.timestamp),
        kf_kp_uv=m.kf_kp_uv.at[kf_id].set(frame.uv),
        kf_kp_ur=m.kf_kp_ur.at[kf_id].set(frame.ur),
        kf_kp_depth=m.kf_kp_depth.at[kf_id].set(frame.depth),
        kf_kp_level=m.kf_kp_level.at[kf_id].set(frame.level),
        kf_kp_angle=m.kf_kp_angle.at[kf_id].set(frame.angle),
        kf_kp_desc=m.kf_kp_desc.at[kf_id].set(frame.desc),
        kf_kp_valid=m.kf_kp_valid.at[kf_id].set(frame.valid),
        kf_kp_pt=m.kf_kp_pt.at[kf_id].set(jnp.where(obs_ok, kp_pt, -1)),
        kf_frame_id=m.kf_frame_id.at[kf_id].set(
            jnp.asarray(frame_id, jnp.int32)),
        n_kf=jnp.minimum(m.n_kf + 1, K_cap))

    # spanning-tree parent: strongest covisible earlier KF
    W = covisibility(m)[kf_id]
    earlier = jnp.arange(K_cap) < kf_id
    Wv = jnp.where(earlier & m.kf_valid, W, -1)
    parent = jnp.where(kf_id > 0, jnp.argmax(Wv), -1)
    m = m._replace(kf_parent=m.kf_parent.at[kf_id].set(parent))
    return m, kf_id


def cull_points(m: MapState, current_kf_id, min_found_ratio: float = 0.25,
                recency_scope: bool = True):
    """MapPointCulling (LocalMapping.cc:171-206): drop points with
    found/visible < 0.25, or points older than 2 KFs with < 3 observations."""
    ratio = m.pt_found.astype(jnp.float32) / jnp.maximum(
        m.pt_visible.astype(jnp.float32), 1.0)
    age = current_kf_id - m.pt_first_kf
    # BOTH tests apply only while the point is recent: the reference keeps
    # candidates in mlpRecentAddedMapPoints for their first ~3 keyframes
    # and removes them from scrutiny afterwards (LocalMapping.cc:171-206).
    # Testing established points forever executes sporadically-matched but
    # good landmarks and thins the map into tracking attrition
    # (A/B-measured on the 200-frame loop circuit — PARITY.md; the
    # always-scoped variant remains as recency_scope=False).
    recent = (age < 3) if recency_scope else jnp.bool_(True)
    bad = recent & ((ratio < min_found_ratio) |
                    ((age >= 2) & (m.pt_n_obs < 3)))
    keep = m.pt_valid & ~bad
    # erase every observation of a dead point: its slab row RECYCLES to
    # a future spawn (_alloc_indices), and a stale kf_kp_pt entry would
    # silently re-bind that keypoint to the new point
    P = m.pt_xyz.shape[0]
    kf_kp_pt = jnp.where(
        (m.kf_kp_pt >= 0) & keep[jnp.clip(m.kf_kp_pt, 0, P - 1)],
        m.kf_kp_pt, -1)
    return m._replace(pt_valid=keep, kf_kp_pt=kf_kp_pt,
                      pt_obj=jnp.where(keep, m.pt_obj, -1))


def triangulate_new_points(m: MapState, kf_id, n_neighbors: int,
                           K, inv_sigma2_lvl, scale_factors,
                           chi2_gate: float = 5.991, W_row=None):
    """CreateNewMapPoints (LocalMapping.cc:208-453): for the top covisible
    neighbors, epipolar-match unmatched keypoints and triangulate.

    n_neighbors is static. W_row: optional precomputed covisibility row
    for kf_id (the [K,P]x[P,K] covisibility product is ~26 ms at KITTI
    caps and the mapping pass consumes it four times — compute once in
    process_new_keyframe). Returns updated map.
    """
    Kcap, N = m.kf_kp_pt.shape
    W = covisibility(m)[kf_id] if W_row is None else W_row
    W = jnp.where(m.kf_valid & (jnp.arange(Kcap) != kf_id), W, -1)
    _, nbrs = jax.lax.top_k(W, n_neighbors)
    nbr_ok_all = W[nbrs] > 0

    T1 = m.kf_pose[kf_id]
    uv1 = m.kf_kp_uv[kf_id]
    desc1 = m.kf_kp_desc[kf_id]
    free1 = m.kf_kp_valid[kf_id] & (m.kf_kp_pt[kf_id] < 0)

    def body(i, m_acc):
        nb = nbrs[i]
        nbr_ok = nbr_ok_all[i]
        T2 = m_acc.kf_pose[nb]  # noqa — body traced once under fori_loop
        uv2 = m_acc.kf_kp_uv[nb]
        desc2 = m_acc.kf_kp_desc[nb]
        free2 = m_acc.kf_kp_valid[nb] & (m_acc.kf_kp_pt[nb] < 0)

        # F12 from relative pose: F = K^-T [t]x R K^-1
        T12 = T1 @ se3.inverse(T2)          # frame2 -> frame1
        R12 = T12[:3, :3]
        t12 = T12[:3, 3]
        Km = jnp.array([[K.fx, 0, K.cx], [0, K.fy, K.cy], [0, 0, 1.0]])
        Kinv = jnp.linalg.inv(Km)
        E = se3.hat(t12) @ R12
        F21 = Kinv.T @ E @ Kinv             # maps img2 pts to img1 lines
        F12 = F21.T                          # img1 pts -> img2 lines
        # epipole of camera1 center in image 2
        c1 = se3.inverse(T1)[:3, 3]
        c1_in2 = T2[:3, :3] @ c1 + T2[:3, 3]
        ex2 = cam_mod.project(K, c1_in2[None])[0]

        inv_s2 = inv_sigma2_lvl[jnp.clip(m_acc.kf_kp_level[nb], 0,
                                         inv_sigma2_lvl.shape[0] - 1)]
        midx, mok = matching.search_for_triangulation(
            desc1, uv1, free1, desc2, uv2, free2, F12, ex2, inv_s2,
            angle1=m_acc.kf_kp_angle[kf_id], angle2=m_acc.kf_kp_angle[nb])
        mok = mok & nbr_ok

        # --- point position: parallax-gated DLT vs stereo unprojection
        # (LocalMapping.cc:288-380). Unconditional DLT was the round-1/2
        # map-corruption driver: at keyframe baselines of a few cm, ray
        # triangulation of far points carries 10x the error of the
        # measured RGB-D/stereo depth; those points bias every later pose
        # solve and the bias compounds through spawning.
        mi = jnp.clip(midx, 0, N - 1)
        uv2m = uv2[mi]
        ur1 = m_acc.kf_kp_ur[kf_id]
        ur2m = m_acc.kf_kp_ur[nb][mi]
        z1 = jnp.where(ur1 >= 0,
                       K.bf / jnp.maximum(uv1[:, 0] - ur1, 1e-6), -1.0)
        z2 = jnp.where(ur2m >= 0,
                       K.bf / jnp.maximum(uv2m[:, 0] - ur2m, 1e-6), -1.0)
        baseline = K.bf / K.fx

        # ray parallax between the two bearing vectors (world frame)
        def bearing(T, uv):
            xn = jnp.stack([(uv[:, 0] - K.cx) / K.fx,
                            (uv[:, 1] - K.cy) / K.fy,
                            jnp.ones(uv.shape[0])], -1)
            r = xn @ T[:3, :3]          # R^T xn
            return r / jnp.maximum(jnp.linalg.norm(r, axis=-1,
                                                   keepdims=True), 1e-9)

        cos_rays = jnp.sum(bearing(T1, uv1) * bearing(T2, uv2m), -1)
        cos_st1 = jnp.where(z1 > 0,
                            jnp.cos(2.0 * jnp.arctan2(baseline / 2.0,
                                                      jnp.maximum(z1, 1e-6))),
                            2.0)
        cos_st2 = jnp.where(z2 > 0,
                            jnp.cos(2.0 * jnp.arctan2(baseline / 2.0,
                                                      jnp.maximum(z2, 1e-6))),
                            2.0)
        cos_st = jnp.minimum(cos_st1, cos_st2)
        any_st = (z1 > 0) | (z2 > 0)
        tri_sel = (cos_rays < cos_st) & (cos_rays > 0) \
            & (any_st | (cos_rays < 0.9998))

        def to_xn(uv):
            return jnp.stack([(uv[:, 0] - K.cx) / K.fx,
                              (uv[:, 1] - K.cy) / K.fy], -1)

        pw_tri = tri_mod.triangulate_dlt(T1[:3, :4], T2[:3, :4],
                                         to_xn(uv1), to_xn(uv2m))
        T1i = se3.inverse(T1)
        T2i = se3.inverse(T2)
        pw_s1 = se3.apply(T1i, cam_mod.backproject(
            K, uv1, jnp.maximum(z1, 1e-6))[None])[0]
        pw_s2 = se3.apply(T2i, cam_mod.backproject(
            K, uv2m, jnp.maximum(z2, 1e-6))[None])[0]
        use_s1 = ~tri_sel & (z1 > 0) & (cos_st1 <= cos_st2)
        use_s2 = ~tri_sel & ~use_s1 & (z2 > 0)
        pw = jnp.where(tri_sel[:, None], pw_tri,
                       jnp.where(use_s1[:, None], pw_s1, pw_s2))
        has_src = tri_sel | use_s1 | use_s2

        # --- acceptance gates (LocalMapping.cc:382-446): cheirality +
        # per-level chi2 reprojection in BOTH views (stereo residual where
        # available) + scale-consistency ratio
        def reproj_chi2_fn(T, uv, ur, pw_, lvl_inv_s2):
            pc = se3.apply(T, pw_[None])[0]
            z = pc[:, 2]
            u = K.fx * pc[:, 0] / jnp.maximum(z, 1e-6) + K.cx
            v = K.fy * pc[:, 1] / jnp.maximum(z, 1e-6) + K.cy
            urp = u - K.bf / jnp.maximum(z, 1e-6)
            e2 = (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2
            e2s = e2 + jnp.where(ur >= 0, (urp - ur) ** 2, 0.0)
            gate = jnp.where(ur >= 0, 7.815, 5.991)
            return (z > 0) & (e2s * lvl_inv_s2 < gate), z

        lvl1 = jnp.clip(m_acc.kf_kp_level[kf_id], 0,
                        inv_sigma2_lvl.shape[0] - 1)
        lvl2 = jnp.clip(m_acc.kf_kp_level[nb][mi], 0,
                        inv_sigma2_lvl.shape[0] - 1)
        ok1, z1c = reproj_chi2_fn(T1, uv1, ur1, pw, inv_sigma2_lvl[lvl1])
        ok2, z2c = reproj_chi2_fn(T2, uv2m, ur2m, pw, inv_sigma2_lvl[lvl2])

        d1 = jnp.linalg.norm(pw - T1i[:3, 3], axis=-1)
        d2 = jnp.linalg.norm(pw - T2i[:3, 3], axis=-1)
        ratio_dist = d2 / jnp.maximum(d1, 1e-9)
        ratio_oct = scale_factors[lvl1] / scale_factors[lvl2]
        ratio_factor = 1.5 * scale_factors[1] / scale_factors[0]
        scale_ok = (ratio_dist * ratio_factor > ratio_oct) \
            & (ratio_dist < ratio_oct * ratio_factor)

        # measured-depth consistency: when either view carries an RGB-D /
        # stereo depth, the created point must agree with it — a DLT of an
        # aliased epipolar pair is self-consistent in reprojection but
        # contradicts the physical depth measurement
        zc1 = se3.apply(T1, pw[None])[0][:, 2]
        zc2 = se3.apply(T2, pw[None])[0][:, 2]
        depth_ok = jnp.where(z1 > 0, jnp.abs(zc1 - z1) < 0.15 * z1, True) \
            & jnp.where(z2 > 0, jnp.abs(zc2 - z2) < 0.15 * z2, True)

        create = mok & has_src & ok1 & ok2 & scale_ok & depth_ok \
            & jnp.all(jnp.isfinite(pw), axis=-1)

        # spawn into point slab
        P = m_acc.pt_xyz.shape[0]
        idx, ok, n_pt = _alloc_indices(m_acc.pt_valid, create, P)
        cam_c = se3.inverse(T1)[:3, 3]
        view = pw - cam_c
        dist = jnp.linalg.norm(view, axis=-1)
        normal = view / jnp.maximum(dist[:, None], 1e-9)
        lvl = jnp.clip(m_acc.kf_kp_level[kf_id], 0, scale_factors.shape[0] - 1)
        max_dist = dist * scale_factors[lvl]
        min_dist = max_dist / scale_factors[-1]

        def scat(arr, vals):
            return arr.at[idx].set(
                jnp.where(ok.reshape((-1,) + (1,) * (vals.ndim - 1)),
                          vals, arr[idx]))

        m_acc = m_acc._replace(
            pt_xyz=scat(m_acc.pt_xyz, pw),
            pt_desc=scat(m_acc.pt_desc, desc1),
            pt_normal=scat(m_acc.pt_normal, normal),
            pt_min_dist=scat(m_acc.pt_min_dist, min_dist),
            pt_max_dist=scat(m_acc.pt_max_dist, max_dist),
            pt_valid=m_acc.pt_valid.at[idx].set(
                jnp.where(ok, True, m_acc.pt_valid[idx])),
            pt_first_kf=scat(m_acc.pt_first_kf, jnp.full_like(idx, kf_id)),
            pt_ref_kf=scat(m_acc.pt_ref_kf, jnp.full_like(idx, kf_id)),
            pt_n_obs=m_acc.pt_n_obs.at[idx].add(jnp.where(ok, 2, 0)),
            n_pt=n_pt)

        # record observations in both KFs
        new_pt = jnp.where(ok, idx, -1)
        kp_pt_1 = m_acc.kf_kp_pt[kf_id]
        m_acc = m_acc._replace(
            kf_kp_pt=m_acc.kf_kp_pt
            .at[kf_id].set(jnp.where(ok, new_pt, kp_pt_1)))
        # neighbor: scatter by matched index
        row = m_acc.kf_kp_pt[nb]
        mi = jnp.clip(midx, 0, N - 1)
        row = row.at[mi].set(jnp.where(ok, new_pt, row[mi]))
        m_acc = m_acc._replace(kf_kp_pt=m_acc.kf_kp_pt.at[nb].set(row))
        return m_acc

    # fori_loop: one traced body instead of n_neighbors copies — cuts the
    # mapping program's compile time ~n_neighbors-fold
    return jax.lax.fori_loop(0, n_neighbors, body, m)


def cull_keyframes(m: MapState, kf_id, n_check: int = 10,
                   redundancy: float = 0.9, min_obs: int = 3,
                   scale_condition: bool = False, n_levels: int = 8,
                   W_row=None):
    """KeyFrameCulling (LocalMapping.cc:633-697): a covisible keyframe is
    redundant if >= 90% of its tracked points are observed by at least 3
    other keyframes. With scale_condition=True the reference's rule is
    reproduced exactly: an observer only counts if it sees the point at
    the same or finer pyramid scale (scaleLevel <= scaleLevel_i + 1,
    LocalMapping.cc:672-683); the default drops that condition —
    scale-free counting is strictly more aggressive culling (A/B-measured
    on the 200-frame loop circuit, PARITY.md).

    Culled KFs keep their slab row (kf_valid=False); their observations
    are released and spanning-tree children re-parent to the culled KF's
    parent (the reference's tree repair, KeyFrame.cc:453-545 simplified
    to parent hoisting).
    """
    Kcap, N = m.kf_kp_pt.shape
    P = m.pt_xyz.shape[0]
    Wk = covisibility(m)[kf_id] if W_row is None else W_row
    Wrow = jnp.where(m.kf_valid & (jnp.arange(Kcap) != kf_id), Wk, -1)
    _, cands = jax.lax.top_k(Wrow, n_check)
    cand_ok = (Wrow[cands] > 0) & (cands != 0)      # never cull KF0

    # per-point observer counts
    A = incidence_bool(m)                           # [K, P]
    obs_count = jnp.sum(A, axis=0)                  # [P]
    if scale_condition:
        # cnt_le[p, L] = observers of p at pyramid level <= L, via a
        # per-(point, level) histogram + cumsum — the dense analogue of
        # the reference's per-observation scaleLevel comparison
        obs_ok = (m.kf_kp_pt >= 0) & m.kf_kp_valid & m.kf_valid[:, None]
        ptc_all = jnp.clip(m.kf_kp_pt, 0, P - 1)
        lvl_all = jnp.clip(m.kf_kp_level, 0, n_levels - 1)
        idx = (ptc_all * n_levels + lvl_all).reshape(-1)
        cnt = jax.ops.segment_sum(
            obs_ok.reshape(-1).astype(jnp.int32), idx,
            num_segments=P * n_levels).reshape(P, n_levels)
        cnt_le = jnp.cumsum(cnt, axis=1)            # [P, n_levels]

    def redundant(k):
        kp_pt = m.kf_kp_pt[k]
        tracked = (kp_pt >= 0) & m.kf_kp_valid[k]
        ptc = jnp.clip(kp_pt, 0, P - 1)
        tracked = tracked & m.pt_valid[ptc]
        if scale_condition:
            thr = jnp.clip(m.kf_kp_level[k] + 1, 0, n_levels - 1)
            # own observation is at level <= own+1, so subtract it
            others = cnt_le[ptc, thr] - 1
        else:
            others = obs_count[ptc] - 1             # excluding this KF
        red = tracked & (others >= min_obs)
        n_tr = jnp.sum(tracked.astype(jnp.int32))
        n_red = jnp.sum(red.astype(jnp.int32))
        return (n_tr > 10) & (n_red >= redundancy * n_tr)

    is_red = jax.vmap(redundant)(cands) & cand_ok
    # cull up to max_cull per call (the reference loops over every
    # candidate; round 3 capped at one victim per pass, which cannot keep
    # up with the KITTI insertion cadence — ~0.5 KF/frame before culling)

    def cull_one(i, carry):
        m_acc, n_culled = carry
        victim = cands[i]
        # the candidates were scored against the pre-cull observation
        # structure; a stale positive could cull a KF that a previous
        # victim just made load-bearing — cap the victims per pass
        do = is_red[i] & m_acc.kf_valid[jnp.clip(victim, 0, Kcap - 1)] \
            & (n_culled < 3)
        n_culled = n_culled + do.astype(jnp.int32)
        vc = jnp.clip(victim, 0, Kcap - 1)
        kf_valid = m_acc.kf_valid.at[vc].set(
            jnp.where(do, False, m_acc.kf_valid[vc]))
        kf_kp_pt = m_acc.kf_kp_pt.at[vc].set(
            jnp.where(do, jnp.full((N,), -1, jnp.int32), m_acc.kf_kp_pt[vc]))
        # re-parent children of the victim
        parent_of_victim = m_acc.kf_parent[vc]
        kf_parent = jnp.where(do & (m_acc.kf_parent == victim),
                              parent_of_victim, m_acc.kf_parent)
        # freeze the victim's pose relative to its parent (KeyFrame::mTcp,
        # SetBadFlag) so trajectory recomposition can hop over the culled
        # KF even after BA / loop corrections move the parent
        pv = jnp.clip(parent_of_victim, 0, Kcap - 1)
        tcp = m_acc.kf_pose[vc] @ se3.inverse(m_acc.kf_pose[pv])
        kf_tcp = m_acc.kf_tcp.at[vc].set(
            jnp.where(do & (parent_of_victim >= 0), tcp, m_acc.kf_tcp[vc]))
        return m_acc._replace(kf_valid=kf_valid, kf_kp_pt=kf_kp_pt,
                              kf_parent=kf_parent, kf_tcp=kf_tcp), n_culled

    m, _ = jax.lax.fori_loop(0, n_check, cull_one, (m, jnp.int32(0)))
    return m


def incidence_bool(m: MapState):
    """[K, P] bool incidence (scatter form, no MXU)."""
    Kcap, N = m.kf_kp_pt.shape
    P = m.pt_xyz.shape[0]
    A = jnp.zeros((Kcap, P), bool)
    kk = jnp.arange(Kcap)[:, None]
    return A.at[kk, jnp.clip(m.kf_kp_pt, 0, P - 1)].max(
        (m.kf_kp_pt >= 0) & m.kf_kp_valid & m.kf_valid[:, None])


def apply_replacements(m: MapState, fwd, replaced):
    """Point replacement with explicit forwarding (MapPoint::Replace,
    MapPoint.cc): every keypoint observation of a replaced point is
    redirected to its winner via one dense gather over the [K, N]
    observation table; visible/found counters transfer to the winner and
    the loser row is invalidated.

    fwd [P] int32: winner id per point (fwd[p] == p when not replaced).
    replaced [P] bool: loser rows."""
    P = m.pt_xyz.shape[0]
    kp = m.kf_kp_pt
    new_kp = jnp.where(kp >= 0, fwd[jnp.clip(kp, 0, P - 1)], -1)
    add_vis = jnp.where(replaced, m.pt_visible, 0)
    add_fnd = jnp.where(replaced, m.pt_found, 0)
    add_obs = jnp.where(replaced, m.pt_n_obs, 0)
    return m._replace(
        kf_kp_pt=new_kp,
        pt_visible=m.pt_visible.at[fwd].add(add_vis),
        pt_found=m.pt_found.at[fwd].add(add_fnd),
        pt_n_obs=m.pt_n_obs.at[fwd].add(add_obs),
        pt_valid=m.pt_valid & ~replaced,
        pt_obj=jnp.where(replaced, -1, m.pt_obj))


def fuse_into_neighbors(m: MapState, kf_id, n_neighbors: int, K,
                        scale_factors, inv_sigma2_lvl, th_dist: int = 50,
                        W_row=None):
    """SearchInNeighbors/Fuse (LocalMapping.cc:455-554, ORBmatcher.cc:825):
    project the new KF's points into covisible neighbors; where a neighbor
    keypoint matches closely, bind it to the point if free, or replace the
    less-observed of the two points when the keypoint already observes a
    different one (ORBmatcher.cc:910-925's Replace arbitration)."""
    Kcap, N = m.kf_kp_pt.shape
    P = m.pt_xyz.shape[0]
    W = covisibility(m)[kf_id] if W_row is None else W_row
    W = jnp.where(m.kf_valid & (jnp.arange(Kcap) != kf_id), W, -1)
    _, nbrs = jax.lax.top_k(W, n_neighbors)

    def body(i, carry):
        # fwd_tot composes replacements across neighbor iterations; the
        # full [K, N] observation-table rewrite applies ONCE at the end
        # (profiled: per-iteration apply_replacements was ~75 ms of the
        # 113 ms fuse pass at KITTI caps — five 2M-row gathers for a
        # handful of replacements each)
        m_acc, fwd_tot = carry
        # the source KF's bindings, with forwarding from prior neighbor
        # iterations applied on READ (the reference's sequential Replace)
        src_pt0 = m_acc.kf_kp_pt[kf_id]
        src_pt = jnp.where(src_pt0 >= 0,
                           fwd_tot[jnp.clip(src_pt0, 0, P - 1)], -1)
        src_ok = (src_pt >= 0) & m_acc.pt_valid[jnp.clip(src_pt, 0, P - 1)]
        ptc = jnp.clip(src_pt, 0, P - 1)
        pw = m_acc.pt_xyz[ptc]
        pdesc = m_acc.pt_desc[ptc]
        nb = nbrs[i]
        nbr_ok = W[nbrs[i]] > 0
        T = m_acc.kf_pose[nb]
        pc = se3.apply(T, pw[None])[0]
        uv = cam_mod.project(K, pc)
        vis = (pc[:, 2] > 0) & cam_mod.in_image(K, uv) & src_ok & nbr_ok
        lvl = m_acc.kf_kp_level[kf_id]
        radius = 3.0 * scale_factors[jnp.clip(lvl, 0, scale_factors.shape[0] - 1)]
        midx, mok = matching.search_by_projection(
            uv, lvl, pdesc, vis,
            m_acc.kf_kp_uv[nb], m_acc.kf_kp_level[nb],
            m_acc.kf_kp_desc[nb], m_acc.kf_kp_valid[nb],
            radius_per_row=radius, th_dist=th_dist, nn_ratio=None)
        # bind: neighbor keypoint (unmatched) now observes the point
        row0 = m_acc.kf_kp_pt[nb]
        row = jnp.where(row0 >= 0, fwd_tot[jnp.clip(row0, 0, P - 1)], row0)
        mi = jnp.clip(midx, 0, N - 1)
        existing = row[mi]
        fresh = mok & (existing < 0)
        row = row.at[mi].set(jnp.where(fresh, src_pt, row[mi]))
        m_acc = m_acc._replace(
            kf_kp_pt=m_acc.kf_kp_pt.at[nb].set(row),
            pt_n_obs=m_acc.pt_n_obs.at[ptc].add(fresh.astype(jnp.int32)))

        # replace: keypoint already observes a different point — the one
        # with fewer observations forwards to the other
        dup = mok & (existing >= 0) & (existing != src_pt) \
            & m_acc.pt_valid[jnp.clip(existing, 0, P - 1)]
        ec = jnp.clip(existing, 0, P - 1)
        keep_existing = m_acc.pt_n_obs[ec] >= m_acc.pt_n_obs[ptc]
        winner = jnp.where(keep_existing, existing, src_pt)
        loser = jnp.where(keep_existing, src_pt, existing)
        lc = jnp.clip(loser, 0, P - 1)
        fwd = jnp.arange(P, dtype=jnp.int32)
        # last scatter wins on (rare) duplicate losers — consistent with the
        # reference's sequential Replace calls
        fwd = fwd.at[lc].set(jnp.where(dup, winner, fwd[lc]))
        # compose: any id already forwarding now follows one more hop
        fwd_tot = fwd[fwd_tot]
        return m_acc, fwd_tot

    m, fwd_tot = jax.lax.fori_loop(
        0, n_neighbors, body, (m, jnp.arange(P, dtype=jnp.int32)))
    replaced = (fwd_tot != jnp.arange(P)) & m.pt_valid
    # the [K, N] binding rewrite is a 2M-element random gather (~44 ms at
    # KITTI caps) — skip it entirely on passes with zero replacements
    return jax.lax.cond(
        jnp.any(replaced),
        lambda mm: apply_replacements(mm, fwd_tot, replaced),
        lambda mm: mm, m)
