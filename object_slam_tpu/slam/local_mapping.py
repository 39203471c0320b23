"""Back-end mapping: per-keyframe map refinement.

Parity with `LocalMapping::Run` (`LocalMapping.cc:48-113`): process new
keyframe -> cull points -> triangulate new points -> fuse duplicates ->
local BA -> (keyframe culling). The reference runs this on its own thread
with an interruptible-BA contract (`mbAbortBA`); here each step is a pure
MapState transform dispatched by the host — asynchrony is achieved by
running on a map snapshot and merging (System orchestrates), not by locks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from object_slam_tpu.geometry import se3
from object_slam_tpu.slam import map_ops
from object_slam_tpu.slam.map_state import (MapState, covisibility,
                                            recompute_point_stats)
from object_slam_tpu.solvers.ba import BAProblem, local_ba


def build_local_ba_problem(m: MapState, kf_id, window: int, n_fixed: int):
    """Gather the covisibility window around kf_id into a compact BA problem.

    Local (free) KFs: kf_id + its strongest covisible neighbors
    (Optimizer.cc:462-500). Fixed KFs: next-strongest observers
    (Optimizer.cc:540-553 takes all other observers; we cap at n_fixed).
    Observations: every (window KF, keypoint->point) pair.
    """
    Kcap, N = m.kf_kp_pt.shape
    P = m.pt_xyz.shape[0]
    window = min(window, Kcap)
    n_fixed = min(n_fixed, max(Kcap - window, 0))
    W = covisibility(m)[kf_id]
    W = jnp.where(m.kf_valid & (jnp.arange(Kcap) != kf_id), W, -1)
    _, nbrs = jax.lax.top_k(W, window - 1 + n_fixed)
    local_kfs = jnp.concatenate([kf_id[None], nbrs[:window - 1]])
    fixed_kfs = nbrs[window - 1:]
    kf_sel = jnp.concatenate([local_kfs, fixed_kfs])          # [Wtot]
    Wtot = kf_sel.shape[0]
    sel_ok = jnp.concatenate([
        jnp.ones(1, bool), W[nbrs[:window - 1]] > 0, W[fixed_kfs] > 0])

    fixed = jnp.concatenate([
        jnp.zeros(window, bool), jnp.ones(n_fixed, bool)])
    # always fix the globally-first valid KF if present (gauge)
    fixed = fixed | (kf_sel == 0)

    kp_pt = m.kf_kp_pt[kf_sel]                                # [Wtot, N]
    obs_valid = (kp_pt >= 0) & m.kf_kp_valid[kf_sel] & sel_ok[:, None]
    ptc = jnp.clip(kp_pt, 0, P - 1)
    obs_valid = obs_valid & m.pt_valid[ptc]

    # point set: observed by a FREE window KF (others are anchors)
    free_rows = (~fixed & sel_ok)[:, None] & obs_valid
    pt_local = jnp.zeros((P,), bool).at[ptc.reshape(-1)].max(
        free_rows.reshape(-1))
    obs_valid = obs_valid & pt_local[ptc]

    inv_sig = m.kf_kp_level[kf_sel]  # placeholder; caller multiplies
    prob = BAProblem(
        kf_pose=m.kf_pose[kf_sel],
        kf_fixed=fixed,
        kf_valid=sel_ok,
        pt_xyz=m.pt_xyz,
        pt_valid=pt_local & m.pt_valid,
        obs_kf=jnp.repeat(jnp.arange(Wtot), N),
        obs_pt=ptc.reshape(-1),
        obs_uv=m.kf_kp_uv[kf_sel].reshape(-1, 2),
        obs_ur=jnp.where(obs_valid, m.kf_kp_ur[kf_sel], -1.0).reshape(-1),
        obs_inv_sigma2=jnp.ones((Wtot * N,)),
        obs_valid=obs_valid.reshape(-1))
    return prob, kf_sel, sel_ok


def run_local_ba(K, m: MapState, kf_id, window: int, n_fixed: int,
                 inv_sigma2_lvl,
                 iters1: int = 5, iters2: int = 10) -> MapState:
    """LocalBundleAdjustment (Optimizer.cc:453-779) on the covisibility
    window; results scattered back into the map."""
    prob, kf_sel, sel_ok = build_local_ba_problem(m, kf_id, window, n_fixed)
    lvl = m.kf_kp_level[kf_sel].reshape(-1)
    prob = prob._replace(obs_inv_sigma2=inv_sigma2_lvl[
        jnp.clip(lvl, 0, inv_sigma2_lvl.shape[0] - 1)])
    kf_pose, pt_xyz, keep = local_ba(K, prob, iters1, iters2)

    # scatter poses back (only valid selections, never fixed rows changed)
    m = m._replace(
        kf_pose=m.kf_pose.at[kf_sel].set(
            jnp.where(sel_ok[:, None, None], kf_pose, m.kf_pose[kf_sel])),
        pt_xyz=pt_xyz)

    # prune observations the BA rejected (Optimizer.cc:741-760)
    Wtot, N = kf_sel.shape[0], m.kf_kp_pt.shape[1]
    P = m.pt_xyz.shape[0]
    pruned = prob.obs_valid & ~keep
    kp_pt_sel = m.kf_kp_pt[kf_sel]
    kp_pt_sel = jnp.where(pruned.reshape(Wtot, N), -1, kp_pt_sel)
    m = m._replace(kf_kp_pt=m.kf_kp_pt.at[kf_sel].set(kp_pt_sel))
    # a point whose observations fall below 2 is DEAD — the reference
    # erases it via MapPoint::EraseObservation -> SetBadFlag (nObs < 2).
    # Leaving it valid keeps a stale (often BA-orphaned, unconstrained)
    # position matchable by tracking; measured on live maps as 100+ m
    # garbage points matched at 95% rates right after a local BA.
    n_pruned = jax.ops.segment_sum(
        pruned.astype(jnp.int32), jnp.clip(prob.obs_pt, 0, P - 1),
        num_segments=P)
    pt_n_obs = jnp.maximum(m.pt_n_obs - n_pruned, 0)
    # only points the BA actually rejected from die here — fresh
    # single-observation spawns (n_obs=1 by construction) are candidates
    # under MapPointCulling's recency window, not this rule
    died = (n_pruned > 0) & (pt_n_obs < 2)
    m = m._replace(
        pt_n_obs=pt_n_obs,
        pt_valid=m.pt_valid & ~died,
        pt_obj=jnp.where(died, -1, m.pt_obj))
    return m


def process_new_keyframe(K, m: MapState, kf_id, scale_factors,
                         inv_sigma2_lvl, cfg) -> MapState:
    """The LocalMapping pipeline for one keyframe."""
    m = map_ops.cull_points(m, kf_id,
                            recency_scope=cfg.mapping.cull_recency_scope)
    m = map_ops.triangulate_new_points(
        m, kf_id, n_neighbors=5, K=K,
        inv_sigma2_lvl=inv_sigma2_lvl, scale_factors=scale_factors)
    m = map_ops.fuse_into_neighbors(
        m, kf_id, n_neighbors=5, K=K,
        scale_factors=scale_factors, inv_sigma2_lvl=inv_sigma2_lvl)
    # distinctive-descriptor re-election + normal refresh after fusion
    # (LocalMapping::SearchInNeighbors tail, LocalMapping.cc:540-552)
    if cfg.mapping.reelect_descriptors:
        m = recompute_point_stats(m)
    m = run_local_ba(m=m, K=K, kf_id=kf_id,
                     window=cfg.caps.local_window_kf, n_fixed=8,
                     inv_sigma2_lvl=inv_sigma2_lvl)
    m = map_ops.cull_keyframes(
        m, kf_id, scale_condition=cfg.mapping.kf_cull_scale_condition,
        n_levels=cfg.orb.n_levels)
    return m
