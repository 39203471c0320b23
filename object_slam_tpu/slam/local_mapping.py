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
from object_slam_tpu.slam.map_state import (
    MapState, covisibility, recompute_point_stats,
    recompute_point_stats_windowed)
from object_slam_tpu.solvers.ba import BAProblem, local_ba


def build_local_ba_problem(m: MapState, kf_id, window: int, n_fixed: int,
                           pt_cap: int = 0, W_row=None, obs_cap: int = 0):
    """Gather the covisibility window around kf_id into a compact BA problem.

    Local (free) KFs: kf_id + its strongest covisible neighbors
    (Optimizer.cc:462-500). Fixed KFs: next-strongest observers
    (Optimizer.cc:540-553 takes all other observers; we cap at n_fixed).
    Observations: every (window KF, keypoint->point) pair.

    pt_cap > 0 compacts the local point set into a [pt_cap] slab and
    builds a per-point observation-slot table — the two structures that
    turn every reduction inside ba_iterate into reshape/gather sums
    instead of scatters (scatter-form local BA measured 4.85 s per
    keyframe at KITTI caps, 95% of the whole mapping pass). Returns
    (prob, kf_sel, sel_ok, lidx, l_ok, pt_obs_slot); with pt_cap=0 the
    legacy full-slab problem (lidx=None).
    """
    Kcap, N = m.kf_kp_pt.shape
    P = m.pt_xyz.shape[0]
    window = min(window, Kcap)
    n_fixed = min(n_fixed, max(Kcap - window, 0))
    W = covisibility(m)[kf_id] if W_row is None else W_row
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

    # owner table [Wtot, P]: which keypoint of window-KF w observes point
    # p. Doubles as (a) the dedupe filter — a point bound to two keypoints
    # of one KF keeps only the surviving writer, so every reduction sees
    # the same observation set — and (b) the per-point observation-slot
    # table for gather-form seg_pt.
    ww = jnp.arange(Wtot)[:, None]
    # invalid observations scatter out of bounds (dropped) so they can
    # never clobber a valid writer's slot
    owner = jnp.full((Wtot, P), -1, jnp.int32).at[
        ww, jnp.where(obs_valid, ptc, P)].set(
        jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :],
                         (Wtot, N)), mode='drop')
    obs_valid = obs_valid & (
        owner[ww, ptc] == jnp.arange(N, dtype=jnp.int32)[None, :])

    # point set: observed by a FREE window KF (others are anchors)
    free_rows = (~fixed & sel_ok)[:, None] & obs_valid
    pt_local = jnp.zeros((P,), bool).at[ptc.reshape(-1)].max(
        free_rows.reshape(-1))
    obs_valid = obs_valid & pt_local[ptc]

    if pt_cap <= 0:
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
        return prob, kf_sel, sel_ok, None, None, None, None

    # --- compact the point slab: [P] -> [pt_cap] by cumsum-scatter (a
    # top_k over P=65536 lowered to an 85 ms partial-sort while-loop;
    # order-preserving cumsum compaction is one O(P) sweep)
    Lp = min(pt_cap, P)
    ppos = jnp.cumsum(pt_local.astype(jnp.int32)) - 1
    p_in = pt_local & (ppos < Lp)
    lidx = jnp.full((Lp + 1,), 0, jnp.int32).at[
        jnp.where(p_in, ppos, Lp)].set(
        jnp.arange(P, dtype=jnp.int32), mode='drop')[:Lp]
    l_ok = jnp.arange(Lp) < jnp.sum(p_in.astype(jnp.int32))
    inv = jnp.full((P,), -1, jnp.int32).at[
        jnp.where(l_ok, lidx, P)].set(
        jnp.arange(Lp, dtype=jnp.int32), mode='drop')
    obs_pt_l = inv[ptc]                                       # [Wtot, N]
    obs_valid = obs_valid & (obs_pt_l >= 0)                   # spill -> drop

    # --- per-KF observation compaction: [Wtot, N] -> [Wtot, Nc].
    # Only ~1/4 of a KF's keypoint slots carry a live observation; every
    # O-sized array inside ba_iterate costs an HBM sweep PER LM
    # ITERATION, so halving O halves the whole solve (measured: the
    # dense per-iteration sweeps, not the CG, dominate local BA).
    Nc = min(obs_cap if obs_cap > 0 else N, N)
    pos = jnp.cumsum(obs_valid.astype(jnp.int32), axis=1) - 1  # [Wtot, N]
    in_slab = obs_valid & (pos < Nc)
    cols_src = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :],
                                (Wtot, N))
    col_of = jnp.full((Wtot, Nc + 1), N, jnp.int32).at[
        ww, jnp.where(in_slab, pos, Nc)].set(cols_src, mode='drop')[:, :Nc]
    c_ok = col_of < N
    cc = jnp.clip(col_of, 0, N - 1)

    uv_sel = m.kf_kp_uv[kf_sel]                               # [Wtot, N, 2]
    ur_sel = m.kf_kp_ur[kf_sel]

    # per-point observation slots -> COMPACTED flat indices
    own_l = owner[:, jnp.clip(lidx, 0, P - 1)]                # [Wtot, Lp]
    own_c = jnp.maximum(own_l, 0)
    pos_own = pos[ww, own_c]
    own_ok = (own_l >= 0) & l_ok[None, :] & in_slab[ww, own_c]
    pt_obs_slot = jnp.where(own_ok, ww * Nc + pos_own, -1).T  # [Lp, Wtot]

    prob = BAProblem(
        kf_pose=m.kf_pose[kf_sel],
        kf_fixed=fixed,
        kf_valid=sel_ok,
        pt_xyz=m.pt_xyz[lidx],
        pt_valid=l_ok,
        obs_kf=jnp.repeat(jnp.arange(Wtot), Nc),
        obs_pt=jnp.clip(obs_pt_l, 0, Lp - 1)[ww, cc].reshape(-1),
        obs_uv=uv_sel[ww, cc].reshape(-1, 2),
        obs_ur=jnp.where(c_ok, ur_sel[ww, cc], -1.0).reshape(-1),
        obs_inv_sigma2=jnp.ones((Wtot * Nc,)),
        obs_valid=(c_ok & obs_valid[ww, cc]).reshape(-1))
    return prob, kf_sel, sel_ok, lidx, l_ok, pt_obs_slot, (col_of, c_ok)


def run_local_ba(K, m: MapState, kf_id, window: int, n_fixed: int,
                 inv_sigma2_lvl,
                 iters1: int = 5, iters2: int = 10,
                 pt_cap: int = 8192, W_row=None,
                 obs_cap: int = 0) -> MapState:
    """LocalBundleAdjustment (Optimizer.cc:453-779) on the covisibility
    window; results scattered back into the map."""
    prob, kf_sel, sel_ok, lidx, l_ok, pt_obs_slot, cols = \
        build_local_ba_problem(m, kf_id, window, n_fixed, pt_cap=pt_cap,
                               W_row=W_row, obs_cap=obs_cap)
    N = m.kf_kp_pt.shape[1]
    Wtot = kf_sel.shape[0]
    ww = jnp.arange(Wtot)[:, None]
    if cols is None:
        block_n = N
        lvl = m.kf_kp_level[kf_sel].reshape(-1)
    else:
        col_of, c_ok = cols
        block_n = col_of.shape[1]
        lvl = m.kf_kp_level[kf_sel][ww, jnp.clip(col_of, 0, N - 1)] \
            .reshape(-1)
    prob = prob._replace(obs_inv_sigma2=inv_sigma2_lvl[
        jnp.clip(lvl, 0, inv_sigma2_lvl.shape[0] - 1)])
    kf_pose, pt_xyz, keep = local_ba(K, prob, iters1, iters2,
                                     block_n=block_n,
                                     pt_obs_slot=pt_obs_slot)

    # scatter poses back (only valid selections, never fixed rows changed)
    m = m._replace(
        kf_pose=m.kf_pose.at[kf_sel].set(
            jnp.where(sel_ok[:, None, None], kf_pose, m.kf_pose[kf_sel])))
    if lidx is None:
        m = m._replace(pt_xyz=pt_xyz)
    else:
        m = m._replace(pt_xyz=m.pt_xyz.at[lidx].set(
            jnp.where(l_ok[:, None], pt_xyz, m.pt_xyz[lidx])))

    # prune observations the BA rejected (Optimizer.cc:741-760)
    P = m.pt_xyz.shape[0]
    pruned = prob.obs_valid & ~keep
    kp_pt_sel = m.kf_kp_pt[kf_sel]
    if cols is None:
        kp_pt_sel = jnp.where(pruned.reshape(Wtot, N), -1, kp_pt_sel)
    else:
        pr = pruned.reshape(Wtot, block_n) & c_ok
        cc = jnp.clip(col_of, 0, N - 1)
        kp_pt_sel = kp_pt_sel.at[ww, cc].set(
            jnp.where(pr, -1, kp_pt_sel[ww, cc]))
    m = m._replace(kf_kp_pt=m.kf_kp_pt.at[kf_sel].set(kp_pt_sel))
    # a point whose observations fall below 2 is DEAD — the reference
    # erases it via MapPoint::EraseObservation -> SetBadFlag (nObs < 2).
    # Leaving it valid keeps a stale (often BA-orphaned, unconstrained)
    # position matchable by tracking; measured on live maps as 100+ m
    # garbage points matched at 95% rates right after a local BA.
    if lidx is None:
        n_pruned = jax.ops.segment_sum(
            pruned.astype(jnp.int32), jnp.clip(prob.obs_pt, 0, P - 1),
            num_segments=P)
    else:
        Lp = lidx.shape[0]
        n_pruned_l = jax.ops.segment_sum(
            pruned.astype(jnp.int32), prob.obs_pt, num_segments=Lp)
        n_pruned = jnp.zeros((P,), jnp.int32).at[lidx].add(
            jnp.where(l_ok, n_pruned_l, 0))
    pt_n_obs = jnp.maximum(m.pt_n_obs - n_pruned, 0)
    # only points the BA actually rejected from die here — fresh
    # single-observation spawns (n_obs=1 by construction) are candidates
    # under MapPointCulling's recency window, not this rule
    died = (n_pruned > 0) & (pt_n_obs < 2)
    pt_valid = m.pt_valid & ~died
    # erase observations of dead points before their rows recycle
    # (_alloc_indices free-slot allocation)
    kf_kp_pt2 = jnp.where(
        (m.kf_kp_pt >= 0) & pt_valid[jnp.clip(m.kf_kp_pt, 0, P - 1)],
        m.kf_kp_pt, -1)
    m = m._replace(
        pt_n_obs=pt_n_obs,
        pt_valid=pt_valid,
        kf_kp_pt=kf_kp_pt2,
        pt_obj=jnp.where(died, -1, m.pt_obj))
    return m


def process_new_keyframe(K, m: MapState, kf_id, scale_factors,
                         inv_sigma2_lvl, cfg, ba_iters=None) -> MapState:
    """The LocalMapping pipeline for one keyframe.

    The covisibility row for kf_id is computed ONCE and shared by all
    four consumers (triangulate / fuse / local BA / KF cull) — each
    recomputing it cost a [K,P]x[P,K] MXU product (~26 ms at KITTI caps).
    Mid-pass observation changes shift the weights slightly; neighbor
    SELECTION tolerates the staleness (the reference also selects from
    incrementally-maintained connection lists, LocalMapping.cc:208,455).

    ba_iters: optional (iters1, iters2) override of the local-BA LM
    schedule — the under-pressure variant of the reference's mbAbortBA
    interruption (config.MappingConfig.ba_abort_*).
    """
    W_row = covisibility(m)[kf_id]
    m = map_ops.cull_points(m, kf_id,
                            recency_scope=cfg.mapping.cull_recency_scope)
    m = map_ops.triangulate_new_points(
        m, kf_id, n_neighbors=5, K=K,
        inv_sigma2_lvl=inv_sigma2_lvl, scale_factors=scale_factors,
        W_row=W_row)
    m = map_ops.fuse_into_neighbors(
        m, kf_id, n_neighbors=5, K=K,
        scale_factors=scale_factors, inv_sigma2_lvl=inv_sigma2_lvl,
        W_row=W_row)
    # distinctive-descriptor re-election + normal refresh after fusion
    # (LocalMapping::SearchInNeighbors tail, LocalMapping.cc:540-552) —
    # restricted to the covisibility window's points, which is the set
    # the pass actually touched (the full-slab refresh cost 81 ms/KF at
    # KITTI caps; see recompute_point_stats_windowed)
    if cfg.mapping.reelect_descriptors:
        Kcap = m.kf_kp_pt.shape[0]
        Wn = jnp.where(m.kf_valid & (jnp.arange(Kcap) != kf_id), W_row, -1)
        _, stat_nbrs = jax.lax.top_k(Wn, min(15, Kcap))
        kf_sel_stats = jnp.concatenate([kf_id[None], stat_nbrs])
        m = recompute_point_stats_windowed(
            m, kf_sel_stats, cap=cfg.caps.local_pt_cap)
    it1, it2 = ba_iters if ba_iters is not None else (5, 10)
    m = run_local_ba(m=m, K=K, kf_id=kf_id,
                     window=cfg.caps.local_window_kf, n_fixed=8,
                     inv_sigma2_lvl=inv_sigma2_lvl,
                     iters1=it1, iters2=it2,
                     pt_cap=cfg.caps.local_pt_cap, W_row=W_row,
                     obs_cap=cfg.caps.local_obs_per_kf)
    m = map_ops.cull_keyframes(
        m, kf_id, scale_condition=cfg.mapping.kf_cull_scale_condition,
        n_levels=cfg.orb.n_levels, W_row=W_row)
    return m
