"""The map as a functional struct-of-arrays state.

Replaces the reference's pointer-graph map (`Map`, `MapPoint`, `KeyFrame` —
`Map.{h,cc}`, `MapPoint.{h,cc}`, `KeyFrame.{h,cc}`) and its mutex discipline
with immutable fixed-capacity device slabs + validity masks. Every mutation
is a pure function MapState -> MapState, so concurrent consumers (tracking /
mapping / loop closing) work on versioned snapshots instead of locks — the
TPU-native answer to `Map::mMutexMapUpdate`.

Slabs (capacities from config.caps):
  points   P rows: position, descriptor, normal, scale range, counters,
           per-label vote counts (MapPoint.cc:84-137 semantics), owning
           object id.
  keyframes K rows: pose + a full copy of the frame's keypoint slab
           (KeyFrame.cc:44 copies frame features, including objects) and the
           keypoint->point assignment (the observation structure).
  objects  J rows: Object3D lifecycle fields (ObjectTypes.h:80-115) with an
           observation-history ring.

The observation set is IMPLICIT: kf_kp_pt[k, n] = p says keypoint n of KF k
observes point p. Covisibility (KeyFrame.cc:289-379) is the boolean
incidence product A A^T — one bf16 matmul on the MXU instead of hash-map
counting.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from object_slam_tpu.semantic.hsv import HIST_DIM

# number of tracked semantic label slots for per-point label voting
N_LABEL_SLOTS = 16


class MapState(NamedTuple):
    # --- counters (device scalars; host reads at orchestration points) ---
    n_pt: jnp.ndarray            # [] int32 allocation cursor
    n_kf: jnp.ndarray
    n_obj: jnp.ndarray
    version: jnp.ndarray         # bumped by big changes (loop/GBA)
    next_track_id: jnp.ndarray   # object track-id source

    # --- points [P] ---
    pt_xyz: jnp.ndarray          # [P, 3]
    pt_desc: jnp.ndarray         # [P, 8] uint32
    pt_normal: jnp.ndarray       # [P, 3]
    pt_min_dist: jnp.ndarray     # [P]
    pt_max_dist: jnp.ndarray     # [P]
    pt_valid: jnp.ndarray        # [P] bool
    pt_visible: jnp.ndarray      # [P] int32 (frustum-visible counter)
    pt_found: jnp.ndarray        # [P] int32 (tracked-inlier counter)
    pt_first_kf: jnp.ndarray     # [P] int32
    pt_ref_kf: jnp.ndarray       # [P] int32
    pt_n_obs: jnp.ndarray        # [P] int32
    pt_label_cnt: jnp.ndarray    # [P, N_LABEL_SLOTS] int32 label votes
    pt_label_tot: jnp.ndarray    # [P] int32 total votes
    pt_obj: jnp.ndarray          # [P] int32 owning Object3D (-1)

    # --- keyframes [K] ---
    kf_pose: jnp.ndarray         # [K, 4, 4] Tcw
    kf_valid: jnp.ndarray        # [K] bool
    kf_frame_id: jnp.ndarray     # [K] int32
    kf_timestamp: jnp.ndarray    # [K] float64-as-float32 pair? use f64 via 2xf32: keep f32 seconds offset
    kf_kp_uv: jnp.ndarray        # [K, N, 2] undistorted
    kf_kp_ur: jnp.ndarray        # [K, N]
    kf_kp_depth: jnp.ndarray     # [K, N]
    kf_kp_level: jnp.ndarray     # [K, N] int32
    kf_kp_angle: jnp.ndarray     # [K, N]
    kf_kp_desc: jnp.ndarray      # [K, N, 8] uint32
    kf_kp_valid: jnp.ndarray     # [K, N] bool
    kf_kp_pt: jnp.ndarray        # [K, N] int32 -> point id (-1)
    kf_parent: jnp.ndarray       # [K] int32 spanning-tree parent (-1 root)
    kf_tcp: jnp.ndarray          # [K, 4, 4] T_child_parent frozen at cull
                                 # time (identity while valid) — the
                                 # reference's KeyFrame::mTcp, used by
                                 # trajectory recomposition to repair
                                 # records whose reference KF was culled
                                 # (System.cc:400-410 while-isBad walk)
    kf_loop_edge: jnp.ndarray    # [K] int32 loop edge partner (-1)
    kf_bow: jnp.ndarray          # [K, W] float32 BoW tf-idf (W = vocab words; 0 cols until vocab built)

    # --- objects [J] ---
    obj_valid: jnp.ndarray       # [J] bool
    obj_label: jnp.ndarray       # [J] int32
    obj_track_id: jnp.ndarray    # [J] int32
    obj_replaced: jnp.ndarray    # [J] int32 merge-forward pointer (-1)
    obj_n_updates: jnp.ndarray   # [J] int32
    obj_centroid: jnp.ndarray    # [J, 3]
    obj_bbox: jnp.ndarray        # [J, 6] (min_xyz, max_xyz)
    obj_hist_ring: jnp.ndarray   # [J, Hc, HIST_DIM] appearance history
    obj_center_ring: jnp.ndarray # [J, Hc, 3] observed-center history
    obj_campos_ring: jnp.ndarray # [J, Hc, 3] camera-center history
    obj_hist_n: jnp.ndarray      # [J] int32 ring fill count


def init_map(caps, history_capacity: int = 64, n_bow_words: int = 0) -> MapState:
    P, K, N, J = caps.max_points, caps.max_keyframes, caps.n_kp, caps.max_objects
    Hc = history_capacity
    i32 = jnp.int32
    return MapState(
        n_pt=jnp.zeros((), i32), n_kf=jnp.zeros((), i32),
        n_obj=jnp.zeros((), i32), version=jnp.zeros((), i32),
        next_track_id=jnp.zeros((), i32),
        pt_xyz=jnp.zeros((P, 3)), pt_desc=jnp.zeros((P, 8), jnp.uint32),
        pt_normal=jnp.zeros((P, 3)), pt_min_dist=jnp.zeros((P,)),
        pt_max_dist=jnp.full((P,), 1e9), pt_valid=jnp.zeros((P,), bool),
        pt_visible=jnp.ones((P,), i32), pt_found=jnp.ones((P,), i32),
        pt_first_kf=jnp.full((P,), -1, i32), pt_ref_kf=jnp.zeros((P,), i32),
        pt_n_obs=jnp.zeros((P,), i32),
        pt_label_cnt=jnp.zeros((P, N_LABEL_SLOTS), i32),
        pt_label_tot=jnp.zeros((P,), i32),
        pt_obj=jnp.full((P,), -1, i32),
        kf_pose=jnp.broadcast_to(jnp.eye(4), (K, 4, 4)),
        kf_valid=jnp.zeros((K,), bool),
        kf_frame_id=jnp.full((K,), -1, i32),
        kf_timestamp=jnp.zeros((K,)),
        kf_kp_uv=jnp.zeros((K, N, 2)), kf_kp_ur=jnp.full((K, N), -1.0),
        kf_kp_depth=jnp.full((K, N), -1.0),
        kf_kp_level=jnp.zeros((K, N), i32), kf_kp_angle=jnp.zeros((K, N)),
        kf_kp_desc=jnp.zeros((K, N, 8), jnp.uint32),
        kf_kp_valid=jnp.zeros((K, N), bool),
        kf_kp_pt=jnp.full((K, N), -1, i32),
        kf_parent=jnp.full((K,), -1, i32),
        kf_tcp=jnp.broadcast_to(jnp.eye(4), (K, 4, 4)),
        kf_loop_edge=jnp.full((K,), -1, i32),
        kf_bow=jnp.zeros((K, max(n_bow_words, 1))),
        obj_valid=jnp.zeros((J,), bool),
        obj_label=jnp.full((J,), -1, i32),
        obj_track_id=jnp.full((J,), -1, i32),
        obj_replaced=jnp.full((J,), -1, i32),
        obj_n_updates=jnp.zeros((J,), i32),
        obj_centroid=jnp.zeros((J, 3)), obj_bbox=jnp.zeros((J, 6)),
        obj_hist_ring=jnp.zeros((J, Hc, HIST_DIM)),
        obj_center_ring=jnp.zeros((J, Hc, 3)),
        obj_campos_ring=jnp.zeros((J, Hc, 3)),
        obj_hist_n=jnp.zeros((J,), i32))


# ---------------------------------------------------------------------------
# Derived structures
# ---------------------------------------------------------------------------

def incidence(m: MapState):
    """[K, P] bool: KF k observes point p."""
    K, N = m.kf_kp_pt.shape
    P = m.pt_xyz.shape[0]
    obs_ok = (m.kf_kp_pt >= 0) & m.kf_kp_valid & m.kf_valid[:, None]
    pt = jnp.clip(m.kf_kp_pt, 0, P - 1)
    A = jnp.zeros((K, P), bool)
    return A.at[jnp.arange(K)[:, None], pt].max(obs_ok)


def covisibility(m: MapState):
    """[K, K] int32 shared-point counts (diagonal zeroed) — the reference's
    covisibility weights (KeyFrame.cc:289-379) as one MXU matmul."""
    A = incidence(m).astype(jnp.bfloat16)
    # explicit DEFAULT precision: {0,1} bf16 inputs are exact on the MXU
    # in one pass; the package-wide "highest" default (object_slam_tpu/
    # __init__.py) exists for f32 GEOMETRY products and would only slow
    # this [K,P]x[P,K] product down
    W = jnp.dot(A, A.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT).astype(jnp.int32)
    return W * (1 - jnp.eye(W.shape[0], dtype=jnp.int32))


def camera_centers(m: MapState):
    R = m.kf_pose[:, :3, :3]
    t = m.kf_pose[:, :3, 3]
    return -jnp.einsum('kji,kj->ki', R, t)


def point_observers(m: MapState, pt_ids):
    """[Q] point ids -> [Q, K] bool observer table."""
    A = incidence(m)
    return A.T[pt_ids]


def recompute_point_stats(m: MapState, max_observers: int = 8) -> MapState:
    """Refresh pt_normal / pt_n_obs / pt_desc from the observation structure
    — `MapPoint::UpdateNormalAndDepth` + `ComputeDistinctiveDescriptors`
    (MapPoint.cc) amortized as one dense pass.

    Distinctive descriptor: the reference elects the member descriptor with
    least median Hamming distance to the others. Here that election runs
    over up to `max_observers` observing keyframes per point (a
    deterministic earliest-per-residue-class sample — capped so the
    pairwise-distance tensor stays [P, M, M] instead of [P, K, K]);
    points with more observers use that subsample, the same estimator on
    a sample of the observation list.

    The observer table builds by ONE scatter-min of encoded (kf, kp)
    codes into [P, M] residue slots — the round-3 form materialized
    [P, K] score + [K, P] keypoint tables (0.5 GB at KITTI caps) and
    top_k'd over K per point (118 ms/keyframe measured; this pass runs
    at keyframe rate inside the mapping program).
    """
    Kcap = m.kf_kp_pt.shape[0]
    P = m.pt_xyz.shape[0]
    N = m.kf_kp_pt.shape[1]
    M = min(max_observers, Kcap)

    obs_mask = (m.kf_kp_pt >= 0) & m.kf_kp_valid & m.kf_valid[:, None]
    ptc = jnp.where(obs_mask, m.kf_kp_pt, P)           # invalid -> dropped
    kk = jnp.broadcast_to(jnp.arange(Kcap, dtype=jnp.int32)[:, None],
                          (Kcap, N))
    code = kk * N + jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.int32)[None, :], (Kcap, N))
    SENT = Kcap * N
    # slot by residue class; min keeps the EARLIEST keyframe per slot
    table = jnp.full((P + 1, M), SENT, jnp.int32).at[
        ptc.reshape(-1), (kk % M).reshape(-1)].min(
        code.reshape(-1), mode='drop')[:P]             # [P, M]
    obs_ok = table < SENT
    obs_kf = jnp.clip(table // N, 0, Kcap - 1)         # [P, M]
    kp_idx = table % N

    n_obs = jnp.zeros((P + 1,), jnp.int32).at[ptc.reshape(-1)].add(
        obs_mask.reshape(-1).astype(jnp.int32), mode='drop')[:P]

    desc = m.kf_kp_desc[obs_kf, jnp.clip(kp_idx, 0, N - 1)]   # [P, M, 8]

    # pairwise Hamming, median per member, argmin election
    x = desc[:, :, None, :] ^ desc[:, None, :, :]
    dist = jnp.sum(_popcount32(x), axis=-1).astype(jnp.int32)  # [P, M, M]
    pair_ok = obs_ok[:, :, None] & obs_ok[:, None, :]
    dist = jnp.where(pair_ok, dist, 9999)
    ds = jnp.sort(dist, axis=-1)
    n_valid = jnp.sum(obs_ok, axis=-1)                 # [P]
    med_idx = jnp.clip((n_valid - 1) // 2, 0, M - 1)
    med = jnp.take_along_axis(
        ds, jnp.broadcast_to(med_idx[:, None, None], (P, M, 1)), -1)[..., 0]
    med = jnp.where(obs_ok, med, 10000)
    best = jnp.argmin(med, axis=-1)                    # [P]
    new_desc = jnp.take_along_axis(
        desc, best[:, None, None].repeat(desc.shape[-1], -1), 1)[:, 0]
    use = m.pt_valid & (n_valid > 0)
    pt_desc = jnp.where(use[:, None], new_desc, m.pt_desc)

    # mean viewing direction over the same observer set
    C = camera_centers(m)                              # [K, 3]
    d = m.pt_xyz[:, None, :] - C[obs_kf]               # [P, M, 3]
    dn = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    normal = jnp.sum(jnp.where(obs_ok[..., None], dn, 0.0), axis=1)
    nn = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.maximum(nn, 1e-9)
    normal = jnp.where(use[:, None], normal, m.pt_normal)

    return m._replace(pt_desc=pt_desc, pt_normal=normal,
                      pt_n_obs=jnp.where(m.pt_valid, n_obs, 0))


def recompute_point_stats_windowed(m: MapState, kf_sel, cap: int,
                                   max_observers: int = 8) -> MapState:
    """recompute_point_stats restricted to the points observed by the
    `kf_sel` keyframe window, compacted to a [cap] slab.

    The reference never refreshes every map point per keyframe: it calls
    UpdateNormalAndDepth / ComputeDistinctiveDescriptors only on points
    TOUCHED by the pass (triangulation, fuse — LocalMapping.cc:540-552,
    MapPoint.cc), which is exactly the covisibility window's points. The
    full-slab form cost 81 ms per mapping pass at KITTI capacities (23 ms
    K*N observer scatter + ~53 ms [P,8,8] election/normal math for 65536
    rows of which <15% were touched); this windowed form scatters from
    the window's observations only and runs the election math at [cap].

    Estimator deviation vs the full form: the observer residue sample for
    a window point includes only its observers INSIDE kf_sel (outside
    observers are invisible to this pass); with n_fixed anchors in
    kf_sel the sample covers the same neighborhood the reference's
    per-point observation list would. pt_n_obs IS refreshed from the
    full observation structure (one scatter-add — leaving it to the
    incremental bookkeeping overcounted after fuse/cull, inflated the
    KF policy's ref_matches, and tripled the keyframe rate: 89 -> 188
    KFs on the r5 KITTI drive).
    """
    Kcap, N = m.kf_kp_pt.shape
    P = m.pt_xyz.shape[0]
    Wsel = kf_sel.shape[0]
    M = min(max_observers, Wsel)
    L = min(cap, P)

    sel_pt = m.kf_kp_pt[kf_sel]                          # [Wsel, N]
    obs_mask = ((sel_pt >= 0) & m.kf_kp_valid[kf_sel]
                & m.kf_valid[kf_sel][:, None])
    ptc = jnp.where(obs_mask, sel_pt, P)

    active = jnp.zeros((P + 1,), bool).at[ptc.reshape(-1)].max(
        obs_mask.reshape(-1), mode='drop')[:P] & m.pt_valid
    pos = jnp.cumsum(active.astype(jnp.int32)) - 1
    inl = active & (pos < L)
    lidx = jnp.zeros((L + 1,), jnp.int32).at[
        jnp.where(inl, pos, L)].set(jnp.arange(P, dtype=jnp.int32),
                                    mode='drop')[:L]     # [L] point slot
    l_ok = jnp.zeros((L + 1,), bool).at[
        jnp.where(inl, pos, L)].set(True, mode='drop')[:L]
    pmap = jnp.full((P + 1,), L, jnp.int32).at[
        jnp.where(inl, jnp.arange(P), P)].set(pos, mode='drop')

    lptc = pmap[ptc]                                     # [Wsel, N] in [0..L]
    ww = jnp.arange(Wsel, dtype=jnp.int32)[:, None]
    kf_glob = kf_sel.astype(jnp.int32)[:, None]
    code = kf_glob * N + jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.int32)[None, :], (Wsel, N))
    SENT = Kcap * N
    table = jnp.full((L + 1, M), SENT, jnp.int32).at[
        lptc.reshape(-1),
        jnp.broadcast_to(kf_glob % M, (Wsel, N)).reshape(-1)].min(
        code.reshape(-1), mode='drop')[:L]               # [L, M]
    obs_ok = table < SENT
    obs_kf = jnp.clip(table // N, 0, Kcap - 1)
    kp_idx = table % N

    desc = m.kf_kp_desc[obs_kf, jnp.clip(kp_idx, 0, N - 1)]  # [L, M, 8]
    x = desc[:, :, None, :] ^ desc[:, None, :, :]
    dist = jnp.sum(_popcount32(x), axis=-1).astype(jnp.int32)
    pair_ok = obs_ok[:, :, None] & obs_ok[:, None, :]
    dist = jnp.where(pair_ok, dist, 9999)
    ds = jnp.sort(dist, axis=-1)
    n_valid = jnp.sum(obs_ok, axis=-1)
    med_idx = jnp.clip((n_valid - 1) // 2, 0, M - 1)
    med = jnp.take_along_axis(
        ds, jnp.broadcast_to(med_idx[:, None, None], (L, M, 1)), -1)[..., 0]
    med = jnp.where(obs_ok, med, 10000)
    best = jnp.argmin(med, axis=-1)
    new_desc = jnp.take_along_axis(
        desc, best[:, None, None].repeat(desc.shape[-1], -1), 1)[:, 0]

    C = camera_centers(m)
    pw = m.pt_xyz[lidx]                                  # [L, 3]
    d = pw[:, None, :] - C[obs_kf]
    dn = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    normal = jnp.sum(jnp.where(obs_ok[..., None], dn, 0.0), axis=1)
    nn = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.maximum(nn, 1e-9)

    use = l_ok & (n_valid > 0)
    pt_desc = m.pt_desc.at[lidx].set(
        jnp.where(use[:, None], new_desc, m.pt_desc[lidx]))
    pt_normal = m.pt_normal.at[lidx].set(
        jnp.where(use[:, None], normal, m.pt_normal[lidx]))

    # exact observation count over ALL keyframes (one scatter-add)
    all_mask = (m.kf_kp_pt >= 0) & m.kf_kp_valid & m.kf_valid[:, None]
    all_ptc = jnp.where(all_mask, m.kf_kp_pt, P)
    n_obs = jnp.zeros((P + 1,), jnp.int32).at[all_ptc.reshape(-1)].add(
        all_mask.reshape(-1).astype(jnp.int32), mode='drop')[:P]
    return m._replace(pt_desc=pt_desc, pt_normal=pt_normal,
                      pt_n_obs=jnp.where(m.pt_valid, n_obs, 0))


def _popcount32(x):
    return jax.lax.population_count(x)


def label_slot(labels_whitelist):
    """Host helper: map dataset label -> slot index in pt_label_cnt."""
    return {lab: i for i, lab in enumerate(labels_whitelist[:N_LABEL_SLOTS])}
