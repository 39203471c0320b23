"""Object landmarks: association, lifecycle, merging, and the semantically
constrained pose optimizer.

This is the reference's research contribution, rebuilt TPU-first:

  * `ObjectMatcher::MatchTwoFrame` (`ObjectMatcher.cc:47-440`): frame-to-
    frame association by HSV cosine similarity (> 0.8) + 2D bbox IoU (> 0.5)
    among same-label detections -> here one [J, I] masked score matrix.
  * `ObjectMatcher::MatchMapToFrame` (`ObjectMatcher.cc:442-802`): map-to-
    frame association by best-over-history HSV similarity (> 0.8) and
    unprojected-centroid-to-history-center distances (mean < 0.3 indoor /
    5.0 outdoor, or min < 0.1) -> [J, I] scores over the history ring.
  * `Tracking::UpdateCurrentObject` (`Tracking.cc:1079-1209`): create /
    update Object3D landmarks, per-point label voting
    (`MapPoint.cc:84-137`), outlier rejection (3-sigma + small-cluster
    drop, `ObjectTypes.cc:55-168,661-764` TEST5/TEST7 policy).
  * `Map::ObjectMapRegularization` (`Map.cc:47-157`): same-label pairwise
    3D-overlap merge (> 0.4) -> dense [J, J] AABB overlap matrix + pointer
    union.
  * `ObjectOptimizer::PoseOptimization2` (`ObjectOptimizer.cc:624-1240`):
    pose-only GN with extra mask-attraction edges. The reference builds a
    KD-tree over mask pixels per frame; here the per-detection nearest-
    mask-pixel feature-transform maps (ops/distance_transform.py) answer
    every query with one gather — the M_joint and M_semantic edge sets
    evaluate densely with per-round re-validation exactly like the
    reference's level-toggling schedule.

Euclidean clustering (the PCL dependency, `ObjectTypes.cc:711-720`) is a
fixed-iteration label-propagation over a [n, n] distance adjacency — no
trees, no sequential region growing.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from object_slam_tpu.geometry import se3, camera as cam_mod
from object_slam_tpu.ops.distance_transform import nearest_mask_pixel_batched
from object_slam_tpu.semantic.hsv import cosine_similarity
from object_slam_tpu.semantic.object2d import bbox_iou_2d
from object_slam_tpu.slam.frame import FrameData
from object_slam_tpu.slam.map_state import MapState, N_LABEL_SLOTS
from object_slam_tpu.slam.tracking import TrackResult
from object_slam_tpu.solvers.pose_opt import (
    PoseObs, reproj_residual_jac, edge_chi2, huber_weight)

MAX_SEM_POINTS = 2048     # static slab of object member points per frame
MAX_CLUSTER_POINTS = 512  # per-object clustering slab


# ---------------------------------------------------------------------------
# Association
# ---------------------------------------------------------------------------

def match_two_frame(m: MapState, frame: FrameData, last: FrameData):
    """[J?] frame-to-frame: carry last frame's Object3D ids onto current
    detections by appearance + box overlap. Returns obj3d [I] int32."""
    I = frame.obj.label.shape[0]
    # rows: last-frame detections with an object id
    last_ok = last.obj.valid & (last.obj3d >= 0)
    sim = cosine_similarity(last.obj.hist[:, None, :],
                            frame.obj.hist[None, :, :])       # [I, I]
    iou = bbox_iou_2d(last.obj.bbox, frame.obj.bbox)
    same_label = last.obj.label[:, None] == frame.obj.label[None, :]
    ok = (same_label & last_ok[:, None] & frame.obj.valid[None, :]
          & (sim > 0.8) & (iou > 0.5))
    score = jnp.where(ok, sim, -1.0)
    best_det = jnp.argmax(score, axis=1)                       # per last-det
    best_ok = jnp.max(score, axis=1) > 0
    # one-to-one: a current det takes the best-scoring claimant
    claim = jnp.where(best_ok, best_det, -1)
    obj3d = jnp.full((I,), -1, jnp.int32)
    claim_score = jnp.where(best_ok, jnp.max(score, axis=1), -1.0)
    order_best = jax.ops.segment_max(claim_score, jnp.clip(claim, 0, I - 1),
                                     num_segments=I)
    winner = best_ok & (claim_score >= order_best[jnp.clip(claim, 0, I - 1)])
    # scatter-max: dead rows clip to det 0 and must not clobber it
    obj3d = obj3d.at[jnp.clip(claim, 0, I - 1)].max(
        jnp.where(winner, last.obj3d, -1))
    return obj3d


def match_map_to_frame(m: MapState, frame: FrameData, obj3d, K,
                       mean_dist_max: float, min_dist_max: float = 0.1):
    """Map-to-frame association for detections still unmatched."""
    I = frame.obj.label.shape[0]
    J = m.obj_valid.shape[0]
    Hc = m.obj_hist_ring.shape[1]

    taken = jnp.zeros((J,), bool).at[jnp.clip(obj3d, 0, J - 1)].max(obj3d >= 0)
    obj_ok = m.obj_valid & ~taken & (m.obj_replaced < 0)
    det_ok = frame.obj.valid & (obj3d < 0)

    # appearance: best over history ring
    ring_n = m.obj_hist_n[:, None] > jnp.arange(Hc)[None, :]    # [J, Hc]
    sims = cosine_similarity(m.obj_hist_ring[:, :, None, :],
                             frame.obj.hist[None, None, :, :])  # [J, Hc, I]
    sims = jnp.where(ring_n[:, :, None], sims, -1.0)
    sim_best = jnp.max(sims, axis=1)                            # [J, I]

    # geometry: unproject detection centroid at its mean depth
    Twc = se3.inverse(frame.Tcw)
    pc = cam_mod.backproject(K, frame.obj.centroid_uv,
                             jnp.maximum(frame.obj.mean_depth, 1e-6))
    pw = se3.apply(Twc, pc[None])[0]                            # [I, 3]
    d = jnp.linalg.norm(m.obj_center_ring[:, :, None, :]
                        - pw[None, None, :, :], axis=-1)        # [J, Hc, I]
    d = jnp.where(ring_n[:, :, None], d, jnp.inf)
    n_hist = jnp.maximum(m.obj_hist_n[:, None], 1)
    mean_d = jnp.sum(jnp.where(jnp.isfinite(d), d, 0.0), axis=1) / n_hist
    min_d = jnp.min(d, axis=1)

    same_label = m.obj_label[:, None] == frame.obj.label[None, :]
    ok = (same_label & obj_ok[:, None] & det_ok[None, :]
          & (sim_best > 0.8)
          & ((mean_d < mean_dist_max) | (min_d < min_dist_max)))
    score = jnp.where(ok, sim_best, -1.0)
    best_det = jnp.argmax(score, axis=1)
    best_s = jnp.max(score, axis=1)
    best_ok = best_s > 0
    # winner per detection
    col_best = jax.ops.segment_max(jnp.where(best_ok, best_s, -1.0),
                                   jnp.clip(best_det, 0, I - 1),
                                   num_segments=I)
    winner = best_ok & (best_s >= col_best[jnp.clip(best_det, 0, I - 1)])
    obj3d = obj3d.at[jnp.clip(best_det, 0, I - 1)].max(
        jnp.where(winner, jnp.arange(J), -1))
    return obj3d


# ---------------------------------------------------------------------------
# Lifecycle: create / update / reject / merge
# ---------------------------------------------------------------------------

def _cluster_reject(pts, valid, centroid, tol: float,
                    sigma_gate: float = 3.0,
                    small_frac: float = 0.1, min_n_for_cluster: int = 15,
                    n_prop: int = 12):
    """TEST7 (ObjectTypes.cc:661-764): drop points > 3 sigma from the
    centroid; if enough points, also drop connected components (tolerance
    tol) holding < 10% of the mass. Label propagation replaces PCL's
    euclidean cluster extraction. Returns keep mask."""
    n = pts.shape[0]
    d = jnp.linalg.norm(pts - centroid[None], axis=-1)
    mu = jnp.sum(jnp.where(valid, d, 0.0)) / jnp.maximum(
        jnp.sum(valid.astype(jnp.float32)), 1.0)
    var = jnp.sum(jnp.where(valid, (d - mu) ** 2, 0.0)) / jnp.maximum(
        jnp.sum(valid.astype(jnp.float32)), 1.0)
    keep = valid & (d <= mu + sigma_gate * jnp.sqrt(var))

    # connected components by distance < tol
    dist2 = jnp.sum((pts[:, None] - pts[None, :]) ** 2, -1)
    adj = (dist2 < tol * tol) & keep[:, None] & keep[None, :]
    labels = jnp.where(keep, jnp.arange(n), n)

    def prop(_, lab):
        neigh = jnp.where(adj, lab[None, :], n)
        return jnp.minimum(lab, jnp.min(neigh, axis=1))

    labels = jax.lax.fori_loop(0, n_prop, prop, labels)
    sizes = jax.ops.segment_sum(keep.astype(jnp.int32), labels,
                                num_segments=n + 1)
    total = jnp.sum(keep.astype(jnp.int32))
    big = sizes[labels] >= small_frac * total
    apply_cluster = total > min_n_for_cluster
    keep = keep & jnp.where(apply_cluster, big, True)
    return keep


# Same-config engines share compiled kernels (see frame.py rationale);
# per-instance state (the semantic_constraints counter) stays per-object.
_OBJ_JIT_CACHE: dict = {}


class ObjectEngine:
    """Host-facing object subsystem; owns the jitted kernels."""

    def __init__(self, cfg, K):
        self.cfg = cfg
        self.K = K
        self.tol = (cfg.objects.cluster_tolerance_indoor if cfg.indoor
                    else cfg.objects.cluster_tolerance_outdoor)
        self.mean_dist_max = (cfg.objects.mean_dist_max_indoor if cfg.indoor
                              else cfg.objects.mean_dist_max_outdoor)
        self.label_slots = {lab: i for i, lab in enumerate(
            (cfg.semantic.valid_labels_tum if cfg.indoor
             else cfg.semantic.valid_labels_kitti)[:N_LABEL_SLOTS])}
        self.semantic_constraints = 0  # N_AllSemanticConstraintNum analogue
        key = repr(cfg)
        cached = _OBJ_JIT_CACHE.get(key)
        if cached is None:
            cached = (jax.jit(self._assoc_impl), jax.jit(self._update_impl),
                      jax.jit(self._semopt_impl),
                      jax.jit(self._semlocal_impl),
                      self._assoc_impl, self._update_impl, self._semopt_impl)
            _OBJ_JIT_CACHE[key] = cached
        (self._jit_assoc, self._jit_update, self._jit_semopt,
         self._jit_semlocal, self.assoc_impl, self.update_impl,
         self.semopt_impl) = cached

    # -- association ----------------------------------------------------
    def associate(self, m: MapState, frame: FrameData,
                  last: FrameData) -> FrameData:
        obj3d = self._jit_assoc(m, frame, last)
        return frame._replace(obj3d=obj3d)

    def _assoc_impl(self, m, frame, last):
        obj3d = match_two_frame(m, frame, last)
        # forward merged objects (CheckReplacedObjInLastFrame analogue)
        J = m.obj_valid.shape[0]
        fwd = m.obj_replaced[jnp.clip(obj3d, 0, J - 1)]
        obj3d = jnp.where((obj3d >= 0) & (fwd >= 0), fwd, obj3d)
        obj3d = jnp.where((obj3d >= 0)
                          & m.obj_valid[jnp.clip(obj3d, 0, J - 1)],
                          obj3d, -1)
        obj3d = match_map_to_frame(m, frame, obj3d, self.K,
                                   self.mean_dist_max,
                                   self.cfg.objects.min_dist_max)
        return obj3d

    # -- lifecycle -------------------------------------------------------
    def update(self, m: MapState, frame: FrameData):
        m2, obj3d = self._jit_update(m, frame)
        return m2, frame._replace(obj3d=obj3d)

    def _update_impl(self, m: MapState, frame: FrameData):
        cfg = self.cfg.objects
        I = frame.obj.label.shape[0]
        J = m.obj_valid.shape[0]
        P = m.pt_xyz.shape[0]
        Hc = m.obj_hist_ring.shape[1]
        obj3d = frame.obj3d

        # --- create new objects for unmatched detections with 3D support
        det_pts = (frame.obj.kp2obj >= 0) & (frame.kp_pt >= 0) & frame.valid
        n3d = jax.ops.segment_sum(
            det_pts.astype(jnp.int32),
            jnp.clip(frame.obj.kp2obj, 0, I - 1), num_segments=I)
        create = frame.obj.valid & (obj3d < 0) & (n3d > cfg.min_points_valid)
        offs = jnp.cumsum(create.astype(jnp.int32)) - 1
        new_slot = jnp.minimum(m.n_obj + offs, J - 1)
        can = create & (m.n_obj + offs < J)
        obj3d = jnp.where(can, new_slot, obj3d)
        track_ids = m.next_track_id + offs
        # dead rows share clipped slots: send them out of bounds and DROP
        # (duplicate-scatter last-writer-wins would clobber created rows)
        slot_s = jnp.where(can, new_slot, J)
        m = m._replace(
            obj_valid=m.obj_valid.at[slot_s].set(True, mode='drop'),
            obj_label=m.obj_label.at[slot_s].set(frame.obj.label,
                                                 mode='drop'),
            obj_track_id=m.obj_track_id.at[slot_s].set(track_ids,
                                                       mode='drop'),
            obj_replaced=m.obj_replaced.at[slot_s].set(-1, mode='drop'),
            n_obj=jnp.minimum(m.n_obj + jnp.sum(can.astype(jnp.int32)), J),
            next_track_id=m.next_track_id + jnp.sum(can.astype(jnp.int32)))

        # --- bind member points: pt_obj[p] = matched object
        kp_obj = jnp.where(frame.obj.kp2obj >= 0,
                           obj3d[jnp.clip(frame.obj.kp2obj, 0, I - 1)], -1)
        bind = (kp_obj >= 0) & (frame.kp_pt >= 0) & frame.valid
        ptc = jnp.clip(frame.kp_pt, 0, P - 1)
        m = m._replace(pt_obj=m.pt_obj.at[ptc].set(
            jnp.where(bind, kp_obj, m.pt_obj[ptc])))

        # --- label voting (Tracking.cc:1083-1099 + MapPoint::AddLabelCnt)
        lut = jnp.full((256,), -1, jnp.int32)
        for lab, slot in self.label_slots.items():
            lut = lut.at[lab].set(slot)
        det_lab = frame.obj.label[jnp.clip(frame.obj.kp2obj, 0, I - 1)]
        slot = lut[jnp.clip(det_lab, 0, 255)]
        vote = bind & (slot >= 0)
        m = m._replace(
            pt_label_cnt=m.pt_label_cnt.at[ptc, jnp.clip(slot, 0,
                                                         N_LABEL_SLOTS - 1)]
            .add(vote.astype(jnp.int32)),
            pt_label_tot=m.pt_label_tot.at[ptc].add(vote.astype(jnp.int32)))

        # --- per-matched-object update: history ring + centroid/bbox +
        #     outlier rejection
        matched_obj = jnp.zeros((J,), bool).at[
            jnp.clip(obj3d, 0, J - 1)].max(obj3d >= 0)
        # scatter-max: invalid rows clip to index 0 and must not clobber
        det_of_obj = jnp.full((J,), -1, jnp.int32).at[
            jnp.clip(obj3d, 0, J - 1)].max(
            jnp.where(obj3d >= 0, jnp.arange(I), -1))

        Twc = se3.inverse(frame.Tcw)
        cam_c = Twc[:3, 3]
        pcd = cam_mod.backproject(self.K, frame.obj.centroid_uv,
                                  jnp.maximum(frame.obj.mean_depth, 1e-6))
        centers_w = se3.apply(Twc, pcd[None])[0]               # [I, 3]

        ring_pos = jnp.mod(m.obj_hist_n, Hc)
        dsel = jnp.clip(det_of_obj, 0, I - 1)
        m = m._replace(
            obj_hist_ring=m.obj_hist_ring.at[jnp.arange(J), ring_pos].set(
                jnp.where(matched_obj[:, None], frame.obj.hist[dsel],
                          m.obj_hist_ring[jnp.arange(J), ring_pos])),
            obj_center_ring=m.obj_center_ring.at[jnp.arange(J), ring_pos].set(
                jnp.where(matched_obj[:, None], centers_w[dsel],
                          m.obj_center_ring[jnp.arange(J), ring_pos])),
            obj_campos_ring=m.obj_campos_ring.at[jnp.arange(J), ring_pos].set(
                jnp.where(matched_obj[:, None], cam_c[None],
                          m.obj_campos_ring[jnp.arange(J), ring_pos])),
            obj_hist_n=m.obj_hist_n + matched_obj.astype(jnp.int32),
            obj_n_updates=m.obj_n_updates + matched_obj.astype(jnp.int32))

        # --- outlier rejection + stats for each matched object
        m = self._reject_and_stats(m, matched_obj)

        # --- label-probability membership gate (ObjectTypes.cc:143-148).
        # One-hot select, not a per-row [P] gather of [P, 16] — XLA's TPU
        # backend can lower row-indexed gathers as dynamic-slice loops
        # (the local-BA lesson, solvers/ba.py block_n)
        owner = jnp.clip(m.pt_obj, 0, J - 1)
        owner_lab = m.obj_label[owner]
        oslot = lut[jnp.clip(owner_lab, 0, 255)]
        sel = (jnp.arange(N_LABEL_SLOTS)[None, :]
               == jnp.clip(oslot, 0, N_LABEL_SLOTS - 1)[:, None])
        prob = jnp.sum(jnp.where(sel, m.pt_label_cnt, 0), axis=1) \
            / jnp.maximum(m.pt_label_tot, 1)
        bad_member = (m.pt_obj >= 0) & (m.pt_label_tot > 2) & \
            (prob < cfg.label_prob_min)
        m = m._replace(pt_obj=jnp.where(bad_member, -1, m.pt_obj))

        # --- validity: >5 updates and <5 points -> invalid
        n_pts = jax.ops.segment_sum(
            (m.pt_obj >= 0).astype(jnp.int32), jnp.clip(m.pt_obj, 0, J - 1),
            num_segments=J)
        invalid = (m.obj_n_updates > cfg.min_updates_for_validity) & \
            (n_pts < cfg.min_points_valid)
        m = m._replace(obj_valid=m.obj_valid & ~invalid)

        # --- map regularization: pairwise merge
        m = self._regularize(m)
        return m, obj3d

    def _reject_and_stats(self, m: MapState, matched_obj):
        """Per-object 3-sigma + cluster rejection on a compact point slab,
        then centroid/AABB refresh (ObjectTypes.cc:55-168, 805-833).

        Only MATCHED objects are processed (the reference's Update() runs
        only on the objects associated this frame, Tracking.cc:1079-1209):
        a [<=I]-slot compaction of the matched ids replaces the round-2
        vmap over the full J=64 slab, and the member-point slab compacts
        by cumsum-scatter instead of a P-length top_k — together most of
        the measured 6 ms/frame of the update stage on the v5e chip."""
        J = m.obj_valid.shape[0]
        P = m.pt_xyz.shape[0]
        I = min(self.cfg.semantic.max_instances, J)
        cfg = self.cfg.objects

        do_slot = matched_obj & m.obj_valid
        _, oidx = jax.lax.top_k(jnp.where(do_slot, 1.0, 0.0), I)     # [I]
        o_ok = do_slot[oidx]

        def per_object(j, ok_j):
            member = (m.pt_obj == j) & m.pt_valid & ok_j
            # cumsum compaction: one pass over P, no sort
            pos = jnp.cumsum(member.astype(jnp.int32)) - 1
            in_slab = member & (pos < MAX_CLUSTER_POINTS)
            slot = jnp.where(in_slab, pos, MAX_CLUSTER_POINTS)
            idx = jnp.full((MAX_CLUSTER_POINTS + 1,), P - 1, jnp.int32) \
                .at[slot].set(jnp.arange(P, dtype=jnp.int32),
                              mode='drop')[:MAX_CLUSTER_POINTS]
            n_member = jnp.sum(in_slab.astype(jnp.int32))
            ok = jnp.arange(MAX_CLUSTER_POINTS) < n_member
            pts = m.pt_xyz[idx]
            w = ok.astype(jnp.float32)
            centroid = jnp.sum(pts * w[:, None], 0) / jnp.maximum(jnp.sum(w), 1.0)
            keep = _cluster_reject(pts, ok, centroid, self.tol,
                                   cfg.sigma_gate, cfg.small_cluster_frac,
                                   cfg.small_cluster_min_n)
            drop_ids = jnp.where(ok & ~keep & ok_j, idx, P - 1)
            w2 = keep.astype(jnp.float32)
            c2 = jnp.sum(pts * w2[:, None], 0) / jnp.maximum(jnp.sum(w2), 1.0)
            mn = jnp.min(jnp.where(keep[:, None], pts, jnp.inf), axis=0)
            mx = jnp.max(jnp.where(keep[:, None], pts, -jnp.inf), axis=0)
            return drop_ids, c2, jnp.concatenate([mn, mx])

        drop_ids, centroids, bboxes = jax.vmap(per_object)(oidx, o_ok)
        pt_obj = m.pt_obj.at[drop_ids.reshape(-1)].set(
            jnp.where(drop_ids.reshape(-1) < P - 1, -1,
                      m.pt_obj[drop_ids.reshape(-1)]))
        # scatter refreshed stats back to the matched slots only
        osel = jnp.where(o_ok, oidx, J)
        obj_centroid = m.obj_centroid.at[osel].set(centroids, mode='drop')
        obj_bbox = m.obj_bbox.at[osel].set(bboxes, mode='drop')
        return m._replace(pt_obj=pt_obj, obj_centroid=obj_centroid,
                          obj_bbox=obj_bbox)

    def _regularize(self, m: MapState):
        """ObjectMapRegularization (Map.cc:47-157): merge same-label objects
        whose AABB overlap ratio > 0.4 into the larger-track-id instance."""
        J = m.obj_valid.shape[0]
        mn_a, mx_a = m.obj_bbox[:, :3], m.obj_bbox[:, 3:]
        inter = jnp.maximum(
            jnp.minimum(mx_a[:, None], mx_a[None]) -
            jnp.maximum(mn_a[:, None], mn_a[None]), 0.0)
        ivol = jnp.prod(inter, axis=-1)
        vol = jnp.maximum(jnp.prod(mx_a - mn_a, axis=-1), 1e-9)
        ratio = ivol / jnp.minimum(vol[:, None], vol[None])     # overlap of smaller
        same = (m.obj_label[:, None] == m.obj_label[None]) & \
            m.obj_valid[:, None] & m.obj_valid[None] & \
            (jnp.arange(J)[:, None] != jnp.arange(J)[None])
        mergeable = same & (ratio > self.cfg.objects.merge_overlap_min)

        # target: partner with max track id; absorb if partner id > mine
        tid = m.obj_track_id
        partner_tid = jnp.where(mergeable, tid[None, :], -1)
        best_partner = jnp.argmax(partner_tid, axis=1)
        best_tid = jnp.max(partner_tid, axis=1)
        absorb = (best_tid > tid) & jnp.any(mergeable, axis=1)
        target = jnp.where(absorb, best_partner, jnp.arange(J))
        # one hop of pointer jumping handles chains across frames
        target = target[target]

        P = m.pt_xyz.shape[0]
        owner = jnp.clip(m.pt_obj, 0, J - 1)
        new_owner = jnp.where(m.pt_obj >= 0, target[owner], m.pt_obj)
        m = m._replace(
            pt_obj=new_owner,
            obj_valid=m.obj_valid & ~absorb,
            obj_replaced=jnp.where(absorb, target, m.obj_replaced))
        return m

    # -- semantically constrained pose optimization ---------------------
    def track_local_map_semantic(self, m: MapState, frame: FrameData,
                                 tr: TrackResult):
        """Local-map tracking where the final pose solve includes the
        object mask-attraction edges (the TrackLocalMap ->
        ObjectOptimizer::PoseOptimization2 path, Tracking.cc:1011-1022).
        One jitted program — round 2 ran the local-map half eagerly,
        paying one device round trip PER OP on a remote-attached chip."""
        return self._jit_semlocal(m, frame, tr)

    def _semlocal_impl(self, m: MapState, frame: FrameData,
                       tr: TrackResult):
        from object_slam_tpu.slam import tracking as trk
        import math
        # standard local-map search + first optimization
        res, m, _ = trk.track_local_map(
            self.K, m, frame, tr,
            scale_factors=jnp.asarray(
                [self.cfg.orb.scale_factor ** l
                 for l in range(self.cfg.orb.n_levels)], jnp.float32),
            inv_sigma2_lvl=jnp.asarray(
                [1.0 / self.cfg.orb.scale_factor ** (2 * l)
                 for l in range(self.cfg.orb.n_levels)], jnp.float32),
            log_scale=math.log(self.cfg.orb.scale_factor),
            local_cap=self.cfg.caps.local_search_pts)
        Tcw, kp_pt, inl, n_sem = self._semopt_impl(m, frame, res)
        # n_sem comes back as a DEVICE scalar so the caller can fetch it
        # packed with the inlier count in one round trip; the caller owns
        # adding it to self.semantic_constraints. res.Tcw is the PRE-
        # semopt pose (the plain local-map optimum) for stage diagnostics.
        return TrackResult(Tcw=Tcw, kp_pt=kp_pt, inlier=inl,
                           n_matches=res.n_matches,
                           n_inliers=jnp.sum(
                               (kp_pt >= 0).astype(jnp.int32))), m, n_sem, \
            res.Tcw

    def _semopt_impl(self, m: MapState, frame: FrameData, res: TrackResult):
        cfg = self.cfg.solver
        P = m.pt_xyz.shape[0]
        I = frame.obj.label.shape[0]
        J = m.obj_valid.shape[0]
        N = frame.uv.shape[0]

        inv_sigma2_lvl = jnp.asarray(
            [1.0 / self.cfg.orb.scale_factor ** (2 * l)
             for l in range(self.cfg.orb.n_levels)], jnp.float32)

        # ------ standard edges (matched keypoints)
        matched = (res.kp_pt >= 0) & frame.valid
        ptc = jnp.clip(res.kp_pt, 0, P - 1)
        obs = PoseObs(
            uv=frame.uv, ur=jnp.where(matched, frame.ur, -1.0),
            pw=m.pt_xyz[ptc],
            inv_sigma2=inv_sigma2_lvl[jnp.clip(
                frame.level, 0, inv_sigma2_lvl.shape[0] - 1)],
            valid=matched)

        # ------ semantic point slab: members of matched objects
        det_of_obj = jnp.full((J,), -1, jnp.int32).at[
            jnp.clip(frame.obj3d, 0, J - 1)].max(
            jnp.where(frame.obj3d >= 0, jnp.arange(I), -1))
        owner = jnp.clip(m.pt_obj, 0, J - 1)
        p_det = jnp.where(m.pt_obj >= 0, det_of_obj[owner], -1)  # [P]
        sem_ok = (p_det >= 0) & m.pt_valid
        score = jnp.where(sem_ok, 1.0, 0.0)
        _, sidx = jax.lax.top_k(score, min(MAX_SEM_POINTS, P))
        s_ok = sem_ok[sidx]
        s_pw = m.pt_xyz[sidx]
        s_det = jnp.clip(p_det[sidx], 0, I - 1)

        # M_joint candidates: matched in frame but keypoint outside the mask
        kp_of_pt = jnp.full((P,), -1, jnp.int32).at[ptc].set(
            jnp.where(matched, jnp.arange(N), -1))
        s_kp = kp_of_pt[sidx]
        s_joint = s_ok & (s_kp >= 0) & \
            (frame.obj.kp2obj[jnp.clip(s_kp, 0, N - 1)] != s_det)
        s_semantic = s_ok

        ftmaps = frame.obj.ftmap                                  # [I, H, W, 2]

        ft_org = frame.obj.ft_origin[s_det]                   # [S, 2] (y0,x0)
        org_uv = jnp.stack([ft_org[:, 1], ft_org[:, 0]], -1).astype(jnp.float32)

        def nearest(uv):
            # ftmaps are FT_CROP-local (object2d.py): shift queries into the
            # crop frame, shift answers back
            near_l, d = nearest_mask_pixel_batched(ftmaps, s_det,
                                                   uv - org_uv)
            return near_l + org_uv, d

        def project(T, pw):
            pc = se3.apply(T, pw[None])[0]
            return cam_mod.project(self.K, pc), pc[:, 2]

        # initial-pose gating for M_semantic (ObjectOptimizer.cc:977-1032)
        uv0, z0 = project(res.Tcw, s_pw)
        tgt0, d0 = nearest(uv0)
        sem_active0 = s_semantic & (z0 > 0) & (d0 <= cfg.sem_reproj_gate_px)
        joint_active0 = s_joint & (z0 > 0) & (d0 > cfg.sem_min_shift_px)

        def gn_round(carry, round_idx):
            T, sem_active, joint_active, n_used = carry
            uvp, zp = project(T, s_pw)
            tgt, dist = nearest(uvp)
            # M_joint edges pull only in ROUND 1: the reference re-sets
            # their measurement to the point's own projection after the
            # first optimize() (ObjectOptimizer.cc:968 new_obs = p, the
            # fetched mask pixel unused) — zero residual thereafter
            active = ((sem_active | (joint_active & (round_idx == 0)))
                      & (zp > 0) & (dist <= cfg.sem_reproj_gate_px))
            n_used = jnp.sum(active.astype(jnp.int32))

            # per-round STANDARD-edge reclassification at the round-start
            # pose — the reference setLevel(1)s chi2 outliers between its
            # optimize() calls and re-includes edges that pass again
            # (ObjectOptimizer.cc round loop, same as PoseOptimization);
            # rounds after the first otherwise keep dragging mismatched
            # edges at huber weight
            r0, _, stereo0, z0r = reproj_residual_jac(self.K, T, obs)
            chi20 = edge_chi2(r0, obs.inv_sigma2, stereo0)
            gate0 = jnp.where(stereo0, cfg.chi2_stereo, cfg.chi2_mono)
            std_active = (obs.valid & (z0r > 0)
                          & ((chi20 <= gate0) | (round_idx == 0)))

            def gn_iter(_, Tc):
                # standard edges
                r, Jb, stereo, z = reproj_residual_jac(self.K, Tc, obs)
                chi2 = edge_chi2(r, obs.inv_sigma2, stereo)
                delta2 = jnp.where(stereo, cfg.chi2_stereo, cfg.chi2_mono)
                w = huber_weight(chi2, delta2) * obs.inv_sigma2
                w = jnp.where(std_active & (z > 0), w, 0.0)
                Jw = Jb * w[..., None, None]
                H = jnp.einsum('nij,nik->jk', Jw, Jb)
                b = -jnp.einsum('nij,ni->j', Jw, r)   # GN: H dx = -J^T W e

                # semantic edges: e = tgt - proj(p), with the ROUND-FIXED
                # target `tgt` — g2o edge measurements are constant within
                # one optimize() call and re-set only between rounds
                # (ObjectOptimizer.cc:921-1160). The r1-r4 form re-ran
                # the nearest-pixel query INSIDE every GN iteration: a
                # boundary-following attraction flow ~10x beyond the
                # reference's bounded per-round pull, measured r5 as a
                # systematic mask-ward pose bias on exact masks.
                uvs, zs = project(Tc, s_pw)
                es = tgt - uvs
                pc = se3.apply(Tc, s_pw[None])[0]
                x, y = pc[:, 0], pc[:, 1]
                zz = jnp.maximum(pc[:, 2], 1e-6)
                iz = 1.0 / zz
                iz2 = iz * iz
                du = jnp.stack([self.K.fx * iz, jnp.zeros_like(zz),
                                -self.K.fx * x * iz2], -1)
                dv = jnp.stack([jnp.zeros_like(zz), self.K.fy * iz,
                                -self.K.fy * y * iz2], -1)
                dproj = jnp.stack([du, dv], -2)
                dpc = jnp.concatenate([
                    jnp.broadcast_to(jnp.eye(3), pc.shape[:-1] + (3, 3)),
                    -se3.hat(pc)], axis=-1)
                Js = -(dproj @ dpc)                               # [S, 2, 6]
                chi2s = jnp.sum(es * es, -1)
                ws = huber_weight(chi2s, cfg.chi2_mono)
                ws = jnp.where(active & (zs > 0), ws, 0.0)
                Jsw = Js * ws[:, None, None]
                H2 = H + jnp.einsum('nij,nik->jk', Jsw, Js)
                b2 = b - jnp.einsum('nij,ni->j', Jsw, es)
                H2 = H2 + 1e-5 * jnp.eye(6)
                dx = jnp.linalg.solve(H2, b2)
                return se3.retract(Tc, dx)

            T = jax.lax.fori_loop(0, 10, gn_iter, T)
            # re-validate (ObjectOptimizer.cc:1036-1158)
            uvp, zp = project(T, s_pw)
            _, dist = nearest(uvp)
            sem_active = s_semantic & (zp > 0) & (dist <= cfg.sem_reproj_gate_px)
            joint_active = joint_active & (zp > 0)
            return (T, sem_active, joint_active, n_used), None

        (Tcw, _, _, n_sem), _ = jax.lax.scan(
            gn_round, (res.Tcw, sem_active0, joint_active0, jnp.int32(0)),
            jnp.arange(4))

        # final chi2 gate on standard edges
        r, _, stereo, z = reproj_residual_jac(self.K, Tcw, obs)
        chi2 = edge_chi2(r, obs.inv_sigma2, stereo)
        gate = jnp.where(stereo, cfg.chi2_stereo, cfg.chi2_mono)
        inlier = obs.valid & (chi2 <= gate) & (z > 0)
        kp_pt = jnp.where(inlier, res.kp_pt, -1)
        return Tcw, kp_pt, inlier, n_sem
