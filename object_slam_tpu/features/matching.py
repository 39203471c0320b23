"""Descriptor matching: Hamming distances + the reference's search modes.

Parity with `ORBmatcher` (`ORBmatcher.cc`): projection-window search for
map-point tracking (`:45-129`, `:1328-1470`), brute/BoW-bucketed frame-frame
matching (`:159-288`, `:522-655`), epipolar search for triangulation
(`:657-823`), Fuse duplicate detection (`:825-975`), and the
rotation-consistency histogram (`:1601`) + TH_LOW/TH_HIGH/ratio gates.

TPU redesign: every search mode is a masked dense [M, N] Hamming-distance
matrix (XOR + lax.population_count over uint32[8] descriptors — the VPU
analogue of the reference's SSE popcount at ORBmatcher.cc:1647) with
mode-specific candidate masks (window, epipolar band, scale levels),
reduced by masked top-2 for best/second-best ratio tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BIG = jnp.int32(1 << 15)


def hamming_matrix(desc_a, desc_b):
    """[M, 8] u32 x [N, 8] u32 -> [M, N] int32 Hamming distances.

    Deliberately the plain XLA form: a hand-tiled Pallas kernel of this
    op measured 2.7 ms vs XLA's 0.84 ms at [4096, 1024] on v5e — XLA
    keeps XOR+popcount+reduce fused without materializing [M, N, 8],
    and Mosaic tiles the 8-wide minor dimension poorly (r4 measurement;
    the scaffold kernel was removed in r5 — a fused distance+top-2
    kernel would save only the [M, N] HBM round trip, <2% of the frame
    program)."""
    x = desc_a[:, None, :] ^ desc_b[None, :, :]
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def masked_best2(dist, mask):
    """Per-row best and second-best over masked columns.

    Returns (best_idx [M], best [M], second [M]). Masked-out entries count
    as BIG distance.
    """
    d = jnp.where(mask, dist, BIG)
    best_idx = jnp.argmin(d, axis=1)
    best = jnp.take_along_axis(d, best_idx[:, None], axis=1)[:, 0]
    d2 = d.at[jnp.arange(d.shape[0]), best_idx].set(BIG)
    second = jnp.min(d2, axis=1)
    return best_idx, best, second


def masked_best2_idx(dist, mask):
    """masked_best2 that also returns the second-best column index (for
    level-aware ratio tests)."""
    d = jnp.where(mask, dist, BIG)
    best_idx = jnp.argmin(d, axis=1)
    best = jnp.take_along_axis(d, best_idx[:, None], axis=1)[:, 0]
    d2 = d.at[jnp.arange(d.shape[0]), best_idx].set(BIG)
    second_idx = jnp.argmin(d2, axis=1)
    second = jnp.take_along_axis(d2, second_idx[:, None], axis=1)[:, 0]
    return best_idx, best, second_idx, second


def rotation_consistency(angle_a, angle_b, matched_mask, histo_length: int = 30):
    """Keep only matches in the 3 dominant rotation-difference bins
    (ORBmatcher.cc:1601-1643 ComputeThreeMaxima)."""
    rot = (angle_a - angle_b) * (histo_length / (2.0 * jnp.pi))
    bins = jnp.mod(jnp.round(rot).astype(jnp.int32), histo_length)
    counts = jnp.sum(
        (bins[:, None] == jnp.arange(histo_length)[None, :]) & matched_mask[:, None],
        axis=0)
    top3 = jax.lax.top_k(counts, 3)[1]
    # the reference drops maxima < 0.1x the best bin
    cmax = jnp.max(counts)
    keep_bin = jnp.zeros(histo_length, bool)
    for i in range(3):
        keep_bin = keep_bin.at[top3[i]].set(counts[top3[i]] >= 0.1 * cmax)
    return matched_mask & keep_bin[bins]


def resolve_duplicates(best_idx, best_dist, matched, n_targets):
    """Enforce one-to-one: if several rows matched the same column, keep the
    row with the lowest distance (the reference's bestIdx bookkeeping)."""
    d = jnp.where(matched, best_dist, BIG)
    # min distance per target column
    col_min = jax.ops.segment_min(d, best_idx, num_segments=n_targets)
    keep = matched & (d <= col_min[best_idx])
    # break exact ties by row order: first row with the min wins
    row_ids = jnp.arange(best_idx.shape[0])
    first_row = jax.ops.segment_min(
        jnp.where(keep, row_ids, BIG), best_idx, num_segments=n_targets)
    return keep & (row_ids == first_row[best_idx])


def search_by_projection(proj_uv, proj_level, proj_desc, proj_valid,
                         kp_uv, kp_level, kp_desc, kp_valid,
                         radius_per_row, th_dist: int = 100,
                         nn_ratio: float | None = 0.9,
                         level_window: int = 1,
                         kp_ur=None, proj_ur=None, r_ur=None,
                         lvl_lo=None, lvl_hi=None,
                         angle_a=None, angle_b=None):
    """Generic projection-window search (SearchByProjection family).

    Rows = things being searched (map points / last-frame features) with a
    predicted image location, scale level and descriptor; columns = current
    frame keypoints. Returns (match_idx [M] int32 (-1 = none), match_mask).

    lvl_lo/lvl_hi: optional per-row inclusive level bounds overriding the
    symmetric `level_window` — the frame-to-frame search under forward
    motion accepts any level >= last (the point LOOMS one pyramid level
    per ~1.2x depth ratio; ORBmatcher.cc:1341-1360 passes nLastOctave as
    minLevel with no max, and the mirror for backward motion).
    """
    dist = hamming_matrix(proj_desc, kp_desc)
    du = jnp.abs(proj_uv[:, None, 0] - kp_uv[None, :, 0])
    dv = jnp.abs(proj_uv[:, None, 1] - kp_uv[None, :, 1])
    window = (du < radius_per_row[:, None]) & (dv < radius_per_row[:, None])
    if lvl_lo is not None:
        lvl_ok = ((kp_level[None, :] >= lvl_lo[:, None])
                  & (kp_level[None, :] <= lvl_hi[:, None]))
    else:
        lvl_ok = (jnp.abs(kp_level[None, :] - proj_level[:, None])
                  <= level_window)
    mask = window & lvl_ok & proj_valid[:, None] & kp_valid[None, :]
    if kp_ur is not None and proj_ur is not None and r_ur is not None:
        # stereo right-u gate (ORBmatcher.cc:1385-1395)
        ur_ok = (kp_ur[None, :] < 0) | (
            jnp.abs(proj_ur[:, None] - kp_ur[None, :]) < r_ur[:, None])
        mask = mask & ur_ok

    best_idx, best, second_idx, second = masked_best2_idx(dist, mask)
    matched = best <= th_dist
    if nn_ratio is not None:
        # the reference applies the best/second ratio ONLY when both
        # candidates sit on the SAME pyramid level (ORBmatcher.cc:90-127
        # `if(bestLevel==bestLevel2 && bestDist>mfNNratio*bestDist2)`) — a
        # runner-up on another level is the same physical corner seen at a
        # different scale, and rejecting on it starves retention exactly
        # where cross-level keypoint flips are common
        same_lvl = kp_level[best_idx] == kp_level[second_idx]
        ratio_fail = same_lvl & (best.astype(jnp.float32) >=
                                 nn_ratio * second.astype(jnp.float32))
        matched = matched & ~ratio_fail
    if angle_a is not None and angle_b is not None:
        # rotation-histogram consistency — the reference applies it to
        # the frame-to-frame search (mbCheckOrientation,
        # ORBmatcher.cc:1437-1457): keep only matches whose orientation
        # delta falls in the 3 dominant histogram bins. This prunes the
        # cross-level aliases the widened forward-motion level window
        # admits (same texture, different corner).
        matched = rotation_consistency(angle_a, angle_b[best_idx], matched)
    matched = resolve_duplicates(best_idx, best, matched, kp_uv.shape[0])
    return jnp.where(matched, best_idx, -1), matched


def brute_match(desc_a, valid_a, desc_b, valid_b,
                th_dist: int = 50, nn_ratio: float = 0.9,
                angle_a=None, angle_b=None, check_rotation=True,
                histo_length: int = 30):
    """Dense best-match with ratio + optional rotation consistency.

    Replaces the reference's BoW-bucketed SearchByBoW — at TPU speeds the
    full [N, N] Hamming matrix is cheaper than maintaining feature-vector
    buckets (the buckets exist to cut CPU work, not to improve matches).
    """
    dist = hamming_matrix(desc_a, desc_b)
    mask = valid_a[:, None] & valid_b[None, :]
    best_idx, best, second = masked_best2(dist, mask)
    matched = (best <= th_dist) & (
        best.astype(jnp.float32) < nn_ratio * second.astype(jnp.float32))
    if check_rotation and angle_a is not None:
        matched = rotation_consistency(
            angle_a, angle_b[best_idx], matched, histo_length)
    matched = resolve_duplicates(best_idx, best, matched, desc_b.shape[0])
    return jnp.where(matched, best_idx, -1), matched


def search_for_triangulation(desc1, uv1, valid1, desc2, uv2, valid2,
                             F12, ex2, inv_sigma2_lvl2,
                             th_dist: int = 50, nn_ratio: float = 0.8,
                             angle1=None, angle2=None):
    """Epipolar-constrained matching between two keyframes
    (SearchForTriangulation, ORBmatcher.cc:657-823): candidate pairs must lie
    near each other's epipolar line and away from the epipole ex2 in image 2.

    The best/second ratio test is ESSENTIAL here even though the
    reference's BoW-bucketed variant omits it: on self-similar texture the
    epipolar band contains look-alike candidates, and an aliased pair
    triangulates to a CONSISTENT wrong 3D point that passes every
    reprojection gate (measured: one mapping pass flooded the local map
    with ~20 cm-off points and tracking re-locked onto them). Ambiguous
    rows must not triangulate at all.

    F12: [3, 3] fundamental matrix mapping image-1 points to image-2 lines.
    inv_sigma2_lvl2: [N2] per-kp information for the line test.
    Returns (match_idx [N1], mask [N1]).
    """
    ones = jnp.ones((uv1.shape[0], 1), uv1.dtype)
    l2 = jnp.concatenate([uv1, ones], -1) @ F12.T          # [N1, 3] lines
    num = (l2[:, None, 0] * uv2[None, :, 0]
           + l2[:, None, 1] * uv2[None, :, 1] + l2[:, None, 2])
    den = jnp.maximum(l2[:, None, 0] ** 2 + l2[:, None, 1] ** 2, 1e-12)
    dline2 = num * num / den                                # [N1, N2]
    line_ok = dline2 * inv_sigma2_lvl2[None, :] < 3.84
    # epipole distance gate (don't triangulate near the epipole)
    de2 = jnp.sum((uv2 - ex2[None, :]) ** 2, -1)
    ep_ok = de2[None, :] > 100.0

    dist = hamming_matrix(desc1, desc2)
    mask = line_ok & ep_ok & valid1[:, None] & valid2[None, :]
    best_idx, best, second = masked_best2(dist, mask)
    matched = (best <= th_dist) & (
        best.astype(jnp.float32) < nn_ratio * second.astype(jnp.float32))
    if angle1 is not None and angle2 is not None:
        matched = rotation_consistency(angle1, angle2[best_idx], matched)
    matched = resolve_duplicates(best_idx, best, matched, desc2.shape[0])
    return jnp.where(matched, best_idx, -1), matched
