"""FAST-9/16 corner detection as dense vectorized compute.

Parity with the FAST stage of `ORBextractor::ComputeKeyPointsOctTree`
(`ORBextractor.cc:765-853`: cv::FAST per 30px cell with threshold fallback
20 -> 7). TPU redesign: the segment test evaluates for EVERY pixel at once —
16 ring comparisons materialize as 16 rolled copies of the image, the
"contiguous arc >= 9" test is a circular AND-reduction over 16 rotations,
and non-max suppression is a 3x3 max-pool comparison. Branch-free, maps
straight onto the VPU. The dual-threshold fallback becomes: compute the
response at the LOW threshold everywhere, and per cell prefer corners that
also pass the HIGH threshold (see extractor.select_keypoints).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3 — the standard FAST-16 ring (dy, dx),
# in circular order.
RING_16 = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)


def _ring_stack(img):
    """[H, W] -> [16, H, W] where slice i is the image shifted so that
    ring pixel i aligns with the center pixel."""
    return jnp.stack([jnp.roll(img, (-dy, -dx), axis=(0, 1))
                      for dy, dx in RING_16])


def fast_score(img, threshold: float, arc_len: int = 9):
    """Per-pixel FAST corner response.

    Returns [H, W] float32: 0 for non-corners; for corners, the OpenCV-style
    score (max over contiguous arcs of the min absolute center difference) —
    the quantity non-max suppression ranks by.
    """
    ring = _ring_stack(img)                       # [16, H, W]
    d = ring - img[None]                          # signed differences
    bright = d > threshold
    dark = d < -threshold

    def arc_all(mask):
        # acc_i = AND of mask at offsets i..i+arc_len-1 (circular)
        acc = mask
        for s in range(1, arc_len):
            acc = acc & jnp.roll(mask, -s, axis=0)
        return acc                                # [16, H, W] arc-start flags

    ab = arc_all(bright)
    ad = arc_all(dark)
    is_corner = jnp.any(ab | ad, axis=0)

    def arc_min(vals, mask):
        # min |d| over each candidate arc, -inf where arc invalid
        m = vals
        for s in range(1, arc_len):
            m = jnp.minimum(m, jnp.roll(vals, -s, axis=0))
        return jnp.where(mask, m, 0.0)

    score_b = jnp.max(arc_min(d, ab), axis=0)
    score_d = jnp.max(arc_min(-d, ad), axis=0)
    score = jnp.maximum(score_b, score_d) - threshold
    return jnp.where(is_corner, jnp.maximum(score, 0.0) + threshold, 0.0)


def fast_score_dual(img, th_lo: float, th_hi: float, arc_len: int = 9):
    """Both thresholds' responses from ONE ring stack (the reference's
    20 -> 7 fallback, ORBextractor.cc:790-830, without recomputing the 16
    shifted images). Returns (score_lo, score_hi) [H, W] maps."""
    ring = _ring_stack(img)
    d = ring - img[None]

    def arc_all(mask):
        acc = mask
        for s in range(1, arc_len):
            acc = acc & jnp.roll(mask, -s, axis=0)
        return acc

    def arc_min(vals, mask):
        m = vals
        for s in range(1, arc_len):
            m = jnp.minimum(m, jnp.roll(vals, -s, axis=0))
        return jnp.where(mask, m, 0.0)

    out = []
    for th in (th_lo, th_hi):
        ab = arc_all(d > th)
        ad = arc_all(d < -th)
        is_corner = jnp.any(ab | ad, axis=0)
        score_b = jnp.max(arc_min(d, ab), axis=0)
        score_d = jnp.max(arc_min(-d, ad), axis=0)
        score = jnp.maximum(score_b, score_d) - th
        out.append(jnp.where(is_corner, jnp.maximum(score, 0.0) + th, 0.0))
    return out[0], out[1]


def detect_dual(img, th_lo: float, th_hi: float, arc_len: int = 9,
                border: int = 3):
    """NMS'd low-threshold response with high-threshold corners boosted so
    per-cell selection prefers them (the array form of the reference's
    per-cell threshold fallback).

    Returns (ranking_response, raw_score): the first for per-cell top-k
    ranking (with the +1e4 high-threshold boost), the second the unboosted
    pre-NMS score map for subpixel parabola fits."""
    s_lo, s_hi = fast_score_dual(img, th_lo, th_hi, arc_len)
    s = nonmax_suppress(s_lo)
    sb = jnp.where((s > 0) & (s_hi > 0), s + 1e4, s)
    h, w = img.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inb = ((ys >= border) & (ys < h - border) &
           (xs >= border) & (xs < w - border))
    return jnp.where(inb, sb, 0.0), s_lo


def subpixel_refine(raw_score, ys, xs):
    """Parabolic subpixel localization on the corner-score surface.

    ys, xs: [N] integer corner positions (local maxima after NMS).
    Returns (dy, dx) in [-0.5, 0.5]. Integer FAST corners quantize the
    measurement to +-0.5 px, which dominates pose noise at short focal
    lengths; a 1D parabola per axis recovers most of it.
    """
    h, w = raw_score.shape
    yc = jnp.clip(ys, 1, h - 2)
    xc = jnp.clip(xs, 1, w - 2)

    def fit(m, p, c):
        denom = m + p - 2.0 * c
        off = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (m - p) / denom, 0.0)
        return jnp.clip(off, -0.5, 0.5)

    c = raw_score[yc, xc]
    dy = fit(raw_score[yc - 1, xc], raw_score[yc + 1, xc], c)
    dx = fit(raw_score[yc, xc - 1], raw_score[yc, xc + 1], c)
    return dy, dx


def nonmax_suppress(score, quantum: float = 0.25):
    """3x3 non-maximum suppression: keep pixels that are the max of their
    neighborhood, compared on a quarter-intensity-quantized lattice.

    Why quantize: score plateaus (flat texture blocks, resize artifacts)
    produce exact ties whose survivors all pass `>=`; +-ulp input noise
    breaks those ties RANDOMLY, changing which pixels survive between
    repeat runs — the r2 repeat-run ATE band started here. On the lattice
    near-ties stay ties and the survivor set is noise-stable; downstream
    per-cell selection breaks residual ties by index (extractor._cell_topk).
    """
    q = jnp.floor(score * (1.0 / quantum))
    neigh = jax.lax.reduce_window(
        q, -jnp.inf, jax.lax.max, (3, 3), (1, 1), 'SAME')
    return jnp.where(q >= neigh, score, 0.0)


def detect(img, threshold: float, arc_len: int = 9, border: int = 3):
    """FAST + NMS with image-border zeroing. Returns [H, W] response map."""
    s = nonmax_suppress(fast_score(img, threshold, arc_len))
    h, w = img.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inb = ((ys >= border) & (ys < h - border) &
           (xs >= border) & (xs < w - border))
    return jnp.where(inb, s, 0.0)
