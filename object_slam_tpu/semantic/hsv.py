"""HSV conversion + masked appearance histograms.

Parity with `Frame::ExtractHSVHistogramsFromMask` (`Frame.cc:388-414`):
per-instance histograms of the H (30 bins, range 0..180), S (32, 0..256)
and V (32, 0..256) channels over the mask, concatenated and L1-normalized
as one 94-vector. Association scores are cosine similarities between these
(`ObjectMatcher.cc:877-890`). TPU redesign: the cv::calcHist loop becomes a
one-hot scatter-sum; all instances of a frame histogram in one batched op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

H_BINS, S_BINS, V_BINS = 30, 32, 32
HIST_DIM = H_BINS + S_BINS + V_BINS     # 94


def rgb_to_hsv_cv(rgb):
    """RGB [..., 3] float in [0, 255] -> OpenCV-convention HSV:
    H in [0, 180), S in [0, 255], V in [0, 255]."""
    r, g, b = rgb[..., 0] / 255.0, rgb[..., 1] / 255.0, rgb[..., 2] / 255.0
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    c = v - mn
    safe_c = jnp.where(c == 0, 1.0, c)
    h = jnp.where(v == r, (g - b) / safe_c,
                  jnp.where(v == g, 2.0 + (b - r) / safe_c,
                            4.0 + (r - g) / safe_c))
    h = jnp.mod(h * 60.0, 360.0)
    h = jnp.where(c == 0, 0.0, h)
    s = jnp.where(v == 0, 0.0, c / jnp.maximum(v, 1e-9))
    return jnp.stack([h / 2.0, s * 255.0, v * 255.0], axis=-1)


def masked_hsv_histogram(hsv_img, mask):
    """hsv_img [H, W, 3] (OpenCV ranges), mask [H, W] bool -> [94] L1-normed.

    Bin edges follow cv::calcHist with ranges [0,180) / [0,256) / [0,256).
    """
    m = mask.reshape(-1).astype(jnp.float32)
    h = jnp.clip((hsv_img[..., 0].reshape(-1) / 180.0 * H_BINS).astype(jnp.int32),
                 0, H_BINS - 1)
    s = jnp.clip((hsv_img[..., 1].reshape(-1) / 256.0 * S_BINS).astype(jnp.int32),
                 0, S_BINS - 1)
    v = jnp.clip((hsv_img[..., 2].reshape(-1) / 256.0 * V_BINS).astype(jnp.int32),
                 0, V_BINS - 1)
    hh = jax.ops.segment_sum(m, h, num_segments=H_BINS)
    hs = jax.ops.segment_sum(m, s, num_segments=S_BINS)
    hv = jax.ops.segment_sum(m, v, num_segments=V_BINS)
    hist = jnp.concatenate([hh, hs, hv])
    return hist / jnp.maximum(jnp.sum(hist), 1e-9)


def batched_histograms(rgb_img, masks):
    """rgb [H, W, 3], masks [I, H, W] bool -> [I, 94]."""
    hsv_img = rgb_to_hsv_cv(rgb_img)
    return jax.vmap(lambda m: masked_hsv_histogram(hsv_img, m))(masks)


def cosine_similarity(a, b):
    """a [..., D], b [..., D] -> cosine similarity (ObjectMatcher.cc:877)."""
    num = jnp.sum(a * b, axis=-1)
    den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1)
    return num / jnp.maximum(den, 1e-12)
