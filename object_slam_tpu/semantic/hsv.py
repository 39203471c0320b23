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


def _bin_onehot(hsv_img):
    """[H, W, 3] (OpenCV ranges) -> [H*W, 94] one-hot bin membership,
    bf16 (exact for 0/1). Bin edges follow cv::calcHist with ranges
    [0,180) / [0,256) / [0,256)."""
    h = jnp.clip((hsv_img[..., 0].reshape(-1) / 180.0 * H_BINS)
                 .astype(jnp.int32), 0, H_BINS - 1)
    s = jnp.clip((hsv_img[..., 1].reshape(-1) / 256.0 * S_BINS)
                 .astype(jnp.int32), 0, S_BINS - 1)
    v = jnp.clip((hsv_img[..., 2].reshape(-1) / 256.0 * V_BINS)
                 .astype(jnp.int32), 0, V_BINS - 1)
    oh = jnp.concatenate([
        (h[:, None] == jnp.arange(H_BINS)[None]),
        (s[:, None] == jnp.arange(S_BINS)[None]),
        (v[:, None] == jnp.arange(V_BINS)[None])], axis=-1)
    return oh.astype(jnp.bfloat16)


def masked_hsv_histogram(hsv_img, mask):
    """hsv_img [H, W, 3] (OpenCV ranges), mask [H, W] bool -> [94] L1-normed."""
    return batched_histograms_hsv(hsv_img, mask[None])[0]


def batched_histograms_hsv(hsv_img, masks):
    """hsv image variant of batched_histograms: [H, W, 3] + [I, H, W].

    MXU formulation: masks [I, HW] x bin-one-hot [HW, 94] as ONE matmul
    (f32 accumulation — exact integer counts below 2^24). The previous
    per-instance segment_sum lowering was 16 x 3 serialized scatters over
    307k pixels — 20.9 ms/frame of the VGA objects-on frame build on the
    v5e chip vs ~1 ms for the matmul (measured round 3)."""
    I = masks.shape[0]
    oh = _bin_onehot(hsv_img)                              # [HW, 94]
    mf = masks.reshape(I, -1).astype(jnp.bfloat16)         # [I, HW]
    # DEFAULT precision: {0,1}-valued bf16 inputs are exact in one MXU
    # pass (see covisibility(); the global "highest" default targets f32
    # geometry matmuls)
    hist = jnp.dot(mf, oh, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.DEFAULT)
    return hist / jnp.maximum(jnp.sum(hist, axis=-1, keepdims=True), 1e-9)


def batched_histograms(rgb_img, masks):
    """rgb [H, W, 3], masks [I, H, W] bool -> [I, 94]."""
    return batched_histograms_hsv(rgb_to_hsv_cv(rgb_img), masks)


def cosine_similarity(a, b):
    """a [..., D], b [..., D] -> cosine similarity (ObjectMatcher.cc:877)."""
    num = jnp.sum(a * b, axis=-1)
    den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1)
    return num / jnp.maximum(den, 1e-12)
