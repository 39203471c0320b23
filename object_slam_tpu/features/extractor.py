"""ORB keypoint extraction: pyramid FAST + spatial selection + rBRIEF.

Parity with `ORBextractor::operator()` (`ORBextractor.cc:1043-1105`): an
8-level pyramid, a per-level keypoint budget following a geometric series
(`ORBextractor.cc:435-446`), spatially uniform selection (the reference's
quadtree `DistributeOctTree`, `ORBextractor.cc:539-763`), intensity-centroid
orientation (`:454-479`) and 256-bit steered-BRIEF descriptors (`:448-450`).

TPU redesign:
  * FAST responses are dense maps per level (features/fast.py).
  * Quadtree distribution -> per-cell top-k: response maps fold into
    [rows, cols, cell*cell] blocks; argmax per cell + global top-n_l keeps
    the same spatial-uniformity contract with static shapes.
  * The descriptor pattern is a decorrelated pattern learned from scratch
    with the rBRIEF construction (scripts/train_brief_pattern.py) — the
    same recipe that produced the reference's bit_pattern_31, relearned on
    our own corpus rather than copied.
  * Orientation + descriptors evaluate for all N keypoints as one batched
    gather (31x31 patches) + sign comparisons -> bit-packed uint32[8].

Output is a fixed-size keypoint slab (config.caps.n_kp) with a validity
mask; coordinates are level-0 (scaled-up) pixels as in the reference.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from object_slam_tpu.features import fast as fast_mod
from object_slam_tpu.features import pyramid as pyr_mod
from object_slam_tpu.ops.patch_pallas import extract_patches_auto


class Keypoints(NamedTuple):
    """Fixed-size keypoint slab; invalid entries are masked.

    uv: [N, 2] level-0 pixel coords (x, y), distorted (raw image frame).
    response: [N]; angle: [N] radians; level: [N] int32; desc: [N, 8] uint32.
    valid: [N] bool.
    """

    uv: jnp.ndarray
    response: jnp.ndarray
    angle: jnp.ndarray
    level: jnp.ndarray
    desc: jnp.ndarray
    valid: jnp.ndarray

    @property
    def n(self):
        return self.uv.shape[0]


_PATTERN_FILE = os.path.join(os.path.dirname(__file__), "brief_pattern.npy")


def make_pattern(n_bits: int = 256, patch_radius: int = 13, seed: int = 7):
    """BRIEF test pattern: [n_bits, 4] (y1, x1, y2, x2).

    Prefers the learned decorrelated pattern (rBRIEF construction — the
    same recipe as the reference's bit_pattern_31, ORBextractor.cc:448-450,
    re-learned from scratch by scripts/train_brief_pattern.py). Falls back
    to a seeded Gaussian pattern when the trained file is absent; the
    random pattern's correlated bits measurably cost frame-to-frame match
    retention (BENCHMARKS.md round-1 limitation)."""
    if os.path.exists(_PATTERN_FILE):
        pat = np.load(_PATTERN_FILE)
        if pat.shape == (n_bits, 4):
            return jnp.asarray(pat, jnp.float32)
    rng = np.random.RandomState(seed)
    sigma = patch_radius / 2.0
    pts = np.clip(rng.randn(n_bits, 4) * sigma, -patch_radius, patch_radius)
    return jnp.asarray(pts, jnp.float32)


def _level_budgets(n_features: int, n_levels: int, scale: float):
    """Geometric per-level budget (ORBextractor.cc:435-446)."""
    inv = 1.0 / scale
    first = n_features * (1 - inv) / (1 - inv ** n_levels)
    budgets = [int(round(first * inv ** l)) for l in range(n_levels)]
    budgets[-1] = max(n_features - sum(budgets[:-1]), 0)
    return budgets


def _cell_topk(resp, cell: int, k_per_cell: int):
    """Per-cell top-k over a [H, W] response map.

    Returns (scores [C], ys [C], xs [C]) with C = rows*cols*k_per_cell.
    k iterations of argmax+mask — lax.top_k sorts the whole cell axis,
    ~5x slower on TPU for k <= 4.

    Selection determinism: the ranking key is QUANTIZED to quarter-
    intensity steps. FAST scores at upper pyramid levels inherit resize
    interpolation floats, so +-1-ulp input noise flips near-tie argmax
    winners and the whole downstream trajectory with them (measured r2:
    a 30-65 mm ATE band on repeat VGA runs). On the lattice, near-ties
    become exact ties, and argmax/top_k break exact ties by the lowest
    linear index — i.e. lexicographic (response, y, x). The reference is
    deterministic the same way (single-threaded extraction order).
    """
    h, w = resp.shape
    rows, cols = h // cell, w // cell
    r = jnp.floor(resp[:rows * cell, :cols * cell] * 4.0) * 0.25
    r = r.reshape(rows, cell, cols, cell).transpose(0, 2, 1, 3)
    r = r.reshape(rows, cols, cell * cell)
    vals_l, idx_l = [], []
    for _ in range(k_per_cell):
        idx = jnp.argmax(r, axis=-1)
        val = jnp.take_along_axis(r, idx[..., None], axis=-1)[..., 0]
        r = jnp.where(jnp.arange(cell * cell)[None, None, :] == idx[..., None],
                      -jnp.inf, r)
        vals_l.append(val)
        idx_l.append(idx)
    vals = jnp.stack(vals_l, axis=-1)                 # [rows, cols, k]
    idx = jnp.stack(idx_l, axis=-1)
    cy = idx // cell
    cx = idx % cell
    base_y = (jnp.arange(rows) * cell)[:, None, None]
    base_x = (jnp.arange(cols) * cell)[None, :, None]
    ys = (base_y + cy).reshape(-1)
    xs = (base_x + cx).reshape(-1)
    return vals.reshape(-1), ys, xs


PATCH = 32          # Pallas window size; keypoint sits at (HALF, HALF)
HALF = 15
N_ANGLE_BINS = 64   # steered-BRIEF rotation quantization (5.6 deg)


def _ic_angle_from_patches(patches, radius: int = 15,
                           stability_tau: float = 0.02):
    """Intensity-centroid orientation from [N, PATCH, PATCH] windows whose
    keypoint sits at (HALF, HALF). Dense masked moments — the circular mask
    mirrors ORBextractor's umax table (ORBextractor.cc:454-479).

    Stability gate: when the centroid magnitude is small relative to the
    patch mass, the IC angle is noise (near-symmetric patch) and flips
    wildly between frames, scrambling the steered descriptor — those
    keypoints fall back to the deterministic upright orientation. (The
    reference has the same flip-prone tail; stabilizing it is strictly
    better for frame-to-frame retention.)
    """
    d = jnp.arange(PATCH, dtype=patches.dtype) - HALF
    dy = d[:, None]
    dx = d[None, :]
    circ = (dy * dy + dx * dx) <= radius * radius
    pm = patches * circ[None]
    m10 = jnp.sum(pm * dx[None], axis=(1, 2))
    m01 = jnp.sum(pm * dy[None], axis=(1, 2))
    mass = jnp.sum(jnp.abs(pm), axis=(1, 2)) * radius
    mag = jnp.sqrt(m10 * m10 + m01 * m01)
    ang = jnp.arctan2(m01, m10)
    return jnp.where(mag > stability_tau * mass, ang, 0.0)


def make_brief_matrix(pattern, n_bins: int = N_ANGLE_BINS):
    """Precompute the binned steered-BRIEF difference operator.

    For each rotation bin b, each bit j compares two rotated pattern
    points; as a linear map over the flattened 32x32 patch this is a
    +-1 two-hot column. Stacked over bins: D [PATCH*PATCH, n_bins*256],
    so ALL bits for ALL rotations evaluate as one MXU matmul; a per-
    keypoint one-hot bin contraction then selects its rotation — the
    gather-free formulation of rotated BRIEF sampling.
    """
    pat = np.asarray(pattern)                     # [256, 4] y1 x1 y2 x2
    D = np.zeros((PATCH * PATCH, n_bins * 256), np.float32)
    for b in range(n_bins):
        th = 2.0 * np.pi * b / n_bins
        c, s = np.cos(th), np.sin(th)
        for j in range(256):
            y1, x1, y2, x2 = pat[j]
            r1y = int(round(HALF + s * x1 + c * y1))
            r1x = int(round(HALF + c * x1 - s * y1))
            r2y = int(round(HALF + s * x2 + c * y2))
            r2x = int(round(HALF + c * x2 - s * y2))
            r1y = min(max(r1y, 0), PATCH - 1)
            r1x = min(max(r1x, 0), PATCH - 1)
            r2y = min(max(r2y, 0), PATCH - 1)
            r2x = min(max(r2x, 0), PATCH - 1)
            # bit = I(p1) < I(p2)  <=>  I(p2) - I(p1) > 0
            D[r1y * PATCH + r1x, b * 256 + j] -= 1.0
            D[r2y * PATCH + r2x, b * 256 + j] += 1.0
    return jnp.asarray(D, jnp.bfloat16)


def _brief_from_patches(patches, angles, D):
    """patches [N, PATCH, PATCH] (blurred), angles [N] -> [N, 8] uint32."""
    n = patches.shape[0]
    n_bins = D.shape[1] // 256
    flat = patches.reshape(n, PATCH * PATCH).astype(jnp.bfloat16)
    # DEFAULT precision: the inputs are ALREADY bf16 by design (the bit
    # threshold tolerates the 0.2% intensity rounding; measured r3) — the
    # package-wide "highest" default targets f32 geometry matmuls and
    # would only force this hot product into a multi-pass upcast
    vals = jnp.dot(flat, D, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.DEFAULT)
    vals = vals.reshape(n, n_bins, 256)
    bin_idx = jnp.mod(jnp.round(angles / (2.0 * jnp.pi) * n_bins)
                      .astype(jnp.int32), n_bins)
    onehot = (bin_idx[:, None] == jnp.arange(n_bins)[None, :])
    diff = jnp.einsum('nbj,nb->nj', vals, onehot.astype(jnp.float32))
    bits = (diff > 0).astype(jnp.uint32)
    words = bits.reshape(n, 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(words << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


def _ic_angle(img, ys, xs, radius: int = 15):
    """Intensity-centroid orientation for keypoints at integer (ys, xs).

    Batched gather of (2r+1)^2 patches; circular mask as in ORBextractor's
    umax table (ORBextractor.cc:454-479).
    """
    d = jnp.arange(-radius, radius + 1)
    dy = d[:, None]
    dx = d[None, :]
    circ = (dy * dy + dx * dx) <= radius * radius     # [P, P]
    h, w = img.shape
    yy = jnp.clip(ys[:, None, None] + dy[None], 0, h - 1)
    xx = jnp.clip(xs[:, None, None] + dx[None], 0, w - 1)
    patches = img[yy, xx] * circ[None]                # [N, P, P]
    m10 = jnp.sum(patches * dx[None], axis=(1, 2))
    m01 = jnp.sum(patches * dy[None], axis=(1, 2))
    return jnp.arctan2(m01, m10)


def _brief_descriptors(img, ys, xs, angles, pattern):
    """Steered BRIEF: rotate the pattern by each keypoint's angle, compare
    blurred intensities, pack 256 bits into uint32[8]."""
    c, s = jnp.cos(angles), jnp.sin(angles)           # [N]
    y1, x1, y2, x2 = pattern[:, 0], pattern[:, 1], pattern[:, 2], pattern[:, 3]

    def rot(py, px):
        ry = s[:, None] * px[None] + c[:, None] * py[None]
        rx = c[:, None] * px[None] - s[:, None] * py[None]
        return ry, rx                                  # [N, 256]

    r1y, r1x = rot(y1, x1)
    r2y, r2x = rot(y2, x2)
    h, w = img.shape

    def sample(ry, rx):
        yy = jnp.clip(jnp.round(ys[:, None] + ry).astype(jnp.int32), 0, h - 1)
        xx = jnp.clip(jnp.round(xs[:, None] + rx).astype(jnp.int32), 0, w - 1)
        return img[yy, xx]

    bits = (sample(r1y, r1x) < sample(r2y, r2x)).astype(jnp.uint32)  # [N, 256]
    n = bits.shape[0]
    words = bits.reshape(n, 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(words << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


class OrbExtractor:
    """Compiled ORB pipeline for a fixed image geometry.

    Usage: ex = OrbExtractor(cfg); kps = ex(image_f32)  # [H, W] grayscale
    """

    def __init__(self, cfg, height: int | None = None, width: int | None = None):
        self.cfg = cfg
        o = cfg.orb
        self.h = height or cfg.camera.height
        self.w = width or cfg.camera.width
        self.n_kp = cfg.caps.n_kp
        self.shapes = pyr_mod.level_shapes(self.h, self.w, o.n_levels,
                                           o.scale_factor)
        self.budgets = _level_budgets(o.n_features, o.n_levels, o.scale_factor)
        # rescale budgets to fill the slab exactly
        total = sum(self.budgets)
        if total < self.n_kp:
            self.budgets[0] += self.n_kp - total
        self.pattern = make_pattern()
        self.brief_D = make_brief_matrix(self.pattern)
        self._fn = jax.jit(self._extract)

    def __call__(self, img) -> Keypoints:
        return self._fn(img)

    def _extract(self, img) -> Keypoints:
        o = self.cfg.orb
        levels = pyr_mod.build_pyramid(img, o.n_levels, o.scale_factor)
        outs = []
        for l, lvl_img in enumerate(levels):
            n_l = self.budgets[l]
            if n_l <= 0:
                continue
            resp, raw_score = fast_mod.detect_dual(
                lvl_img, float(o.min_th_fast), float(o.ini_th_fast),
                o.fast_arc_len, border=o.edge_threshold)

            cell = max(o.cell_size // max(int(o.scale_factor ** l * 0.75), 1), 8)
            k_per_cell = max(1, min(4, math.ceil(
                n_l / max((lvl_img.shape[0] // cell) * (lvl_img.shape[1] // cell), 1))))
            scores, ys, xs = _cell_topk(resp, cell, k_per_cell)
            vals, sel = jax.lax.top_k(scores, min(n_l, scores.shape[0]))
            ys, xs = ys[sel], xs[sel]
            valid = vals > 0

            blurred = pyr_mod.gaussian_blur(lvl_img)
            # Pallas DMA patch extraction (ops/patch_pallas.py) feeds both
            # the orientation moments and the matmul-BRIEF — no gathers.
            p_raw = extract_patches_auto(lvl_img, ys - HALF, xs - HALF, PATCH)
            p_blur = extract_patches_auto(blurred, ys - HALF, xs - HALF, PATCH)
            ang = _ic_angle_from_patches(p_raw, radius=o.half_patch)
            desc = _brief_from_patches(p_blur, ang, self.brief_D)
            # subpixel corner localization (parabola on the score surface):
            # integer corners quantize uv to +-0.5 px level-0 * scale
            dy, dx = fast_mod.subpixel_refine(raw_score, ys, xs)
            scale = o.scale_factor ** l
            uv = jnp.stack([(xs.astype(jnp.float32) + dx) * scale,
                            (ys.astype(jnp.float32) + dy) * scale], -1)
            outs.append(Keypoints(
                uv=uv,
                response=jnp.where(valid, vals, 0.0),
                angle=ang,
                level=jnp.full(ys.shape, l, jnp.int32),
                desc=desc,
                valid=valid))

        kp = Keypoints(*[jnp.concatenate([getattr(x, f) for x in outs], axis=0)
                         for f in Keypoints._fields])
        # pad/trim to the static slab size
        n = kp.uv.shape[0]
        if n < self.n_kp:
            pad = self.n_kp - n

            def padf(a):
                return jnp.concatenate(
                    [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], 0)

            kp = Keypoints(*[padf(getattr(kp, f)) for f in Keypoints._fields])
        elif n > self.n_kp:
            # keep the strongest n_kp overall
            _, sel = jax.lax.top_k(jnp.where(kp.valid, kp.response, -1.0),
                                   self.n_kp)
            kp = Keypoints(*[getattr(kp, f)[sel] for f in Keypoints._fields])
        return kp

    def scale_factors(self):
        o = self.cfg.orb
        return jnp.asarray([o.scale_factor ** l for l in range(o.n_levels)],
                           jnp.float32)

    def inv_level_sigma2(self):
        sf = np.asarray([self.cfg.orb.scale_factor ** l
                         for l in range(self.cfg.orb.n_levels)])
        return jnp.asarray(1.0 / (sf * sf), jnp.float32)
