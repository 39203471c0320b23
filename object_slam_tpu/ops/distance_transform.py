"""Nearest-mask-pixel maps (feature transform) via jump flooding.

The reference builds a KD-tree over every mask pixel per object per frame to
answer "nearest mask pixel to (u, v)" queries in the semantic optimizer
(`ObjectOptimizer.cc:696-713`) — SURVEY.md flags this as a known
inefficiency (the distance transform computed at `ObjectTypes.cc:23` is
never used). TPU redesign: one Jump-Flooding pass per mask produces a dense
[H, W, 2] nearest-seed coordinate map; every later query is a single O(1)
gather. JFA is log2(max(H, W)) rounds of 9-neighbor gather-compare —
fully data-parallel, no trees.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_INF = 1e12


def feature_transform(mask):
    """mask [H, W] bool -> nearest [H, W, 2] float32 (y, x) of the nearest
    True pixel (self if inside the mask). If the mask is empty, coords are
    (-1, -1).
    """
    h, w = mask.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    seed_y = jnp.where(mask, ys, -1.0)
    seed_x = jnp.where(mask, xs, -1.0)

    def dist2(sy, sx):
        d = (sy - ys) ** 2 + (sx - xs) ** 2
        return jnp.where(sy < 0, _INF, d)

    n_steps = max(int(math.ceil(math.log2(max(h, w)))), 1)
    steps = [max(h, w) >> (i + 1) for i in range(n_steps)]
    steps = jnp.asarray([s for s in steps if s >= 1] + [1], jnp.int32)

    def round_body(i, state):
        sy, sx = state
        step = steps[i]
        best_d = dist2(sy, sx)
        for dy_s, dx_s in ((-1, -1), (-1, 0), (-1, 1), (0, -1),
                           (0, 1), (1, -1), (1, 0), (1, 1)):
            cy = jnp.roll(sy, (dy_s * step, dx_s * step), axis=(0, 1))
            cx = jnp.roll(sx, (dy_s * step, dx_s * step), axis=(0, 1))
            # rolled-in wrap pixels are invalid candidates at borders;
            # their seeds are still genuine seed coords, so the distance
            # test alone keeps correctness (a wrong far seed never wins
            # over the true nearest which propagates separately).
            cd = dist2(cy, cx)
            take = cd < best_d
            sy = jnp.where(take, cy, sy)
            sx = jnp.where(take, cx, sx)
            best_d = jnp.where(take, cd, best_d)
        return sy, sx

    sy, sx = jax.lax.fori_loop(0, steps.shape[0], round_body,
                               (seed_y, seed_x))
    return jnp.stack([sy, sx], axis=-1)


def feature_transform_batch(masks):
    """[I, H, W] bool -> [I, H, W, 2]."""
    return jax.vmap(feature_transform)(masks)


def nearest_mask_pixel(ftmap, uv):
    """ftmap [H, W, 2] (y, x); uv [..., 2] (u=x, v=y) query pixels ->
    nearest mask pixel as (u, v) [..., 2] plus distance [...]."""
    h, w = ftmap.shape[:2]
    yy = jnp.clip(jnp.round(uv[..., 1]).astype(jnp.int32), 0, h - 1)
    xx = jnp.clip(jnp.round(uv[..., 0]).astype(jnp.int32), 0, w - 1)
    near = ftmap[yy, xx]                       # [..., 2] (y, x)
    near_uv = jnp.stack([near[..., 1], near[..., 0]], axis=-1)
    d = jnp.linalg.norm(near_uv - uv, axis=-1)
    d = jnp.where(near[..., 0] < 0, jnp.inf, d)
    return near_uv, d


def nearest_mask_pixel_batched(ftmaps, map_idx, uv):
    """Indexed maps: ftmaps [I, H, W, 2], map_idx [S] int32, uv [S, 2] ->
    (near_uv [S, 2], dist [S]). One fused [S]-element gather — never index
    ftmaps[map_idx] alone (that materializes S full maps; at VGA with
    S=2048 that is a 5 GB tensor)."""
    h, w = ftmaps.shape[1], ftmaps.shape[2]
    yy = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0, h - 1)
    xx = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0, w - 1)
    near = ftmaps[map_idx, yy, xx]                # [S, 2] (y, x)
    near_uv = jnp.stack([near[:, 1], near[:, 0]], axis=-1)
    d = jnp.linalg.norm(near_uv - uv, axis=-1)
    d = jnp.where(near[:, 0] < 0, jnp.inf, d)
    return near_uv, d


def distance_transform(mask):
    """Euclidean distance [H, W] to the nearest True pixel (0 inside)."""
    ft = feature_transform(mask)
    h, w = mask.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    d = jnp.sqrt((ft[..., 0] - ys) ** 2 + (ft[..., 1] - xs) ** 2)
    return jnp.where(ft[..., 0] < 0, jnp.float32(_INF), d)


def erode(mask, half: int):
    """Binary erosion by a (2*half)x(2*half) box — the vectorized form of the
    reference's "all pixels in the 20x20 window are 255" membership test
    (Frame.cc:266-273; half=10). Separable: a box min-window factors into
    two 1-D passes (2x(2h) reads/px instead of (2h)^2 — measurably faster
    at VGA)."""
    m = mask.astype(jnp.float32)
    out = jax.lax.reduce_window(
        m, 1.0, jax.lax.min, (2 * half, 1), (1, 1),
        padding=[(half, half - 1), (0, 0)])
    out = jax.lax.reduce_window(
        out, 1.0, jax.lax.min, (1, 2 * half), (1, 1),
        padding=[(0, 0), (half, half - 1)])
    return out > 0.5
