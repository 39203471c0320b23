"""Image pyramid with static per-level shapes.

Parity with `ORBextractor::ComputePyramid` (`ORBextractor.cc:1107`): 8
levels, scale factor 1.2. Level shapes are Python-static (derived from the
config) so every downstream kernel compiles once.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp


def level_shapes(h: int, w: int, n_levels: int, scale: float) -> List[Tuple[int, int]]:
    return [(max(int(round(h / scale ** l)), 16), max(int(round(w / scale ** l)), 16))
            for l in range(n_levels)]


def level_scales(n_levels: int, scale: float) -> jnp.ndarray:
    return jnp.asarray([scale ** l for l in range(n_levels)], jnp.float32)


def build_pyramid(img, n_levels: int, scale: float):
    """img [H, W] float32 in [0, 255] -> list of [Hl, Wl] arrays."""
    h, w = img.shape
    shapes = level_shapes(h, w, n_levels, scale)
    out = [img]
    cur = img
    for l in range(1, n_levels):
        cur = jax.image.resize(cur, shapes[l], method='linear')
        out.append(cur)
    return out


def gaussian_blur(img, sigma: float = 2.0, radius: int = 3):
    """Separable Gaussian blur (reference blurs each level with 7x7 sigma 2
    before computing descriptors, ORBextractor.cc:1082-1105)."""
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    img = img[None, None]  # NCHW
    kh = k.reshape(1, 1, 1, -1)
    kv = k.reshape(1, 1, -1, 1)
    img = jax.lax.conv_general_dilated(img, kh, (1, 1), 'SAME')
    img = jax.lax.conv_general_dilated(img, kv, (1, 1), 'SAME')
    return img[0, 0]
