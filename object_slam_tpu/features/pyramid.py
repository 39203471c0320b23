"""Image pyramid with static per-level shapes.

Parity with `ORBextractor::ComputePyramid` (`ORBextractor.cc:1107`): 8
levels, scale factor 1.2. Level shapes are Python-static (derived from the
config) so every downstream kernel compiles once.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


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
    before computing descriptors, ORBextractor.cc:1082-1105).

    Implemented as shift-and-accumulate on the VPU: a single-channel conv
    hits the MXU's worst case (channels=1), ~30x slower than these 14
    rolled adds.
    """
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k = k / k.sum()
    out = jnp.zeros_like(img)
    for i, w in enumerate(k):
        out = out + float(w) * jnp.roll(img, radius - i, axis=1)
    img2 = out
    out = jnp.zeros_like(img)
    for i, w in enumerate(k):
        out = out + float(w) * jnp.roll(img2, radius - i, axis=0)
    return out
