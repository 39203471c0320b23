"""Pallas TPU kernel: tiled 256-bit Hamming distance matrix.

MEASUREMENT (v5e, 4096x1024): XLA's fused lowering of
features/matching.hamming_matrix runs at 0.84 ms vs 2.7 ms for this tiled
kernel — XLA already keeps the XOR+popcount+reduce fused without
materializing the [M, N, 8] tensor, and Mosaic's 8-wide minor dim tiles
poorly. The hot paths therefore keep the XLA formulation
(hamming_matrix_auto below returns it); this kernel stays as the tiling
scaffold for a future fused distance+top2 kernel where the win is real
(skipping the [M, N] distance write entirely).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hamming_kernel(a_ref, b_ref, out_ref):
    a = a_ref[...]                      # [TM, 8] uint32
    b = b_ref[...]                      # [TN, 8] uint32
    x = a[:, None, :] ^ b[None, :, :]   # [TM, TN, 8]
    # Mosaic can't reduce unsigned ints: popcount (<=32) fits int32 exactly
    pc = jax.lax.population_count(x).astype(jnp.int32)
    out_ref[...] = jnp.sum(pc, axis=-1)


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_n", "interpret"))
def hamming_matrix_pallas(desc_a, desc_b, tile_m: int = 256,
                          tile_n: int = 256, interpret: bool = False):
    """[M, 8] u32 x [N, 8] u32 -> [M, N] int32 (M, N multiples of tiles)."""
    M = desc_a.shape[0]
    N = desc_b.shape[0]
    tile_m = min(tile_m, M)
    tile_n = min(tile_n, N)
    pad_m = (-M) % tile_m
    pad_n = (-N) % tile_n
    if pad_m:
        desc_a = jnp.pad(desc_a, ((0, pad_m), (0, 0)))
    if pad_n:
        desc_b = jnp.pad(desc_b, ((0, pad_n), (0, 0)))
    Mp, Np = desc_a.shape[0], desc_b.shape[0]

    out = pl.pallas_call(
        _hamming_kernel,
        grid=(Mp // tile_m, Np // tile_n),
        in_specs=[
            pl.BlockSpec((tile_m, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 8), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.int32),
        interpret=interpret,
    )(desc_a, desc_b)
    return out[:M, :N]


def hamming_matrix_auto(desc_a, desc_b):
    """XLA everywhere (measured faster than the tiled kernel; see above)."""
    x = desc_a[:, None, :] ^ desc_b[None, :, :]
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)
