"""Pallas TPU kernel: batched keypoint patch extraction.

XLA's generic gather is the profiled bottleneck of ORB extraction on TPU
(~12 ms for 1024 x 31x31 patch gathers vs 0.07 ms for the dense FAST
sweep). This kernel replaces per-element gathers with one DMA per
keypoint: scalar-prefetched (y, x) corners drive dynamic-slice copies of
P x P windows from the HBM-resident image into VMEM output blocks — the
DMA engines do strided window reads at line rate.

Downstream consumers then run DENSE math on the [N, P, P] patch tensor:
IC-angle moments become masked reductions, and steered-BRIEF sampling
becomes a one-hot matmul on the MXU (features/extractor.py).

Falls back to interpret mode off-TPU (CPU tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _patch_kernel(y_ref, x_ref, img_ref, out_ref, sem):
    i = pl.program_id(0)
    # row offsets are pre-aligned to the sublane tiling (8) on the host;
    # the residual shift is applied densely outside the kernel.
    y0 = pl.multiple_of(y_ref[i], 8)
    x0 = pl.multiple_of(x_ref[i], 128)
    Pr = out_ref.shape[1]
    Pc = out_ref.shape[2]
    cp = pltpu.make_async_copy(
        img_ref.at[pl.ds(y0, Pr), pl.ds(x0, Pc)],
        out_ref.at[0],
        sem)
    cp.start()
    cp.wait()


@functools.partial(jax.jit, static_argnames=("patch", "interpret"))
def extract_patches(img, ys, xs, patch: int = 32, interpret: bool = False):
    """img [H, W] f32; ys, xs [N] int32 (window corners, clamped inside).

    Returns [N, patch, patch] f32 windows img[y:y+patch, x:x+patch].
    The DMA reads an 8-row-aligned (patch+8)-tall window; the per-keypoint
    row shift (0..7) resolves as an 8-way dense select afterwards.
    """
    H, W = img.shape
    N = ys.shape[0]
    y0 = jnp.clip(ys, 0, max(H - patch, 0)).astype(jnp.int32)
    x0 = jnp.clip(xs, 0, max(W - patch, 0)).astype(jnp.int32)
    # TPU DMA tiling: row offsets 8-aligned, column offsets/extents
    # 128-aligned. Copy an aligned [patch+8, wide] superset window; the
    # residual shifts resolve densely (8-way row select + one-hot column
    # contraction on the MXU) — no gathers anywhere.
    y0a = (y0 // 8) * 8
    x0a = (x0 // 128) * 128
    tall = patch + 8
    wide = ((patch + 127) // 128 + 1) * 128   # covers x-shift 0..127
    img_p = jnp.pad(img, ((0, tall), (0, wide)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, tall, wide),
                               lambda i, y, x: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    tall_out = pl.pallas_call(
        _patch_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, tall, wide), img.dtype),
        interpret=interpret,
    )(y0a, x0a, img_p)

    # row shift: 8-way select
    shift = y0 - y0a                      # [N] in 0..7
    band = jnp.zeros((N, patch, wide), img.dtype)
    for s in range(8):
        sel = (shift == s)[:, None, None]
        band = jnp.where(sel, tall_out[:, s:s + patch, :], band)
    # column shift: one-hot contraction out[n,r,c] = band[n,r,xs+c]
    xs_rel = (x0 - x0a)[:, None] + jnp.arange(patch)[None, :]   # [N, patch]
    onehot = (jnp.arange(wide)[None, :, None] == xs_rel[:, None, :])
    return jnp.einsum('nrw,nwc->nrc', band, onehot.astype(img.dtype),
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)


def extract_patches_auto(img, ys, xs, patch: int = 32):
    """Backend-aware wrapper: compiled Pallas on TPU; the semantically
    identical XLA gather elsewhere (CPU tests — interpret-mode Pallas would
    crawl through the grid in Python)."""
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if on_tpu:
        return extract_patches(img, ys, xs, patch=patch, interpret=False)
    return extract_patches_xla(img, ys, xs, patch=patch)


def extract_patches_xla(img, ys, xs, patch: int = 32):
    """Reference XLA-gather implementation (for correctness tests)."""
    H, W = img.shape
    y0 = jnp.clip(ys, 0, H - patch)
    x0 = jnp.clip(xs, 0, W - patch)
    d = jnp.arange(patch)
    yy = y0[:, None, None] + d[None, :, None]
    xx = x0[:, None, None] + d[None, None, :]
    return img[yy, xx]
