"""RANSAC Sim3/SE3 estimation between two keyframes' matched map points.

Capability parity with `Sim3Solver` (`Sim3Solver.cc:140-365`): the reference
iterates Horn's closed-form absolute orientation on random 3-point samples
and checks bidirectional reprojection inliers. TPU redesign: all T trials'
Horn problems solve as one batched 4x4 eigendecomposition; both directions'
reprojection checks evaluate as [T, N] matrices in one shot.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from object_slam_tpu.geometry.horn import horn_align
from object_slam_tpu.geometry.camera import Intrinsics
from object_slam_tpu.solvers import ransac


class Sim3Result(NamedTuple):
    T12: jnp.ndarray     # [4, 4] rotation+translation, frame2 -> frame1
    s12: jnp.ndarray     # scalar scale
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray
    ok: jnp.ndarray


def sim3_ransac(key, K: Intrinsics, pc1, pc2, valid,
                inv_sigma2_1=None, inv_sigma2_2=None,
                fix_scale: bool = True, n_trials: int = 256,
                chi2_th1: float = 9.210, chi2_th2: float = 9.210,
                min_inliers: int = 20) -> Sim3Result:
    """pc1, pc2: [N, 3] matched points in camera frames 1 and 2 (the
    reference feeds camera-frame coordinates, Sim3Solver.cc:60-76).

    Solves p1 ~ s12 R12 p2 + t12 and gates by bidirectional reprojection
    chi2 (th = 9.21, 2 dof 99%, as Sim3Solver.cc:83-88).
    """
    N = pc1.shape[0]
    if inv_sigma2_1 is None:
        inv_sigma2_1 = jnp.ones(N, pc1.dtype)
    if inv_sigma2_2 is None:
        inv_sigma2_2 = jnp.ones(N, pc1.dtype)

    idx = ransac.sample_minimal_sets(key, N, valid, n_trials, 3)
    T, s = horn_align(pc2[idx], pc1[idx], fix_scale=fix_scale)  # [T,4,4],[T]

    def reproj(p):  # camera-frame -> pixels, [.., N, 3] -> [.., N, 2]
        z = jnp.maximum(p[..., 2], 1e-6)
        return jnp.stack([K.fx * p[..., 0] / z + K.cx,
                          K.fy * p[..., 1] / z + K.cy], -1)

    # direction 1: project s R p2 + t into camera 1
    p2in1 = s[:, None, None] * jnp.einsum('tij,nj->tni', T[:, :3, :3], pc2) \
        + T[:, None, :3, 3]
    uv1 = reproj(pc1)                     # [N, 2] measured
    e1 = jnp.sum((reproj(p2in1) - uv1[None]) ** 2, -1) * inv_sigma2_1[None]

    # direction 2: inverse similarity (sR, t)^-1 p1 = R^T (p1 - t) / s
    p1in2 = jnp.einsum('tji,tnj->tni', T[:, :3, :3],
                       pc1[None] - T[:, None, :3, 3]) / s[:, None, None]
    uv2 = reproj(pc2)
    e2 = jnp.sum((reproj(p1in2) - uv2[None]) ** 2, -1) * inv_sigma2_2[None]

    inl = (e1 < chi2_th1) & (e2 < chi2_th2) & valid[None]
    scores = jnp.sum(inl, axis=-1)
    best = jnp.argmax(scores)

    # refine: weighted Horn on the winner's inliers
    w = inl[best].astype(pc1.dtype)
    Tr, sr = horn_align(pc2, pc1, weights=w, fix_scale=fix_scale)
    # re-gate at the refined transform
    p2in1 = sr * (pc2 @ Tr[:3, :3].T) + Tr[:3, 3]
    e1r = jnp.sum((reproj(p2in1) - uv1) ** 2, -1) * inv_sigma2_1
    p1in2 = ((pc1 - Tr[:3, 3]) @ Tr[:3, :3]) / sr
    e2r = jnp.sum((reproj(p1in2) - uv2) ** 2, -1) * inv_sigma2_2
    inl_r = (e1r < chi2_th1) & (e2r < chi2_th2) & valid
    n = jnp.sum(inl_r.astype(jnp.int32))
    return Sim3Result(T12=Tr, s12=sr, inliers=inl_r, n_inliers=n,
                      ok=n >= min_inliers)
