"""PnP RANSAC for relocalization (3D-2D camera pose from map matches).

Capability parity with the reference's `PnPsolver` (EPnP + RANSAC,
`PnPsolver.cc:67-1022`, used by `Tracking::Relocalization`
`Tracking.cc:1606-1767`). TPU redesign: instead of EPnP's sequential
control-point machinery with early-exit RANSAC, we batch T minimal 6-point
DLT pose hypotheses (one vmapped eigendecomposition each), score all of them
against all correspondences in a single [T, N] reprojection matrix, and
Gauss-Newton-polish the winner on its inliers via the shared pose optimizer.
Same contract: pose + inlier set from noisy 3D-2D matches.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from object_slam_tpu.geometry.camera import Intrinsics
from object_slam_tpu.solvers import ransac
from object_slam_tpu.solvers.pose_opt import PoseObs, pose_optimize


def dlt_pose(pw, xn):
    """Batched 6+ point DLT pose: pw [..., M, 3] world, xn [..., M, 2]
    normalized image coords. Returns Tcw [..., 4, 4] with orthonormal R."""
    M = pw.shape[-2]
    X, Y, Z = pw[..., 0], pw[..., 1], pw[..., 2]
    x, y = xn[..., 0], xn[..., 1]
    zero = jnp.zeros_like(X)
    one = jnp.ones_like(X)
    # rows: [X Y Z 1 0 0 0 0 -xX -xY -xZ -x] and the y-row
    r1 = jnp.stack([X, Y, Z, one, zero, zero, zero, zero,
                    -x * X, -x * Y, -x * Z, -x], -1)
    r2 = jnp.stack([zero, zero, zero, zero, X, Y, Z, one,
                    -y * X, -y * Y, -y * Z, -y], -1)
    A = jnp.concatenate([r1, r2], axis=-2)  # [..., 2M, 12]
    AtA = jnp.swapaxes(A, -1, -2) @ A
    _, v = jnp.linalg.eigh(AtA)
    p = v[..., :, 0]
    P = p.reshape(p.shape[:-1] + (3, 4))
    # Fix sign: cheirality of the centroid
    c = jnp.mean(pw, axis=-2)
    zc = jnp.einsum('...j,...j->...', P[..., 2, :3], c) + P[..., 2, 3]
    P = P * jnp.where(zc < 0, -1.0, 1.0)[..., None, None]
    # Project R onto SO(3), rescale t by the mean singular value
    R = P[..., :3, :3]
    U, S, Vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.zeros_like(R).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0)
    D = D.at[..., 2, 2].set(det)
    Rn = U @ D @ Vt
    scale = jnp.mean(S, axis=-1) * jnp.where(det < 0, -1.0, 1.0)
    t = P[..., :3, 3] / jnp.maximum(jnp.abs(scale), 1e-9)[..., None] * jnp.sign(scale)[..., None]
    T = jnp.zeros(P.shape[:-2] + (4, 4), P.dtype)
    T = T.at[..., :3, :3].set(Rn)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


class PnPResult(NamedTuple):
    Tcw: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray
    ok: jnp.ndarray


def pnp_ransac(key, K: Intrinsics, pw, uv, valid,
               n_trials: int = 256, chi2_th: float = 5.991,
               min_inliers: int = 10, inv_sigma2=None) -> PnPResult:
    """pw [N,3] world points, uv [N,2] undistorted pixels, valid [N].

    Returns the polished pose and inlier mask; ok=False if the best
    hypothesis has < min_inliers.
    """
    if inv_sigma2 is None:
        inv_sigma2 = jnp.ones(uv.shape[0], uv.dtype)
    xn = jnp.stack([(uv[..., 0] - K.cx) / K.fx,
                    (uv[..., 1] - K.cy) / K.fy], -1)
    idx = ransac.sample_minimal_sets(key, pw.shape[0], valid, n_trials, 6)
    T = dlt_pose(pw[idx], xn[idx])                        # [T, 4, 4]

    # score: [T, N] reprojection chi2
    pc = jnp.einsum('tij,nj->tni', T[:, :3, :3], pw) + T[:, None, :3, 3]
    z = pc[..., 2]
    u = K.fx * pc[..., 0] / jnp.maximum(z, 1e-6) + K.cx
    v = K.fy * pc[..., 1] / jnp.maximum(z, 1e-6) + K.cy
    chi2 = ((u - uv[None, :, 0]) ** 2 + (v - uv[None, :, 1]) ** 2) * inv_sigma2[None, :]
    inl = (chi2 < chi2_th) & (z > 0) & valid[None, :]
    scores = jnp.sum(inl, axis=-1)
    best = jnp.argmax(scores)
    T0, inl0 = T[best], inl[best]

    # polish with the shared GN pose optimizer on the inlier set
    obs = PoseObs(uv=uv, ur=jnp.full(uv.shape[0], -1.0, uv.dtype),
                  pw=pw, inv_sigma2=inv_sigma2, valid=inl0)
    Tp, inl_final, n = pose_optimize(K, T0, obs, rounds=2, iters_per_round=5,
                                     chi2_mono=chi2_th)
    return PnPResult(Tcw=Tp, inliers=inl_final, n_inliers=n,
                     ok=scores[best] >= min_inliers)
