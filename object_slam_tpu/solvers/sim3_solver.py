"""RANSAC Sim3/SE3 estimation between two keyframes' matched map points.

Capability parity with `Sim3Solver` (`Sim3Solver.cc:140-365`): the reference
iterates Horn's closed-form absolute orientation on random 3-point samples
and checks bidirectional reprojection inliers. TPU redesign: all T trials'
Horn problems solve as one batched 4x4 eigendecomposition; both directions'
reprojection checks evaluate as [T, N] matrices in one shot.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from object_slam_tpu.geometry import sim3
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


def sim3_gn_refine(K: Intrinsics, pc1, pc2, valid, T12, s12,
                   inv_sigma2_1=None, inv_sigma2_2=None,
                   fix_scale: bool = True, chi2_th: float = 10.0,
                   iters1: int = 5, iters2: int = 10):
    """Gauss-Newton refinement of a Sim3 with bidirectional projection
    residuals — capability parity with `Optimizer::OptimizeSim3`
    (`Optimizer.cc:1046+`): EdgeSim3ProjectXYZ + EdgeInverseSim3ProjectXYZ
    pairs with Huber(δ=√10), 5 iterations, hard χ²>th2 pruning of both
    directions of an outlier pair, then 10 more iterations on survivors.

    TPU redesign: the per-edge g2o graph collapses to one 7-parameter GN
    on the Sim3 tangent; the [N, 4]-residual Jacobian comes from one
    forward-mode pass (jacfwd over the 7-vector), and the Huber/χ² edge
    bookkeeping is masked IRLS.

    Returns (T12, s12, inliers [N] bool, n_inliers).
    """
    N = pc1.shape[0]
    dt = pc1.dtype
    if inv_sigma2_1 is None:
        inv_sigma2_1 = jnp.ones(N, dt)
    if inv_sigma2_2 is None:
        inv_sigma2_2 = jnp.ones(N, dt)

    uv1 = _project(K, pc1)
    uv2 = _project(K, pc2)

    def residuals(xi, T, s):
        dT, ds = sim3.exp(xi)
        Tc, sc = sim3.compose(dT, ds, T, s)
        p2in1 = sc * (pc2 @ Tc[:3, :3].T) + Tc[:3, 3]
        r1 = (_project(K, p2in1) - uv1) * jnp.sqrt(inv_sigma2_1)[:, None]
        p1in2 = ((pc1 - Tc[:3, 3]) @ Tc[:3, :3]) / sc
        r2 = (_project(K, p1in2) - uv2) * jnp.sqrt(inv_sigma2_2)[:, None]
        return jnp.concatenate([r1, r2], axis=-1)   # [N, 4]

    jac = jax.jacfwd(residuals)
    zero = jnp.zeros((7,), dt)
    delta2 = chi2_th  # Huber δ² (δ=√10 in the reference)

    def gn_step(carry, inl):
        T, s = carry
        r = residuals(zero, T, s)                    # [N, 4]
        J = jac(zero, T, s)                          # [N, 4, 7]
        chi1 = jnp.sum(r[:, :2] ** 2, -1)
        chi2 = jnp.sum(r[:, 2:] ** 2, -1)
        # Huber IRLS weight per direction
        w1 = jnp.where(chi1 > delta2, jnp.sqrt(delta2 / jnp.maximum(chi1, 1e-12)), 1.0)
        w2 = jnp.where(chi2 > delta2, jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)), 1.0)
        w = jnp.concatenate([jnp.repeat(w1[:, None], 2, -1),
                             jnp.repeat(w2[:, None], 2, -1)], -1)
        w = w * inl[:, None].astype(dt)
        Jw = J * w[..., None]
        H = jnp.einsum('nrk,nrl->kl', Jw, J)
        b = -jnp.einsum('nrk,nr->k', Jw, r)
        if fix_scale:
            H = H.at[6, :].set(0.0).at[:, 6].set(0.0).at[6, 6].set(1.0)
            b = b.at[6].set(0.0)
        H = H + 1e-6 * jnp.eye(7, dtype=dt)
        dx = jnp.linalg.solve(H, b)
        dT, ds = sim3.exp(dx)
        return sim3.compose(dT, ds, T, s)

    T, s = T12, jnp.asarray(s12, dt)
    for _ in range(iters1):
        T, s = gn_step((T, s), valid)

    # χ² gate at the current estimate: drop pairs where either direction fails
    r = residuals(zero, T, s)
    chi1 = jnp.sum(r[:, :2] ** 2, -1)
    chi2 = jnp.sum(r[:, 2:] ** 2, -1)
    inl = valid & (chi1 <= chi2_th) & (chi2 <= chi2_th)

    for _ in range(iters2):
        T, s = gn_step((T, s), inl)

    r = residuals(zero, T, s)
    chi1 = jnp.sum(r[:, :2] ** 2, -1)
    chi2 = jnp.sum(r[:, 2:] ** 2, -1)
    inl = valid & (chi1 <= chi2_th) & (chi2 <= chi2_th)
    return T, s, inl, jnp.sum(inl.astype(jnp.int32))


def _project(K: Intrinsics, p):
    z = jnp.maximum(p[..., 2], 1e-6)
    return jnp.stack([K.fx * p[..., 0] / z + K.cx,
                      K.fy * p[..., 1] / z + K.cy], -1)
