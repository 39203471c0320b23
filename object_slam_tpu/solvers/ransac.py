"""Batched hypothesize-and-verify RANSAC primitives.

The reference runs sequential early-exit RANSAC loops (`PnPsolver.cc:165`,
`Sim3Solver.cc:140`, `Initializer.cc:44-122` H/F in two threads,
`ObjectMatcher.cc:897-933` cv::findFundamentalMat). On TPU the natural shape
is: draw ALL minimal sample sets up front, solve every hypothesis with a
vmapped closed-form solver in one batch, score all hypotheses against all
correspondences with one [T, N] residual matrix, and argmax inliers. More
hypotheses than the reference's early-exit loop for the same wall time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_minimal_sets(key, n_points, valid_mask, n_trials, k):
    """Draw [T, k] index sets, biased to valid entries (with replacement
    across trials, Fisher-Yates-free: per-trial random keys + top-k trick).

    Uses gumbel-top-k over the valid mask so each trial gets k distinct
    valid indices (when enough exist).
    """
    g = jax.random.gumbel(key, (n_trials, n_points))
    g = jnp.where(valid_mask[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, k)
    return idx  # [T, k]


def eight_point_fundamental(p1, p2):
    """Normalized 8-point algorithm, batched over trials.

    p1, p2: [..., 8, 2] pixel correspondences. Returns F [..., 3, 3]
    (rank-2 enforced).
    """
    def normalize(p):
        mean = jnp.mean(p, axis=-2, keepdims=True)
        d = jnp.mean(jnp.linalg.norm(p - mean, axis=-1), axis=-1)
        s = jnp.sqrt(2.0) / jnp.maximum(d, 1e-9)
        T = jnp.zeros(p.shape[:-2] + (3, 3), p.dtype)
        T = T.at[..., 0, 0].set(s)
        T = T.at[..., 1, 1].set(s)
        T = T.at[..., 2, 2].set(1.0)
        T = T.at[..., 0, 2].set(-s * mean[..., 0, 0])
        T = T.at[..., 1, 2].set(-s * mean[..., 0, 1])
        pn = (p - mean) * s[..., None, None]
        return pn, T

    p1n, T1 = normalize(p1)
    p2n, T2 = normalize(p2)
    x1, y1 = p1n[..., 0], p1n[..., 1]
    x2, y2 = p2n[..., 0], p2n[..., 1]
    ones = jnp.ones_like(x1)
    # x2^T F x1 = 0 rows
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones],
                  axis=-1)  # [..., 8, 9]
    AtA = jnp.swapaxes(A, -1, -2) @ A
    _, v = jnp.linalg.eigh(AtA)
    f = v[..., :, 0]
    F = f.reshape(f.shape[:-1] + (3, 3))
    # rank-2 via SVD
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[..., 2].set(0.0)
    F = U @ (S[..., None] * Vt)
    F = jnp.swapaxes(T2, -1, -2) @ F @ T1
    return F / jnp.where(jnp.abs(F[..., 2:3, 2:3]) < 1e-9, 1.0, F[..., 2:3, 2:3])


def sampson_epipolar_chi2(F, p1, p2):
    """Symmetric epipolar distances (as Initializer::CheckFundamental).

    F: [T, 3, 3]; p1, p2: [N, 2]. Returns [T, N] chi2-like distances
    (squared distance to epipolar line, both directions summed)."""
    ones = jnp.ones(p1.shape[:-1] + (1,), p1.dtype)
    h1 = jnp.concatenate([p1, ones], -1)  # [N, 3]
    h2 = jnp.concatenate([p2, ones], -1)
    l2 = jnp.einsum('tij,nj->tni', F, h1)                 # lines in img2
    l1 = jnp.einsum('tji,nj->tni', F, h2)                 # lines in img1
    d2 = jnp.einsum('ni,tni->tn', h2, l2) ** 2 / jnp.maximum(
        l2[..., 0] ** 2 + l2[..., 1] ** 2, 1e-12)
    d1 = jnp.einsum('ni,tni->tn', h1, l1) ** 2 / jnp.maximum(
        l1[..., 0] ** 2 + l1[..., 1] ** 2, 1e-12)
    return d1 + d2


def ransac_fundamental(key, p1, p2, valid, n_trials: int = 128,
                       inlier_th: float = 3.84 * 2.0):
    """Fundamental-matrix RANSAC (replaces cv::findFundamentalMat in
    ObjectMatcher.cc:897-933 outlier rejection).

    Returns (F [3,3], inlier_mask [N], n_inliers)."""
    idx = sample_minimal_sets(key, p1.shape[0], valid, n_trials, 8)
    F = eight_point_fundamental(p1[idx], p2[idx])         # [T, 3, 3]
    d = sampson_epipolar_chi2(F, p1, p2)                  # [T, N]
    inl = (d < inlier_th) & valid[None, :]
    scores = jnp.sum(inl, axis=-1)
    best = jnp.argmax(scores)
    return F[best], inl[best], scores[best]
