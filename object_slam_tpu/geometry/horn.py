"""Horn 1987 closed-form absolute orientation (Sim3/SE3 alignment).

Capability parity with `Sim3Solver::ComputeSim3` (`Sim3Solver.cc:226-284`),
which solves the quaternion eigen-problem of Horn's N matrix; the same math
also backs the ATE evaluation alignment (`evaluate_ate.py` uses the SVD
form). Batched over leading dims so a vmapped RANSAC can solve hundreds of
3-point hypotheses at once — the TPU-friendly replacement for the
reference's sequential RANSAC iterations.
"""

from __future__ import annotations

import jax.numpy as jnp


def horn_align(p_src, p_dst, weights=None, fix_scale: bool = False):
    """Find (s, R, t) minimizing || p_dst - (s R p_src + t) ||^2.

    Args:
      p_src, p_dst: [..., N, 3] corresponding points.
      weights: optional [..., N] non-negative weights (mask support).
      fix_scale: if True, s = 1 (SE3 mode — stereo/RGBD, `bFixScale`).
    Returns: (T [..., 4, 4] with R, t, and s scalar [...]).
    """
    if weights is None:
        weights = jnp.ones(p_src.shape[:-1], p_src.dtype)
    wsum = jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True), 1e-9)
    w = (weights / wsum)[..., None]

    mu_s = jnp.sum(w * p_src, axis=-2, keepdims=True)
    mu_d = jnp.sum(w * p_dst, axis=-2, keepdims=True)
    xs = p_src - mu_s
    xd = p_dst - mu_d

    # Weighted cross-covariance M = sum w * xs xd^T (Horn's S_ab with
    # a = source, b = destination; the eigenvector of N(M) is then the
    # quaternion rotating source into destination)  -> [..., 3, 3]
    M = jnp.einsum('...ni,...nj->...ij', w[..., 0][..., None] * xs, xd)

    # Horn's symmetric 4x4 N matrix from M; its top eigenvector is the
    # rotation quaternion (w, x, y, z).
    Sxx, Sxy, Sxz = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    Syx, Syy, Syz = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    Szx, Szy, Szz = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    N = jnp.stack([
        jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1),
        jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1),
        jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], -1),
        jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], -1),
    ], axis=-2)
    evals, evecs = jnp.linalg.eigh(N)
    q = evecs[..., :, -1]  # largest eigenvalue -> [..., 4] (w, x, y, z)
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack([
        jnp.stack([1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw), 2 * (qx * qz + qy * qw)], -1),
        jnp.stack([2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qx * qw)], -1),
        jnp.stack([2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw), 1 - 2 * (qx * qx + qy * qy)], -1),
    ], axis=-2)

    # Scale (symmetric-free form): s = sum(w xd . R xs) / sum(w |xs|^2)
    Rxs = jnp.einsum('...ij,...nj->...ni', R, xs)
    num = jnp.sum(w[..., 0] * jnp.sum(xd * Rxs, axis=-1), axis=-1)
    den = jnp.maximum(jnp.sum(w[..., 0] * jnp.sum(xs * xs, axis=-1), axis=-1), 1e-12)
    s = jnp.where(fix_scale, jnp.ones_like(num), num / den)

    t = mu_d[..., 0, :] - s[..., None] * jnp.einsum('...ij,...j->...i', R, mu_s[..., 0, :])
    T = jnp.zeros(R.shape[:-2] + (4, 4), R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T, s
