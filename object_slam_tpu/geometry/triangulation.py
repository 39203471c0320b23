"""Two-view triangulation (batched DLT) + parallax/cheirality checks.

Capability parity with the reference's triangulation in
`LocalMapping::CreateNewMapPoints` (`LocalMapping.cc:208-453`) and
`Initializer::Triangulate` (`Initializer.cc:734`): SVD-based DLT on the
4x4 system, plus the acceptance gates (parallax, positive depth,
reprojection error, scale consistency) evaluated as masks.
"""

from __future__ import annotations

import jax.numpy as jnp


def triangulate_dlt(P1, P2, xn1, xn2):
    """Batched DLT triangulation.

    Args:
      P1, P2: [3, 4] projection matrices (K [R|t] or normalized [R|t]).
      xn1, xn2: [..., 2] image points in the respective projection frames.
    Returns: [..., 3] triangulated points (homogeneous-normalized).
    """
    # Rows of A: x*P3 - P1 ; y*P3 - P2 for each view  -> [..., 4, 4]
    A0 = xn1[..., 0:1] * P1[2] - P1[0]
    A1 = xn1[..., 1:2] * P1[2] - P1[1]
    A2 = xn2[..., 0:1] * P2[2] - P2[0]
    A3 = xn2[..., 1:2] * P2[2] - P2[1]
    A = jnp.stack([A0, A1, A2, A3], axis=-2)
    # Null vector via eigendecomposition of A^T A (4x4, batched, TPU-friendly)
    AtA = jnp.swapaxes(A, -1, -2) @ A
    w, v = jnp.linalg.eigh(AtA)
    X = v[..., :, 0]  # eigenvector of smallest eigenvalue
    w4 = X[..., 3]
    w4 = jnp.where(jnp.abs(w4) < 1e-10, 1e-10, w4)
    return X[..., :3] / w4[..., None]


def parallax_cos(pw, c1, c2):
    """Cosine of the ray parallax angle at world points [..., 3] between
    camera centers c1, c2 [3]."""
    r1 = pw - c1
    r2 = pw - c2
    n1 = jnp.linalg.norm(r1, axis=-1)
    n2 = jnp.linalg.norm(r2, axis=-1)
    return jnp.sum(r1 * r2, axis=-1) / jnp.maximum(n1 * n2, 1e-9)


def triangulate_two_view(K, T1w, T2w, uv1, uv2,
                         reproj_chi2: float = 5.991,
                         min_parallax_cos: float = 0.9998):
    """Triangulate matches between two cameras with the reference's gates.

    Args:
      K: camera.Intrinsics.
      T1w, T2w: [4, 4] world->camera poses.
      uv1, uv2: [N, 2] undistorted pixel matches.
    Returns (pw [N, 3], ok [N]).
    """
    fx, fy, cx, cy = K.fx, K.fy, K.cx, K.cy
    xn1 = jnp.stack([(uv1[..., 0] - cx) / fx, (uv1[..., 1] - cy) / fy], -1)
    xn2 = jnp.stack([(uv2[..., 0] - cx) / fx, (uv2[..., 1] - cy) / fy], -1)
    P1 = T1w[:3, :4]
    P2 = T2w[:3, :4]
    pw = triangulate_dlt(P1, P2, xn1, xn2)

    def cam(T, p):
        return p @ T[:3, :3].T + T[:3, 3]

    pc1 = cam(T1w, pw)
    pc2 = cam(T2w, pw)
    z1, z2 = pc1[..., 2], pc2[..., 2]
    u1 = fx * pc1[..., 0] / jnp.maximum(z1, 1e-6) + cx
    v1 = fy * pc1[..., 1] / jnp.maximum(z1, 1e-6) + cy
    u2 = fx * pc2[..., 0] / jnp.maximum(z2, 1e-6) + cx
    v2 = fy * pc2[..., 1] / jnp.maximum(z2, 1e-6) + cy
    e1 = (u1 - uv1[..., 0]) ** 2 + (v1 - uv1[..., 1]) ** 2
    e2 = (u2 - uv2[..., 0]) ** 2 + (v2 - uv2[..., 1]) ** 2

    c1 = -T1w[:3, :3].T @ T1w[:3, 3]
    c2 = -T2w[:3, :3].T @ T2w[:3, 3]
    pcos = parallax_cos(pw, c1, c2)

    ok = ((z1 > 0) & (z2 > 0)
          & (e1 < reproj_chi2) & (e2 < reproj_chi2)
          & (pcos < min_parallax_cos) & (pcos > 0.0)
          & jnp.all(jnp.isfinite(pw), axis=-1))
    return pw, ok
