"""SE(3) Lie-group operations, batched and jit-friendly.

The reference relies on g2o's `SE3Quat` (`Converter.cc`) for pose algebra.
Here poses are plain `[..., 4, 4]` float32 arrays (world->camera `Tcw` by the
same convention as the reference) with exp/log maps for the tangent-space
updates used by the Gauss-Newton solvers. All functions broadcast over
leading batch dims — optimizers vmap/batch over keyframes for free.

Twist convention: xi = [rho(3), phi(3)] (translation first, rotation second),
matching g2o's SE3Quat::exp ordering used by the reference optimizers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(v):
    """Skew-symmetric matrix of [..., 3] vectors -> [..., 3, 3]."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ], axis=-2)


def so3_exp(phi):
    """Rodrigues: [..., 3] rotation vector -> [..., 3, 3] rotation matrix.

    AD-safe at phi = 0: written in terms of theta^2 (no norm of a zero
    vector on the differentiation path) with Taylor branches whose untaken
    sides stay finite — forward-mode Jacobians of pose-graph edges at zero
    perturbation need this.
    """
    t2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    ts = jnp.sqrt(jnp.maximum(t2, 1e-12))
    A = jnp.where(t2 < 1e-8, 1.0 - t2 / 6.0, jnp.sin(ts) / ts)
    B = jnp.where(t2 < 1e-8, 0.5 - t2 / 24.0,
                  (1.0 - jnp.cos(ts)) / jnp.maximum(t2, 1e-12))
    K = hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return I + A * K + B * (K @ K)


def so3_log(R):
    """[..., 3, 3] rotation matrix -> [..., 3] rotation vector.

    AD-safe near the identity: the arccos branch evaluates on inputs
    clipped away from +-1 (double-where pattern) so forward-mode Jacobians
    of pose-graph edge errors at zero perturbation stay finite.
    """
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos_theta = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    near_id = cos_theta > 1.0 - 1e-6
    safe_cos = jnp.clip(cos_theta, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(safe_cos)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - safe_cos * safe_cos, _EPS))
    w = jnp.stack([
        R[..., 2, 1] - R[..., 1, 2],
        R[..., 0, 2] - R[..., 2, 0],
        R[..., 1, 0] - R[..., 0, 1],
    ], axis=-1)
    # small-angle: w ~= 2 phi, so scale -> 1/2 (+ O(theta^2) correction)
    scale = jnp.where(near_id,
                      0.5 + (1.0 - cos_theta) / 6.0,
                      theta / (2.0 * sin_theta))
    return w * scale[..., None]


def _left_jacobian(phi):
    """SO(3) left Jacobian J_l(phi), [..., 3, 3]. AD-safe at phi = 0."""
    t2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    ts = jnp.sqrt(jnp.maximum(t2, 1e-12))
    K = hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    A = jnp.where(t2 < 1e-8, 0.5 - t2 / 24.0,
                  (1.0 - jnp.cos(ts)) / jnp.maximum(t2, _EPS))
    B = jnp.where(t2 < 1e-8, 1.0 / 6.0 - t2 / 120.0,
                  (ts - jnp.sin(ts)) / jnp.maximum(t2 * ts, _EPS))
    return I + A * K + B * (K @ K)


def exp(xi):
    """se(3) twist [..., 6] (rho, phi) -> [..., 4, 4] transform."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    t = (_left_jacobian(phi) @ rho[..., None])[..., 0]
    T = jnp.zeros(xi.shape[:-1] + (4, 4), xi.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def log(T):
    """[..., 4, 4] transform -> [..., 6] twist (rho, phi)."""
    phi = so3_log(T[..., :3, :3])
    Jl = _left_jacobian(phi)
    rho = jnp.linalg.solve(Jl, T[..., :3, 3][..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def identity(batch_shape=(), dtype=jnp.float32):
    return jnp.broadcast_to(jnp.eye(4, dtype=dtype), batch_shape + (4, 4))


def inverse(T):
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    Ti = jnp.zeros_like(T)
    Ti = Ti.at[..., :3, :3].set(Rt)
    Ti = Ti.at[..., :3, 3].set(-(Rt @ t[..., None])[..., 0])
    Ti = Ti.at[..., 3, 3].set(1.0)
    return Ti


def compose(A, B):
    return A @ B


def apply(T, p):
    """Transform points: [..., 4, 4] x [..., N, 3] -> [..., N, 3]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return p @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def orthonormalize(T):
    """Project the rotation block back onto SO(3) (symmetric polar factor
    via one Newton sweep: R <- R (3 I - R^T R) / 2, exact to O(E^2)).

    Composed float32 retractions drift the rotation off the manifold by
    ~1e-6/step; over hundreds of frames that reads as a phantom rotation
    of degrees in trace-based metrics and eventually biases projection.
    One Newton step per frame keeps the drift at float32 noise."""
    R = T[..., :3, :3]
    RtR = jnp.swapaxes(R, -1, -2) @ R
    R = R @ (1.5 * jnp.eye(3, dtype=T.dtype) - 0.5 * RtR)
    return T.at[..., :3, :3].set(R)


def retract(T, xi):
    """Left-multiplicative update exp(xi) * T (g2o VertexSE3Expmap::oplus),
    re-projected onto SE(3)."""
    return orthonormalize(exp(xi) @ T)


def to_quat_trans(T):
    """[..., 4, 4] -> (quat_xyzw [..., 4], t [..., 3]) for TUM trajectory IO."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    m00, m11, m22 = R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # Shepperd's method, branch-free via where over the 4 cases.
    qw_t = jnp.sqrt(jnp.maximum(1.0 + tr, 0.0)) * 0.5
    qx_t = (R[..., 2, 1] - R[..., 1, 2]) / jnp.maximum(4.0 * qw_t, _EPS)
    qy_t = (R[..., 0, 2] - R[..., 2, 0]) / jnp.maximum(4.0 * qw_t, _EPS)
    qz_t = (R[..., 1, 0] - R[..., 0, 1]) / jnp.maximum(4.0 * qw_t, _EPS)

    qx_x = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 0.0)) * 0.5
    qw_x = (R[..., 2, 1] - R[..., 1, 2]) / jnp.maximum(4.0 * qx_x, _EPS)
    qy_x = (R[..., 0, 1] + R[..., 1, 0]) / jnp.maximum(4.0 * qx_x, _EPS)
    qz_x = (R[..., 0, 2] + R[..., 2, 0]) / jnp.maximum(4.0 * qx_x, _EPS)

    qy_y = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 0.0)) * 0.5
    qw_y = (R[..., 0, 2] - R[..., 2, 0]) / jnp.maximum(4.0 * qy_y, _EPS)
    qx_y = (R[..., 0, 1] + R[..., 1, 0]) / jnp.maximum(4.0 * qy_y, _EPS)
    qz_y = (R[..., 1, 2] + R[..., 2, 1]) / jnp.maximum(4.0 * qy_y, _EPS)

    qz_z = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 0.0)) * 0.5
    qw_z = (R[..., 1, 0] - R[..., 0, 1]) / jnp.maximum(4.0 * qz_z, _EPS)
    qx_z = (R[..., 0, 2] + R[..., 2, 0]) / jnp.maximum(4.0 * qz_z, _EPS)
    qy_z = (R[..., 1, 2] + R[..., 2, 1]) / jnp.maximum(4.0 * qz_z, _EPS)

    use_w = tr > 0.0
    use_x = (~use_w) & (m00 >= m11) & (m00 >= m22)
    use_y = (~use_w) & (~use_x) & (m11 >= m22)

    qw = jnp.where(use_w, qw_t, jnp.where(use_x, qw_x, jnp.where(use_y, qw_y, qw_z)))
    qx = jnp.where(use_w, qx_t, jnp.where(use_x, qx_x, jnp.where(use_y, qx_y, qx_z)))
    qy = jnp.where(use_w, qy_t, jnp.where(use_x, qy_x, jnp.where(use_y, qy_y, qy_z)))
    qz = jnp.where(use_w, qz_t, jnp.where(use_x, qz_x, jnp.where(use_y, qz_y, qz_z)))
    q = jnp.stack([qx, qy, qz, qw], axis=-1)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q, t


def from_quat_trans(q, t):
    """(quat_xyzw [..., 4], t [..., 3]) -> [..., 4, 4]."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
        jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
        jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)
    T = jnp.zeros(q.shape[:-1] + (4, 4), q.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T
