"""Pinhole camera model: projection, unprojection, undistortion, frustum test.

Covers the reference's camera math: projection in the optimizers
(`Optimizer.cc:121-180`), keypoint undistortion (`Frame.cc:644` via
cv::undistortPoints), RGB-D virtual right disparity (`Frame.cc:883-904`),
stereo reprojection u_r = u - bf/z, and the frustum / scale-distance check
(`Frame.cc:509-565`). All batched over [..., N] point dims.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Intrinsics(NamedTuple):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    bf: jnp.ndarray          # baseline * fx (0 for mono)
    dist: jnp.ndarray        # [5] k1 k2 p1 p2 k3
    width: jnp.ndarray
    height: jnp.ndarray

    @staticmethod
    def from_config(cam) -> "Intrinsics":
        f32 = jnp.float32
        return Intrinsics(
            fx=f32(cam.fx), fy=f32(cam.fy), cx=f32(cam.cx), cy=f32(cam.cy),
            bf=f32(cam.bf), dist=jnp.asarray(cam.dist, jnp.float32),
            width=f32(cam.width), height=f32(cam.height))


def project(K: Intrinsics, pc):
    """Camera-frame points [..., 3] -> pixel (u, v) [..., 2]. No distortion
    (matched keypoints are undistorted once at frame build, as in the
    reference where optimizer edges use undistorted coordinates)."""
    z = jnp.maximum(pc[..., 2], 1e-6)
    u = K.fx * pc[..., 0] / z + K.cx
    v = K.fy * pc[..., 1] / z + K.cy
    return jnp.stack([u, v], axis=-1)


def project_stereo(K: Intrinsics, pc):
    """[..., 3] -> (u, v, u_right) [..., 3] with u_r = u - bf/z."""
    z = jnp.maximum(pc[..., 2], 1e-6)
    u = K.fx * pc[..., 0] / z + K.cx
    v = K.fy * pc[..., 1] / z + K.cy
    ur = u - K.bf / z
    return jnp.stack([u, v, ur], axis=-1)


def backproject(K: Intrinsics, uv, z):
    """Pixels [..., 2] + depth [...] -> camera-frame [..., 3]."""
    x = (uv[..., 0] - K.cx) * z / K.fx
    y = (uv[..., 1] - K.cy) * z / K.fy
    return jnp.stack([x, y, z], axis=-1)


def distort_normalized(dist, xn):
    """Apply radial-tangential distortion to normalized coords [..., 2]."""
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


# Shared fixed-point iteration count for inverting the radial-tangential
# model; datasets/synthetic.py uses the same constant so the renderer and
# the front end agree on the inverse model by construction.
UNDISTORT_ITERS = 8


def undistort_points(K: Intrinsics, uv, iters: int = UNDISTORT_ITERS):
    """Iterative undistortion (fixed-point, as cv::undistortPoints does).

    [..., 2] distorted pixels -> [..., 2] undistorted pixels. Fixed iteration
    count keeps the shape static for jit. Matches Frame.cc:644 behavior.
    """
    xn_d = jnp.stack([(uv[..., 0] - K.cx) / K.fx,
                      (uv[..., 1] - K.cy) / K.fy], axis=-1)

    def body(_, xn):
        d = distort_normalized(K.dist, xn)
        return xn - (d - xn_d)

    xn = jax.lax.fori_loop(0, iters, body, xn_d)
    return jnp.stack([xn[..., 0] * K.fx + K.cx,
                      xn[..., 1] * K.fy + K.cy], axis=-1)


def in_image(K: Intrinsics, uv, margin=0.0):
    return ((uv[..., 0] >= margin) & (uv[..., 0] < K.width - margin) &
            (uv[..., 1] >= margin) & (uv[..., 1] < K.height - margin))


def frustum_check(K: Intrinsics, Tcw, pw, normal, min_dist, max_dist,
                  view_cos_limit: float = 0.5):
    """Vectorized Frame::isInFrustum (Frame.cc:509-565).

    Args: world points [N, 3], viewing normals [N, 3], scale-invariance
    distances [N]. Returns (visible_mask [N], uv [N, 2], z [N], dist [N],
    view_cos [N]).
    """
    R = Tcw[:3, :3]
    t = Tcw[:3, 3]
    pc = pw @ R.T + t
    z = pc[..., 2]
    uv = project(Intrinsics(K.fx, K.fy, K.cx, K.cy, K.bf, K.dist,
                            K.width, K.height), pc)
    cam_center = -R.T @ t
    po = pw - cam_center
    dist = jnp.linalg.norm(po, axis=-1)
    view_cos = jnp.sum(po * normal, axis=-1) / jnp.maximum(dist, 1e-6)
    ok = ((z > 0.0) & in_image(K, uv)
          & (dist >= min_dist) & (dist <= max_dist)
          & (view_cos > view_cos_limit))
    return ok, uv, z, dist, view_cos


def predict_scale_level(dist, max_dist, log_scale_factor, n_levels):
    """MapPoint::PredictScale — octave from distance ratio."""
    ratio = jnp.maximum(max_dist / jnp.maximum(dist, 1e-6), 1e-6)
    level = jnp.ceil(jnp.log(ratio) / log_scale_factor).astype(jnp.int32)
    return jnp.clip(level, 0, n_levels - 1)
