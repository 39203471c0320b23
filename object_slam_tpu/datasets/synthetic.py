"""Synthetic RGB-D / stereo scene generator for tests and benchmarks.

The reference repository ships no data (images/masks are external
downloads, README.md:64); correctness here is established on synthetic
scenes with exact ground truth: a textured random world rendered as sparse
depth + image patches, plus box-shaped "objects" with instance masks — the
scene generator that SURVEY.md §4 calls for.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np


def _smooth_texture(rng, size):
    """Band-limited random field: sharp enough for FAST corners, smooth
    enough for stable intensity-centroid orientations (like real images)."""
    t = rng.uniform(0, 255, (size // 4, size // 4)).astype(np.float32)
    # bilinear upsample x4 + light box smoothing
    idx = np.linspace(0, t.shape[0] - 1, size)
    xi = np.floor(idx).astype(int)
    fi = (idx - xi)[:, None]
    xi2 = np.minimum(xi + 1, t.shape[0] - 1)
    rows = t[xi] * (1 - fi) + t[xi2] * fi
    fj = (idx - xi)[None, :]
    cols = rows[:, xi] * (1 - fj) + rows[:, xi2] * fj
    return cols.astype(np.float32)


def _tex_sample(tex, u, v):
    """Bilinear periodic texture lookup with float coords."""
    th, tw = tex.shape
    u = np.mod(u, tw - 1)
    v = np.mod(v, th - 1)
    u0 = np.floor(u).astype(int)
    v0 = np.floor(v).astype(int)
    fu = u - u0
    fv = v - v0
    u1 = np.minimum(u0 + 1, tw - 1)
    v1 = np.minimum(v0 + 1, th - 1)
    return (tex[v0, u0] * (1 - fu) * (1 - fv) + tex[v0, u1] * fu * (1 - fv)
            + tex[v1, u0] * (1 - fu) * fv + tex[v1, u1] * fu * fv)


def _undistort_grid(h, w, fx, fy, cx, cy, dist, iters: int = 10):
    """Per-pixel ideal (undistorted) normalized coordinates for a camera
    whose IMAGE GRID is distorted: pixel (u, v) of the rendered image is
    the distorted observation of normalized ray (xn, yn, 1). Fixed-point
    inversion of the radial-tangential model (same recursion as
    geometry/camera.undistort_points, so the renderer and the front end
    agree on the model)."""
    k1, k2, p1, p2, k3 = dist
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    xd = (xs - cx) / fx
    yd = (ys - cy) / fy
    xn, yn = xd.copy(), yd.copy()
    for _ in range(iters):
        r2 = xn * xn + yn * yn
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = xn * radial + 2.0 * p1 * xn * yn + p2 * (r2 + 2.0 * xn * xn)
        dy = yn * radial + p1 * (r2 + 2.0 * yn * yn) + 2.0 * p2 * xn * yn
        xn -= dx - xd
        yn -= dy - yd
    return np.stack([xn, yn, np.ones_like(xn)], axis=-1).astype(np.float32)


@dataclass
class SyntheticScene:
    h: int
    w: int
    fx: float
    fy: float
    cx: float
    cy: float
    bf: float
    rng: np.random.RandomState
    # world content
    tex: np.ndarray            # [TH, TW] texture plane at z = plane_z
    plane_z: float
    boxes: List[dict]          # object boxes {center, size, label, tex}
    rays: np.ndarray = None    # [H, W, 3] per-pixel camera rays (z = 1)

    @staticmethod
    def make(cfg, seed=0, n_objects=2, plane_z=4.0):
        rng = np.random.RandomState(seed)
        cam = cfg.camera
        tex = _smooth_texture(rng, 256)
        boxes = []
        for i in range(n_objects):
            boxes.append(dict(
                center=np.array([rng.uniform(-1.0, 1.0),
                                 rng.uniform(-0.7, 0.7),
                                 plane_z - rng.uniform(0.8, 1.6)]),
                size=rng.uniform(0.4, 0.7),
                label=int([56, 62, 73][i % 3]),
                tex=_smooth_texture(rng, 64)))
        # Lens model: the rendered image is DISTORTED exactly like the real
        # sensor the config describes (TUM2 has strong k1/k2/k3), so the
        # front end's undistortion path is exercised end-to-end. A pinhole
        # render under a distorted config would inject a position-dependent
        # systematic warp into every synthetic e2e metric.
        rays = _undistort_grid(cam.height, cam.width, cam.fx, cam.fy,
                               cam.cx, cam.cy, cam.dist)
        return SyntheticScene(h=cam.height, w=cam.width,
                              fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
                              bf=cam.bf, rng=rng, tex=tex,
                              plane_z=plane_z, boxes=boxes, rays=rays)

    # ------------------------------------------------------------------
    def render_rgbd(self, Tcw: np.ndarray):
        """Ray-cast the plane + boxes: returns (gray [H,W], depth [H,W],
        rgb [H,W,3], sem = (masks, labels, probs, bboxes, valid))."""
        h, w = self.h, self.w
        Twc = np.linalg.inv(Tcw)
        R, t = Twc[:3, :3], Twc[:3, 3]
        if self.rays is not None:
            dirs = self.rays
        else:
            ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
            dirs = np.stack([(xs - self.cx) / self.fx,
                             (ys - self.cy) / self.fy,
                             np.ones_like(xs)], axis=-1)     # camera rays
        dirs_w = dirs @ R.T
        o = t

        # plane z = plane_z (world)
        denom = dirs_w[..., 2]
        denom = np.where(np.abs(denom) < 1e-6, 1e-6, denom)
        t_plane = (self.plane_z - o[2]) / denom
        t_plane = np.where(t_plane > 0.1, t_plane, np.inf)

        # boxes: axis-aligned slab test
        t_hit = t_plane.copy()
        hit_obj = np.full((h, w), -1, np.int32)
        for i, b in enumerate(self.boxes):
            lo = b['center'] - b['size'] / 2
            hi = b['center'] + b['size'] / 2
            with np.errstate(divide='ignore', invalid='ignore'):
                t0 = (lo - o) / dirs_w
                t1 = (hi - o) / dirs_w
            tmin = np.minimum(t0, t1).max(axis=-1)
            tmax = np.maximum(t0, t1).min(axis=-1)
            hit = (tmax > tmin) & (tmin > 0.1) & (tmin < t_hit)
            t_hit = np.where(hit, tmin, t_hit)
            hit_obj = np.where(hit, i, hit_obj)

        pts_w = o + dirs_w * t_hit[..., None]
        depth = t_hit * dirs[..., 2]     # z-depth in camera frame
        depth = np.where(np.isfinite(depth), depth, 0.0)

        # texture lookup (bilinear, continuous coords -> subpixel-stable)
        img = np.zeros((h, w), np.float32)
        plane_mask = np.isfinite(t_plane) & (hit_obj < 0) & (t_hit == t_plane)
        img = np.where(plane_mask,
                       _tex_sample(self.tex, pts_w[..., 0] * 80.0,
                                   pts_w[..., 1] * 80.0), img)
        for i, b in enumerate(self.boxes):
            mask = hit_obj == i
            bt = b['tex']
            img = np.where(mask,
                           _tex_sample(bt, pts_w[..., 0] * 100.0,
                                       pts_w[..., 1] * 100.0
                                       + pts_w[..., 2] * 60.0), img)

        rgb = np.stack([img, img * 0.9, img * 0.8], axis=-1)
        # distinct hue per object for HSV association
        for i, b in enumerate(self.boxes):
            mask = hit_obj == i
            scale = [(1.0, 0.3, 0.3), (0.3, 1.0, 0.3), (0.3, 0.3, 1.0)][i % 3]
            for c in range(3):
                rgb[..., c] = np.where(mask, img * scale[c], rgb[..., c])

        # semantics
        masks, labels, probs, bboxes, valid = [], [], [], [], []
        for i, b in enumerate(self.boxes):
            mask = hit_obj == i
            if mask.sum() < 400:
                continue
            ys_, xs_ = np.nonzero(mask)
            masks.append(mask)
            labels.append(b['label'])
            probs.append(0.95)
            bboxes.append([xs_.min(), ys_.min(),
                           xs_.max() - xs_.min(), ys_.max() - ys_.min()])
            valid.append(True)
        return img, depth, rgb, (masks, labels, probs, bboxes, valid)

    def sem_arrays(self, sem, max_instances):
        masks, labels, probs, bboxes, valid = sem
        I = max_instances
        M = np.zeros((I, self.h, self.w), bool)
        L = np.full((I,), -1, np.int32)
        Pb = np.zeros((I,), np.float32)
        B = np.zeros((I, 4), np.float32)
        V = np.zeros((I,), bool)
        for i in range(min(len(masks), I)):
            M[i], L[i], Pb[i], B[i], V[i] = (masks[i], labels[i], probs[i],
                                             bboxes[i], valid[i])
        return M, L, Pb, B, V


def orbit_poses(n: int, radius: float = 0.4, step: float = 0.03):
    """A gentle sideways trajectory looking at the scene (world->camera)."""
    poses = []
    for i in range(n):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [-(i * step), 0.02 * np.sin(i * 0.3), 0.0]
        ang = 0.01 * i
        c, s = np.cos(ang), np.sin(ang)
        T[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        poses.append(T)
    return poses
