"""Stereo depth: L/R keypoint matching with SAD subpixel refinement, and the
RGB-D virtual-right-coordinate model.

Parity with `Frame::ComputeStereoMatches` (`Frame.cc:706-880`: row-band
candidate search, best Hamming match within the disparity range, 11x11 SAD
sliding refinement with parabola interpolation) and
`Frame::ComputeStereoFromRGBD` (`Frame.cc:883-904`: u_r = u - bf/depth).

TPU redesign: the per-keypoint candidate loops become one [NL, NR] masked
Hamming matrix (row-band + disparity-range masks); the SAD refinement
evaluates all (keypoint, shift) windows as a single batched gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from object_slam_tpu.features.matching import hamming_matrix, masked_best2, BIG


def rgbd_virtual_right(uv, depth, bf):
    """uv [N, 2] (undistorted), depth [N] -> (ur [N], valid_depth [N]).
    ur = -1 where depth is invalid (the mono-edge sentinel)."""
    ok = depth > 0
    ur = jnp.where(ok, uv[..., 0] - bf / jnp.maximum(depth, 1e-6), -1.0)
    return ur, ok


def match_stereo(kpl_uv, kpl_level, kpl_desc, kpl_valid,
                 kpr_uv, kpr_level, kpr_desc, kpr_valid,
                 img_l, img_r, scale_factors, bf, fx,
                 min_z: float, th_dist: int = 100,
                 sad_half: int = 5, sad_shift: int = 5):
    """Returns (ur [NL], depth [NL], ok [NL]) for the left keypoints.

    min_z: minimum depth (= baseline, reference uses minD=0 maxD=bf/minZ).
    The SAD refinement runs on the level-0 images around the candidate
    match, shifting the right window by [-sad_shift, +sad_shift] pixels with
    parabolic subpixel interpolation (Frame.cc:800-860 behavior).
    """
    NL = kpl_uv.shape[0]
    max_d = bf / min_z
    lvl_l = kpl_level
    band = 2.0 * scale_factors[lvl_l]                       # row tolerance

    dv = jnp.abs(kpl_uv[:, None, 1] - kpr_uv[None, :, 1])
    disp = kpl_uv[:, None, 0] - kpr_uv[None, :, 0]
    lvl_ok = jnp.abs(kpl_level[:, None] - kpr_level[None, :]) <= 1
    mask = ((dv <= band[:, None]) & (disp > 0.1) & (disp < max_d)
            & lvl_ok & kpl_valid[:, None] & kpr_valid[None, :])
    dist = hamming_matrix(kpl_desc, kpr_desc)
    best_idx, best, _ = masked_best2(dist, mask)
    matched = best <= th_dist

    # --- SAD subpixel on level-0 images ---
    ur0 = kpr_uv[best_idx, 0]
    v0 = kpl_uv[:, 1]
    u_l = kpl_uv[:, 0]

    d = jnp.arange(-sad_half, sad_half + 1)
    wy = d[:, None]
    wx = d[None, :]
    h, w = img_l.shape

    def window(img, uc, vc, shift):
        yy = jnp.clip(jnp.round(vc[:, None, None] + wy[None]).astype(jnp.int32), 0, h - 1)
        xx = jnp.clip(jnp.round(uc[:, None, None] + shift + wx[None]).astype(jnp.int32), 0, w - 1)
        return img[yy, xx]                                  # [N, W, W]

    wl = window(img_l, u_l, v0, 0.0)
    wl = wl - wl[:, sad_half:sad_half + 1, sad_half:sad_half + 1]
    shifts = jnp.arange(-sad_shift, sad_shift + 1, dtype=jnp.float32)

    # ONE wide right-window gather [N, W, W + 2*sad_shift]; each shift is
    # a static slice of it. The per-shift gather form issued S separate
    # [N, W, W] image gathers (the gather, not the SAD math, dominated —
    # 35 ms of the 51 ms KITTI frame build; integer shifts commute with
    # round(), so the slices are bit-identical to the per-shift gathers).
    wide = jnp.arange(-sad_half - sad_shift, sad_half + sad_shift + 1)
    yy = jnp.clip(jnp.round(v0[:, None, None] + wy[None]).astype(jnp.int32),
                  0, h - 1)
    xx = jnp.clip(jnp.round(ur0[:, None, None]
                            + wide[None, None, :]).astype(jnp.int32),
                  0, w - 1)
    wr_wide = img_r[yy, xx]                   # [N, W, W + 2*sad_shift]
    W = 2 * sad_half + 1
    sad_list = []
    for si in range(2 * sad_shift + 1):
        wr = wr_wide[:, :, si:si + W]
        wr = wr - wr[:, sad_half:sad_half + 1,
                     sad_half:sad_half + 1]
        sad_list.append(jnp.sum(jnp.abs(wl - wr), axis=(1, 2)))
    sads = jnp.stack(sad_list, axis=1)                      # [N, S]
    bi = jnp.argmin(sads, axis=1)
    S = shifts.shape[0]
    bi_c = jnp.clip(bi, 1, S - 2)
    s_m = jnp.take_along_axis(sads, (bi_c - 1)[:, None], 1)[:, 0]
    s_0 = jnp.take_along_axis(sads, bi_c[:, None], 1)[:, 0]
    s_p = jnp.take_along_axis(sads, (bi_c + 1)[:, None], 1)[:, 0]
    denom = jnp.maximum(s_m + s_p - 2.0 * s_0, 1e-6)
    delta = 0.5 * (s_m - s_p) / denom
    delta = jnp.clip(delta, -1.0, 1.0)
    # the SAD windows sample at ROUNDED centers (round(u_l) on the left,
    # round(ur0)+shift on the right) — the measured alignment therefore
    # relates the rounded coordinates, and the disparity must be formed
    # from them; mixing in the unrounded subpixel keypoint coordinates
    # injects up to +-0.5 px of disparity bias (= 25 cm at 2.5 m on the
    # small-baseline test geometry)
    disparity = jnp.round(u_l) - (jnp.round(ur0) + shifts[bi_c] + delta)
    ur = u_l - disparity
    ok = matched & (disparity > 1e-3) & (disparity < max_d)
    depth = jnp.where(ok, bf / jnp.maximum(disparity, 1e-6), -1.0)
    ur = jnp.where(ok, ur, -1.0)
    return ur, depth, ok
