"""Object2D: per-frame instance detections fused with keypoints.

Parity with `Frame::BuildObject2Ds{RGBD,Stereo}` (`Frame.cc:240-384`) and the
Object2D payload of `ObjectTypes.{h,cc}`: a keypoint belongs to an instance
iff the full 20x20 window around it lies inside the mask AND its depth is in
(0, th_depth]; each keypoint joins at most one instance (first in file
order); instances keep only if > min_kps members; each instance carries its
HSV appearance histogram and (new: precomputed, the reference computed but
never used its distance transform) the nearest-mask-pixel feature transform
for the semantic optimizer.

TPU redesign: the per-kp/per-mask nested loops become one eroded-mask gather
[I, N]; "first instance wins" is an argmax over the instance axis; the whole
frame's Object2D slab builds in one jitted call with static [I] capacity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from object_slam_tpu.ops.distance_transform import erode, feature_transform_batch

FT_CROP = 256   # per-instance feature-transform window (see build docstring)
from object_slam_tpu.semantic import hsv as hsv_mod


# ---------------------------------------------------------------------------
# Mask transfer packing
# ---------------------------------------------------------------------------
# The semantic masks are the largest per-frame host->device payload: a
# [16, 480, 640] bool slab is ~4.9 MB/frame — on a remote-attached chip
# this transfer alone capped the objects-ON pipeline (measured round 2,
# scripts/diag_fullpipe.py). Masks are 1-bit data; ship them bit-packed
# (8x smaller) and unpack on device with two cheap VPU ops.

def pack_mask_bits(masks) -> "np.ndarray":
    """HOST-side: [..., W] bool -> [..., ceil(W/8)] uint8 (np.packbits
    big-endian bit order). Call before shipping masks to the device."""
    import numpy as np
    return np.packbits(np.asarray(masks, dtype=bool), axis=-1)


def unpack_mask_bits(packed, width: int):
    """DEVICE-side inverse of pack_mask_bits: [..., B] uint8 ->
    [..., width] bool (width <= B*8)."""
    shifts = (7 - jnp.arange(8, dtype=jnp.uint8))
    bits = (packed[..., :, None] >> shifts) & jnp.uint8(1)
    flat = bits.reshape(packed.shape[:-1] + (packed.shape[-1] * 8,))
    return flat[..., :width].astype(bool)


class Object2DSlab(NamedTuple):
    """Static [I]-capacity slab of per-frame object detections.

    label, track-less here (track ids are assigned by the matcher).
    kp2obj: [N] int32 — owning instance per keypoint (-1 = none).
    n_kps: [I] member keypoint counts.
    hist: [I, 94] HSV appearance histograms.
    bbox: [I, 4] (x, y, w, h) detector boxes.
    prob: [I] detector confidence.
    ftmap: [I, C, C, 2] nearest-mask-pixel (y, x) maps over FT_CROP-sized
    crops, coordinates LOCAL to the crop; ft_origin [I, 2] (y0, x0) gives
    each crop's image-frame origin.
    masks: [I, H, W] bool instance masks.
    centroid_uv: [I, 2] mean member keypoint position.
    mean_depth: [I].
    valid: [I] bool.
    """

    label: jnp.ndarray
    prob: jnp.ndarray
    bbox: jnp.ndarray
    kp2obj: jnp.ndarray
    n_kps: jnp.ndarray
    hist: jnp.ndarray
    ftmap: jnp.ndarray
    ft_origin: jnp.ndarray
    masks: jnp.ndarray
    centroid_uv: jnp.ndarray
    mean_depth: jnp.ndarray
    valid: jnp.ndarray


def build_object2ds(rgb, masks, labels, probs, bboxes, inst_valid,
                    kp_uv, kp_depth, kp_valid,
                    th_depth: float, min_kps: int,
                    mask_margin: int = 10) -> Object2DSlab:
    """Assemble the frame's Object2D slab.

    Args:
      rgb: [H, W, 3] float 0..255.
      masks: [I, H, W] bool; labels/probs/bboxes/inst_valid: [I] detector rows.
      kp_uv: [N, 2] RAW (distorted) keypoint pixels — the reference indexes
        masks with the keypoint's image position.
      kp_depth: [N] (-1 invalid); kp_valid: [N].
    """
    I = masks.shape[0]
    h, w = masks.shape[1], masks.shape[2]

    eroded = jax.vmap(lambda m: erode(m, mask_margin))(masks)   # [I, H, W]
    yy = jnp.clip(jnp.round(kp_uv[:, 1]).astype(jnp.int32), 0, h - 1)
    xx = jnp.clip(jnp.round(kp_uv[:, 0]).astype(jnp.int32), 0, w - 1)
    interior = eroded[:, yy, xx]                                 # [I, N]

    depth_ok = (kp_depth > 0) & (kp_depth <= th_depth)
    member = interior & depth_ok[None, :] & kp_valid[None, :] & inst_valid[:, None]

    # first instance wins (file order), as the reference erases claimed kps
    first = jnp.argmax(member, axis=0)                           # [N]
    any_m = jnp.any(member, axis=0)
    kp2obj_pre = jnp.where(any_m, first, -1)

    one_hot = (kp2obj_pre[None, :] == jnp.arange(I)[:, None]) & any_m[None, :]
    n_kps = jnp.sum(one_hot, axis=1).astype(jnp.int32)
    valid = inst_valid & (n_kps > min_kps)
    kp2obj = jnp.where(valid[jnp.clip(kp2obj_pre, 0, I - 1)] & any_m,
                       kp2obj_pre, -1)

    w_kp = one_hot.astype(jnp.float32) * valid[:, None]
    denom = jnp.maximum(jnp.sum(w_kp, axis=1), 1.0)
    centroid_uv = (w_kp @ kp_uv) / denom[:, None]
    mean_depth = (w_kp @ jnp.where(depth_ok, kp_depth, 0.0)) / denom

    hists = hsv_mod.batched_histograms(rgb, masks)

    # feature transform on per-instance crops around the detector bbox:
    # JFA over full VGA x I instances is ~5x more work than needed — object
    # masks fit a FT_CROP^2 window, and the semantic optimizer's queries
    # sit within 10 px of the mask.
    cy = jnp.clip((bboxes[:, 1] + bboxes[:, 3] / 2).astype(jnp.int32)
                  - FT_CROP // 2, 0, max(h - FT_CROP, 0))
    cx = jnp.clip((bboxes[:, 0] + bboxes[:, 2] / 2).astype(jnp.int32)
                  - FT_CROP // 2, 0, max(w - FT_CROP, 0))

    def crop_one(mask, y0, x0):
        return jax.lax.dynamic_slice(
            mask, (y0, x0), (min(FT_CROP, h), min(FT_CROP, w)))

    crops = jax.vmap(crop_one)(masks, cy, cx)
    ftmaps = feature_transform_batch(crops)          # [I, C, C, 2] local

    return Object2DSlab(
        label=labels.astype(jnp.int32), prob=probs, bbox=bboxes,
        kp2obj=kp2obj.astype(jnp.int32), n_kps=n_kps, hist=hists,
        ftmap=ftmaps, ft_origin=jnp.stack([cy, cx], -1),
        masks=masks, centroid_uv=centroid_uv,
        mean_depth=mean_depth, valid=valid)


def empty_slab(max_instances: int, height: int, width: int,
               n_kp: int) -> Object2DSlab:
    I, H, W = max_instances, height, width
    return Object2DSlab(
        label=jnp.full((I,), -1, jnp.int32),
        prob=jnp.zeros((I,)),
        bbox=jnp.zeros((I, 4)),
        kp2obj=jnp.full((n_kp,), -1, jnp.int32),
        n_kps=jnp.zeros((I,), jnp.int32),
        hist=jnp.zeros((I, hsv_mod.HIST_DIM)),
        ftmap=jnp.full((I, min(FT_CROP, H), min(FT_CROP, W), 2), -1.0),
        ft_origin=jnp.zeros((I, 2), jnp.int32),
        masks=jnp.zeros((I, H, W), bool),
        centroid_uv=jnp.zeros((I, 2)),
        mean_depth=jnp.zeros((I,)),
        valid=jnp.zeros((I,), bool))


def bbox_iou_2d(boxes_a, boxes_b):
    """[A, 4] x [B, 4] (x, y, w, h) -> IoU [A, B]
    (the 2D gate of ObjectMatcher.cc:131-147)."""
    ax0, ay0 = boxes_a[:, 0], boxes_a[:, 1]
    ax1, ay1 = ax0 + boxes_a[:, 2], ay0 + boxes_a[:, 3]
    bx0, by0 = boxes_b[:, 0], boxes_b[:, 1]
    bx1, by1 = bx0 + boxes_b[:, 2], by0 + boxes_b[:, 3]
    ix = jnp.maximum(0.0, jnp.minimum(ax1[:, None], bx1[None]) -
                     jnp.maximum(ax0[:, None], bx0[None]))
    iy = jnp.maximum(0.0, jnp.minimum(ay1[:, None], by1[None]) -
                     jnp.maximum(ay0[:, None], by0[None]))
    inter = ix * iy
    area_a = boxes_a[:, 2] * boxes_a[:, 3]
    area_b = boxes_b[:, 2] * boxes_b[:, 3]
    return inter / jnp.maximum(area_a[:, None] + area_b[None] - inter, 1e-9)
