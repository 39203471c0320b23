"""Per-frame front-end data: the TPU Frame pipeline.

Parity with `Frame` (`Frame.{h,cc}`): ORB extraction, keypoint
undistortion (`Frame.cc:644`), RGB-D depth lookup + virtual right disparity
(`:883-904`), stereo L/R matching (`:706-880` — via features/stereo.py),
per-level information weights, and Object2D construction (`:240-384` — via
semantic/object2d.py). The 64x48 occupancy grid (`Frame.cc:455-470`) is
unnecessary here: window searches are dense masked matrices, not per-cell
candidate lists.

A FrameData is a pure pytree — the whole build is one jitted call per
sensor type.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import numpy as _np

import jax
import jax.numpy as jnp

from object_slam_tpu.features.extractor import OrbExtractor, Keypoints
from object_slam_tpu.features import stereo as stereo_mod
from object_slam_tpu.geometry import camera as cam_mod
from object_slam_tpu.semantic import object2d as o2d_mod


class FrameData(NamedTuple):
    timestamp: jnp.ndarray       # [] f32
    uv_raw: jnp.ndarray          # [N, 2] distorted pixel coords
    uv: jnp.ndarray              # [N, 2] undistorted
    ur: jnp.ndarray              # [N] right-u (-1 mono)
    depth: jnp.ndarray           # [N] (-1 invalid)
    level: jnp.ndarray           # [N] int32
    angle: jnp.ndarray           # [N]
    response: jnp.ndarray        # [N]
    desc: jnp.ndarray            # [N, 8] uint32
    valid: jnp.ndarray           # [N] bool
    obj: o2d_mod.Object2DSlab    # per-frame detections
    obj3d: jnp.ndarray           # [I] int32: matched map Object3D per det (-1)
    kp_pt: jnp.ndarray           # [N] int32 matched map point (-1)
    Tcw: jnp.ndarray             # [4, 4] pose (identity until tracked)
    pose_ok: jnp.ndarray         # [] bool

    @property
    def n(self):
        return self.uv.shape[0]


_LUMA = (0.299, 0.587, 0.114)     # ITU-R BT.601, the cvtColor weights
                                  # (Tracking.cc:247-263 grayscale path)


def _to_f32_image(img):
    """Accept u8 images and cast ON DEVICE — the host ships 1 byte/px
    instead of 4, cutting PCIe (and remote-tunnel) transfer 4x. dtype is
    static under jit so the branch costs nothing."""
    if img is None:
        return None
    return img.astype(jnp.float32) if img.dtype != jnp.float32 else img


def _luma(rgb_f32):
    """BT.601 grayscale as ELEMENTWISE ops (VPU), deliberately not a
    matmul: TPU matmuls default to bf16 inputs, and bf16-quantized
    intensities measurably degrade FAST scores and BRIEF bits (ATE
    doubled on the 200-frame circuit when this was `rgb @ weights`)."""
    return (_LUMA[0] * rgb_f32[..., 0] + _LUMA[1] * rgb_f32[..., 1]
            + _LUMA[2] * rgb_f32[..., 2])


def _to_metric_depth(depth_img, depth_map_factor):
    """Accept raw u16 depth (TUM PNG encoding) and scale to meters on
    device (DepthMapFactor division, Tracking.cc:255-263)."""
    if depth_img.dtype == jnp.uint16:
        return depth_img.astype(jnp.float32) / jnp.float32(depth_map_factor)
    return _to_f32_image(depth_img)


# Same-config FrameBuilder instances share one compiled pipeline set:
# jax.jit keyed on a fresh bound method re-traces AND re-compiles per
# instance, and the remote-attached TPU backend cannot reuse the on-disk
# compilation cache — re-instantiating the system (bench A/B runs, test
# suites, drivers) paid minutes of identical compiles (measured r3).
_BUILDER_JIT_CACHE: dict = {}


class FrameBuilder:
    """Owns the compiled extraction+assembly pipelines for one geometry.

    All jitted builders accept compact transfer dtypes: u8 gray/rgb,
    u16 raw depth, and gray=None (luma derived from rgb on device) — the
    conversion happens device-side so a VGA RGB-D frame ships ~1.5 MB
    instead of ~6 MB."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.K = cam_mod.Intrinsics.from_config(cfg.camera)
        key = repr(cfg)
        cached = _BUILDER_JIT_CACHE.get(key)
        if cached is None:
            self.extractor = OrbExtractor(cfg)
            self._rgbd = jax.jit(self._build_rgbd)
            self._rgbd_noobj = jax.jit(self._build_rgbd_noobj)
            self._stereo = jax.jit(self._build_stereo)
            self._mono = jax.jit(self._build_mono)
            self._rgbd_blob = jax.jit(self._build_rgbd_blob)
            self._rgbd_blob_noobj = jax.jit(self._build_rgbd_blob_noobj)
            _BUILDER_JIT_CACHE[key] = (self.extractor, self._rgbd,
                                       self._rgbd_noobj, self._stereo,
                                       self._mono, self._rgbd_blob,
                                       self._rgbd_blob_noobj)
        else:
            (self.extractor, self._rgbd, self._rgbd_noobj, self._stereo,
             self._mono, self._rgbd_blob, self._rgbd_blob_noobj) = cached
        self.inv_sigma2 = self.extractor.inv_level_sigma2()
        self.scale_factors = self.extractor.scale_factors()

    # ------------------------------------------------------------------
    def build_rgbd(self, gray, depth_img, rgb, sem_arrays, timestamp):
        """gray [H, W] f32; depth_img [H, W] metric depth; rgb [H, W, 3];
        sem_arrays = (masks, labels, probs, bboxes, valid) static slab.
        masks may be [I, H, W] bool (packed here) or already bit-packed
        [I, H, ceil(W/8)] uint8 (pack_sem_arrays) — the device only ever
        receives the packed form (8x less transfer).

        Host-side dispatch: frames with no valid detections take the
        object-free pipeline (skips mask erosion / HSV histograms / the
        jump-flooding feature transforms — ~3x frame-build cost when idle).
        """
        import numpy as np
        if sem_arrays is None or not np.any(np.asarray(sem_arrays[4])):
            return self._rgbd_noobj(gray, depth_img, _np.float32(timestamp),
                                    rgb if gray is None else None)
        return self._rgbd(gray, depth_img, rgb,
                          *self.pack_sem_arrays(sem_arrays),
                          _np.float32(timestamp))

    def pack_sem_arrays(self, sem_arrays):
        """Bit-pack the mask slab for transfer (idempotent)."""
        import numpy as np
        masks = sem_arrays[0]
        if getattr(masks, "dtype", None) == np.uint8 or \
                (hasattr(masks, "dtype") and masks.dtype == jnp.uint8):
            return sem_arrays
        return (o2d_mod.pack_mask_bits(masks),) + tuple(sem_arrays[1:])

    # ------------------------------------------------------------------
    # single-transfer ingestion: every per-frame tensor in ONE u8 blob
    # ------------------------------------------------------------------
    def pack_frame_blob(self, depth16, rgb8, sem_arrays):
        """Host: concatenate the frame's device-bound tensors (u16 depth,
        u8 rgb, bit-packed masks, labels/probs/bboxes) into ONE uint8
        blob. Each separate host->device transfer costs a dispatch RPC on
        a remote-attached chip (~3-4 ms each; six per frame measured as
        the whole host-in-the-loop gap); production PCIe pays a DMA setup
        per buffer the same way. Returns (blob u8[*], inst_valid host
        bool[I] or None) — inst_valid stays host-side for the
        object-free-pipeline branch."""
        cfg = self.cfg
        I = cfg.semantic.max_instances
        parts = [_np.ascontiguousarray(depth16, dtype='<u2').tobytes(),
                 _np.ascontiguousarray(rgb8, dtype=_np.uint8).tobytes()]
        if sem_arrays is None:
            blob = _np.frombuffer(b"".join(parts), _np.uint8)
            return blob, None
        sem = self.pack_sem_arrays(sem_arrays)
        masks, labels, probs, bboxes, valid = sem
        parts += [_np.ascontiguousarray(masks, dtype=_np.uint8).tobytes(),
                  _np.ascontiguousarray(labels, dtype='<i4').tobytes(),
                  _np.ascontiguousarray(probs, dtype='<f4').tobytes(),
                  _np.ascontiguousarray(bboxes, dtype='<f4').tobytes()]
        blob = _np.frombuffer(b"".join(parts), _np.uint8)
        return blob, _np.asarray(valid)

    def build_rgbd_blob(self, blob, inst_valid, timestamp):
        """Jitted single-transfer RGB-D frame build: device-side unpack of
        pack_frame_blob's layout, then the standard pipeline."""
        if inst_valid is None or not _np.any(inst_valid):
            return self._rgbd_blob_noobj(blob, _np.float32(timestamp))
        return self._rgbd_blob(blob, jnp.asarray(inst_valid),
                               _np.float32(timestamp))

    def _unpack_blob(self, blob, with_sem: bool):
        cfg = self.cfg
        H, W, I = cfg.camera.height, cfg.camera.width, cfg.semantic.max_instances
        Wb = (W + 7) // 8
        o0 = H * W * 2
        d16 = jax.lax.bitcast_convert_type(
            blob[:o0].reshape(H, W, 2), jnp.uint16)
        o1 = o0 + H * W * 3
        rgb8 = blob[o0:o1].reshape(H, W, 3)
        if not with_sem:
            return d16, rgb8, None, None, None, None
        o2 = o1 + I * H * Wb
        masks = blob[o1:o2].reshape(I, H, Wb)
        o3 = o2 + I * 4
        labels = jax.lax.bitcast_convert_type(
            blob[o2:o3].reshape(I, 4), jnp.int32)
        o4 = o3 + I * 4
        probs = jax.lax.bitcast_convert_type(
            blob[o3:o4].reshape(I, 4), jnp.float32)
        o5 = o4 + I * 16
        bboxes = jax.lax.bitcast_convert_type(
            blob[o4:o5].reshape(I, 4, 4), jnp.float32)
        return d16, rgb8, masks, labels, probs, bboxes

    def _build_rgbd_blob(self, blob, inst_valid, timestamp) -> FrameData:
        d16, rgb8, masks, labels, probs, bboxes = self._unpack_blob(
            blob, with_sem=True)
        return self._build_rgbd(None, d16, rgb8, masks, labels, probs,
                                bboxes, inst_valid, timestamp)

    def _build_rgbd_blob_noobj(self, blob, timestamp) -> FrameData:
        d16, rgb8, _, _, _, _ = self._unpack_blob(blob, with_sem=False)
        return self._build_rgbd_noobj(None, d16, timestamp, rgb8)

    def _build_rgbd_noobj(self, gray, depth_img, timestamp,
                          rgb=None) -> FrameData:
        cfg = self.cfg
        if gray is None:
            gray = _luma(_to_f32_image(rgb))
        else:
            gray = _to_f32_image(gray)
        depth_img = _to_metric_depth(depth_img, cfg.camera.depth_map_factor)
        kp = self.extractor(gray)
        uv_und = cam_mod.undistort_points(self.K, kp.uv)
        h, w = gray.shape
        yy = jnp.clip(jnp.round(kp.uv[:, 1]).astype(jnp.int32), 0, h - 1)
        xx = jnp.clip(jnp.round(kp.uv[:, 0]).astype(jnp.int32), 0, w - 1)
        z = depth_img[yy, xx]
        ur, z_ok = stereo_mod.rgbd_virtual_right(uv_und, z, self.K.bf)
        depth = jnp.where(z_ok & kp.valid, z, -1.0)
        obj = o2d_mod.empty_slab(cfg.semantic.max_instances,
                                 cfg.camera.height, cfg.camera.width,
                                 kp.uv.shape[0])
        return self._assemble(kp, uv_und, ur, depth, obj, timestamp)

    def _build_rgbd(self, gray, depth_img, rgb, masks_packed, labels, probs,
                    bboxes, inst_valid, timestamp) -> FrameData:
        cfg = self.cfg
        masks = o2d_mod.unpack_mask_bits(masks_packed, cfg.camera.width)
        rgb = _to_f32_image(rgb)
        if gray is None:
            gray = _luma(rgb)
        else:
            gray = _to_f32_image(gray)
        depth_img = _to_metric_depth(depth_img, cfg.camera.depth_map_factor)
        kp = self.extractor(gray)
        uv_und = cam_mod.undistort_points(self.K, kp.uv)
        h, w = gray.shape
        yy = jnp.clip(jnp.round(kp.uv[:, 1]).astype(jnp.int32), 0, h - 1)
        xx = jnp.clip(jnp.round(kp.uv[:, 0]).astype(jnp.int32), 0, w - 1)
        z = depth_img[yy, xx]
        ur, z_ok = stereo_mod.rgbd_virtual_right(uv_und, z, self.K.bf)
        depth = jnp.where(z_ok & kp.valid, z, -1.0)

        obj = o2d_mod.build_object2ds(
            rgb, masks, labels, probs, bboxes, inst_valid,
            kp.uv, depth, kp.valid,
            th_depth=cfg.camera.th_depth * cfg.camera.baseline,
            min_kps=cfg.semantic.min_kps_rgbd,
            mask_margin=cfg.semantic.mask_margin)
        return self._assemble(kp, uv_und, ur, depth, obj, timestamp)

    # ------------------------------------------------------------------
    def build_stereo(self, gray_l, gray_r, rgb, sem_arrays, timestamp):
        return self._stereo(gray_l, gray_r, rgb,
                            *self.pack_sem_arrays(sem_arrays),
                            _np.float32(timestamp))

    def _build_stereo(self, gray_l, gray_r, rgb, masks_packed, labels, probs,
                      bboxes, inst_valid, timestamp) -> FrameData:
        cfg = self.cfg
        masks = o2d_mod.unpack_mask_bits(masks_packed, cfg.camera.width)
        gray_l = _to_f32_image(gray_l)
        gray_r = _to_f32_image(gray_r)
        if rgb is None:
            # grayscale stereo rigs (KITTI odometry): derive the HSV-
            # histogram input on DEVICE instead of shipping an HxWx3 f32
            # tensor per frame (11 MB over the tunnel at KITTI res — the
            # transfer, not compute, dominated frame build)
            rgb = jnp.stack([gray_l] * 3, -1)
        rgb = _to_f32_image(rgb)
        kp_l = self.extractor(gray_l)
        kp_r = self.extractor(gray_r)
        uv_und = cam_mod.undistort_points(self.K, kp_l.uv)
        ur, depth, ok = stereo_mod.match_stereo(
            kp_l.uv, kp_l.level, kp_l.desc, kp_l.valid,
            kp_r.uv, kp_r.level, kp_r.desc, kp_r.valid,
            gray_l, gray_r, self.scale_factors,
            float(self.K.bf), float(self.K.fx),
            min_z=cfg.camera.baseline)
        depth = jnp.where(ok, depth, -1.0)
        # undistorted ur shift equals the raw one for the (0-distortion)
        # stereo datasets (KITTI rectified); keep raw ur.
        obj = o2d_mod.build_object2ds(
            rgb, masks, labels, probs, bboxes, inst_valid,
            kp_l.uv, depth, kp_l.valid,
            th_depth=cfg.camera.th_depth * cfg.camera.baseline,
            min_kps=cfg.semantic.min_kps_stereo,
            mask_margin=cfg.semantic.mask_margin)
        return self._assemble(kp_l, uv_und, jnp.where(ok, ur, -1.0), depth,
                              obj, timestamp)

    # ------------------------------------------------------------------
    def build_mono(self, gray, timestamp):
        """Monocular frame: no depth, no virtual right, no objects (the
        reference's object pipeline requires depth — System.cc:334-338)."""
        return self._mono(gray, _np.float32(timestamp))

    def _build_mono(self, gray, timestamp) -> FrameData:
        gray = _to_f32_image(gray)
        kp = self.extractor(gray)
        uv_und = cam_mod.undistort_points(self.K, kp.uv)
        n = kp.uv.shape[0]
        obj = o2d_mod.empty_slab(self.cfg.semantic.max_instances,
                                 self.cfg.camera.height,
                                 self.cfg.camera.width, n)
        return self._assemble(kp, uv_und, jnp.full((n,), -1.0),
                              jnp.full((n,), -1.0), obj, timestamp)

    # ------------------------------------------------------------------
    def _assemble(self, kp: Keypoints, uv_und, ur, depth, obj,
                  timestamp) -> FrameData:
        n = kp.uv.shape[0]
        return FrameData(
            timestamp=timestamp,
            uv_raw=kp.uv, uv=uv_und, ur=ur, depth=depth,
            level=kp.level, angle=kp.angle, response=kp.response,
            desc=kp.desc, valid=kp.valid, obj=obj,
            obj3d=jnp.full((obj.label.shape[0],), -1, jnp.int32),
            kp_pt=jnp.full((n,), -1, jnp.int32),
            Tcw=jnp.eye(4), pose_ok=jnp.array(False))

    def empty_semantics(self):
        cfg = self.cfg
        import numpy as np
        I = cfg.semantic.max_instances
        H, W = cfg.camera.height, cfg.camera.width
        return (np.zeros((I, H, (W + 7) // 8), np.uint8),
                np.full((I,), -1, np.int32),
                np.zeros((I,), np.float32), np.zeros((I, 4), np.float32),
                np.zeros((I,), bool))
