"""ctypes bindings for the native host runtime (liboslam_host.so).

Provides:
  * decode_image(path) — synchronous PNG/JPEG decode (libpng/libjpeg).
  * FramePrefetcher — threaded frame pipeline: submit (rgb, depth, masks)
    paths ahead of time; workers decode off the tracking thread; `get`
    returns numpy views copied out of the runtime's buffers.

Falls back to PIL transparently if the shared library is missing and
cannot be built (the native path is an optimization, not a correctness
dependency).
"""

from __future__ import annotations

import ctypes as ct
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "liboslam_host.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO)
    except Exception:
        return False


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) and not _build():
        return None
    lib = ct.CDLL(_SO)
    lib.oslam_loader_create.restype = ct.c_void_p
    lib.oslam_loader_create.argtypes = [ct.c_int, ct.c_int]
    lib.oslam_loader_destroy.argtypes = [ct.c_void_p]
    lib.oslam_submit.argtypes = [ct.c_void_p, ct.c_int, ct.c_char_p,
                                 ct.c_char_p, ct.POINTER(ct.c_char_p),
                                 ct.c_int]
    lib.oslam_submit.restype = ct.c_int
    u8p = ct.POINTER(ct.c_uint8)
    lib.oslam_wait.argtypes = [
        ct.c_void_p, ct.c_int,
        ct.POINTER(u8p), ct.POINTER(ct.c_int), ct.POINTER(ct.c_int), ct.POINTER(ct.c_int),
        ct.POINTER(u8p), ct.POINTER(ct.c_int), ct.POINTER(ct.c_int), ct.POINTER(ct.c_int),
        ct.POINTER(u8p), ct.POINTER(ct.c_int), ct.POINTER(ct.c_int),
        ct.POINTER(ct.c_int), ct.c_int]
    lib.oslam_wait.restype = ct.c_int
    lib.oslam_release.argtypes = [ct.c_void_p, ct.c_int]
    lib.oslam_decode.argtypes = [ct.c_char_p, u8p, ct.c_int,
                                 ct.POINTER(ct.c_int), ct.POINTER(ct.c_int),
                                 ct.POINTER(ct.c_int), ct.POINTER(ct.c_int)]
    lib.oslam_decode.restype = ct.c_int
    _lib = lib
    return lib


def native_available() -> bool:
    return get_lib() is not None


def decode_image(path: str) -> np.ndarray:
    """Decode PNG/JPEG -> numpy [H, W] (uint8/uint16) or [H, W, 3] uint8."""
    lib = get_lib()
    if lib is None:
        from PIL import Image
        return np.asarray(Image.open(path))
    cap = 64 * 1024 * 1024
    buf = np.empty(cap, np.uint8)
    h = ct.c_int()
    w = ct.c_int()
    c = ct.c_int()
    bits = ct.c_int()
    n = lib.oslam_decode(path.encode(), buf.ctypes.data_as(
        ct.POINTER(ct.c_uint8)), cap, ct.byref(h), ct.byref(w),
        ct.byref(c), ct.byref(bits))
    if n < 0:
        raise IOError(f"native decode failed for {path}")
    data = buf[:n]
    if bits.value == 16:
        arr = data.view(np.uint16).reshape(h.value, w.value)
    elif c.value == 1:
        arr = data.reshape(h.value, w.value)
    else:
        arr = data.reshape(h.value, w.value, c.value)
    return arr.copy()


class FramePrefetcher:
    """In-order frame pipeline over the native worker pool."""

    def __init__(self, n_workers: int = 4, capacity: int = 8,
                 max_masks: int = 16):
        self.lib = get_lib()
        self.max_masks = max_masks
        self._handle = None
        if self.lib is not None:
            self._handle = self.lib.oslam_loader_create(n_workers, capacity)
        self._fallback: dict = {}

    def submit(self, frame_id: int, rgb_path: str,
               depth_path: Optional[str] = None,
               mask_paths: Sequence[str] = ()):
        if self._handle is None:
            self._fallback[frame_id] = (rgb_path, depth_path,
                                        list(mask_paths))
            return
        arr = (ct.c_char_p * len(mask_paths))(
            *[p.encode() for p in mask_paths])
        rc = self.lib.oslam_submit(
            self._handle, frame_id, rgb_path.encode(),
            depth_path.encode() if depth_path else None,
            arr, len(mask_paths))
        if rc != 0:
            raise RuntimeError("submit failed")

    def get(self, frame_id: int
            ) -> Tuple[np.ndarray, Optional[np.ndarray], List[np.ndarray]]:
        if self._handle is None:
            from PIL import Image
            rgb_path, depth_path, mask_paths = self._fallback.pop(frame_id)
            rgb = np.asarray(Image.open(rgb_path))
            depth = np.asarray(Image.open(depth_path)) if depth_path else None
            masks = [np.asarray(Image.open(p)) for p in mask_paths]
            return rgb, depth, masks

        u8p = ct.POINTER(ct.c_uint8)
        rgb_p = u8p()
        rh = ct.c_int(); rw = ct.c_int(); rc_ = ct.c_int()
        dep_p = u8p()
        dh = ct.c_int(); dw = ct.c_int(); dbits = ct.c_int()
        mask_ps = (u8p * self.max_masks)()
        mh = (ct.c_int * self.max_masks)()
        mw = (ct.c_int * self.max_masks)()
        nm = ct.c_int()
        rc = self.lib.oslam_wait(
            self._handle, frame_id,
            ct.byref(rgb_p), ct.byref(rh), ct.byref(rw), ct.byref(rc_),
            ct.byref(dep_p), ct.byref(dh), ct.byref(dw), ct.byref(dbits),
            mask_ps, mh, mw, ct.byref(nm), self.max_masks)
        if rc != 0:
            raise IOError(f"frame {frame_id} decode failed")

        def view(ptr, shape, dtype=np.uint8):
            size = int(np.prod(shape)) * np.dtype(dtype).itemsize
            raw = ct.cast(ptr, ct.POINTER(ct.c_uint8 * size)).contents
            return np.frombuffer(raw, dtype=dtype).reshape(shape).copy()

        if rc_.value == 1:
            rgb = view(rgb_p, (rh.value, rw.value))
        else:
            rgb = view(rgb_p, (rh.value, rw.value, rc_.value))
        depth = None
        if dh.value:
            dt = np.uint16 if dbits.value == 16 else np.uint8
            depth = view(dep_p, (dh.value, dw.value), dt)
        masks = [view(mask_ps[i], (int(mh[i]), int(mw[i])))
                 for i in range(nm.value)]
        self.lib.oslam_release(self._handle, frame_id)
        return rgb, depth, masks

    def close(self):
        if self._handle is not None:
            self.lib.oslam_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
