"""Host-side loader for offline YOLACT instance-segmentation results.

Format parity with `Semantic::ReadSemanticTUMRGBD` / `ReadSemanticKittiStereo`
(`Semantic.cc:14-100`): per frame a directory `<semantic_dir>/<frame>/`
containing `<frame>.txt` with lines `label prob x y w h instance_id` and a
binary mask PNG `<instance_id>.png` per instance. TUM keys frames by the
timestamp string (`to_string(timestamp)`, 6 decimals); KITTI by a running
6-digit zero-padded frame counter. Label 63 (laptop) is remapped to 62 (tv)
for TUM; rows are filtered by `prob > min_confidence` and the per-dataset
label whitelist.

Output is the padded static slab consumed by semantic.object2d.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional

import numpy as np


@dataclass
class Detection:
    label: int
    prob: float
    bbox: np.ndarray          # (x, y, w, h)
    mask: np.ndarray          # [H, W] bool


def _read_mask(path: str) -> Optional[np.ndarray]:
    try:
        from PIL import Image
        m = np.asarray(Image.open(path))
    except Exception:
        return None
    if m.ndim == 3:
        m = m[..., 0]
    return m == 255


def read_semantic_dir(semantic_dir: str, frame_key: str,
                      min_confidence: float, valid_labels,
                      remap_63_to_62: bool = True) -> List[Detection]:
    """Parse one frame's detections. frame_key is the per-dataset directory
    name (TUM: timestamp string; KITTI: zero-padded counter)."""
    frame_dir = os.path.join(semantic_dir, frame_key)
    txt = os.path.join(frame_dir, frame_key + ".txt")
    dets: List[Detection] = []
    if not os.path.isfile(txt):
        return dets
    valid = set(valid_labels)
    with open(txt) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 7:
                continue
            label = int(parts[0])
            if remap_63_to_62 and label == 63:
                label = 62
            prob = float(parts[1])
            if prob <= min_confidence:
                continue
            if label not in valid:
                continue
            x, y, w, h = (float(parts[2]), float(parts[3]),
                          float(parts[4]), float(parts[5]))
            inst = int(parts[6])
            mask = _read_mask(os.path.join(frame_dir, f"{inst}.png"))
            if mask is None:
                continue
            dets.append(Detection(label=label, prob=prob,
                                  bbox=np.array([x, y, w, h], np.float32),
                                  mask=mask))
    return dets


def tum_frame_key(timestamp: float) -> str:
    """std::to_string(double) renders 6 decimal places."""
    return f"{timestamp:.6f}"


def kitti_frame_key(index: int) -> str:
    return f"{index:06d}"


def detections_to_arrays(dets: List[Detection], max_instances: int,
                         height: int, width: int):
    """Pad detections into the static [I] slab arrays (numpy, host side)."""
    I = max_instances
    masks = np.zeros((I, height, width), bool)
    labels = np.full((I,), -1, np.int32)
    probs = np.zeros((I,), np.float32)
    bboxes = np.zeros((I, 4), np.float32)
    valid = np.zeros((I,), bool)
    for i, d in enumerate(dets[:I]):
        masks[i] = d.mask
        labels[i] = d.label
        probs[i] = d.prob
        bboxes[i] = d.bbox
        valid[i] = True
    return masks, labels, probs, bboxes, valid
