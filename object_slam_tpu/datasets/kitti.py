"""KITTI odometry stereo loader.

Parity with `Examples/Stereo/stereo_kitti.cc:28-60` (image_0/image_1 +
times.txt) and the KITTI semantic directory keyed by a running frame
counter (`Semantic.cc:14-55`). Ground truth format matches
`ExpResults/KITTI/groundtruth/*.txt` (3x4 row-major camera-to-world).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List

import numpy as np

from object_slam_tpu.semantic import loader as sem_loader


@dataclass
class KittiFrame:
    index: int
    timestamp: float
    left_path: str
    right_path: str


def load_sequence(seq_dir: str) -> List[KittiFrame]:
    with open(os.path.join(seq_dir, 'times.txt')) as f:
        times = [float(x) for x in f.read().split()]
    frames = []
    for i, t in enumerate(times):
        name = f"{i:06d}.png"
        frames.append(KittiFrame(
            index=i, timestamp=t,
            left_path=os.path.join(seq_dir, 'image_0', name),
            right_path=os.path.join(seq_dir, 'image_1', name)))
    return frames


def load_frame_arrays(frame: KittiFrame):
    from PIL import Image
    gl = np.asarray(Image.open(frame.left_path), np.float32)
    gr = np.asarray(Image.open(frame.right_path), np.float32)
    if gl.ndim == 3:
        gl = gl @ np.array([0.299, 0.587, 0.114], np.float32)
        gr = gr @ np.array([0.299, 0.587, 0.114], np.float32)
    rgb = np.stack([gl] * 3, -1)
    return gl, gr, rgb


def load_groundtruth(path: str):
    """KITTI gt: [N, 4, 4] camera-to-world."""
    out = []
    with open(path) as f:
        for line in f:
            v = [float(x) for x in line.split()]
            if len(v) != 12:
                continue
            T = np.eye(4)
            T[:3, :4] = np.array(v).reshape(3, 4)
            out.append(T)
    return np.stack(out)


def load_semantics(semantic_dir: str, index: int, cfg):
    dets = sem_loader.read_semantic_dir(
        semantic_dir, sem_loader.kitti_frame_key(index),
        cfg.semantic.min_confidence, cfg.semantic.valid_labels_kitti,
        remap_63_to_62=False)
    return sem_loader.detections_to_arrays(
        dets, cfg.semantic.max_instances, cfg.camera.height, cfg.camera.width)
