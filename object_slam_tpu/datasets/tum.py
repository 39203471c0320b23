"""TUM RGB-D dataset loader.

Parity with the reference's TUM pipeline: `associate.py`-style rgb/depth
pairing by timestamp (the README instructs running associate.py,
`README.md:58-60`; `Examples/RGB-D/rgbd_tum.cc:33-76` reads the resulting
association file), DepthMapFactor scaling (`Tracking.cc:258-263`), and the
per-frame YOLACT semantic directory (`Semantic.cc:57`).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from object_slam_tpu.eval.ate import associate_timestamps
from object_slam_tpu.semantic import loader as sem_loader


@dataclass
class TumFrame:
    timestamp: float
    rgb_path: str
    depth_path: str


def read_file_list(path: str) -> List[Tuple[float, str]]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith('#'):
                continue
            parts = line.split()
            out.append((float(parts[0]), parts[1]))
    return out


def load_sequence(seq_dir: str, max_dt: float = 0.02) -> List[TumFrame]:
    rgb = read_file_list(os.path.join(seq_dir, 'rgb.txt'))
    depth = read_file_list(os.path.join(seq_dir, 'depth.txt'))
    pairs = associate_timestamps([t for t, _ in rgb], [t for t, _ in depth],
                                 max_dt)
    frames = []
    for ia, ib in pairs:
        frames.append(TumFrame(
            timestamp=rgb[ia][0],
            rgb_path=os.path.join(seq_dir, rgb[ia][1]),
            depth_path=os.path.join(seq_dir, depth[ib][1])))
    return frames


def load_frame_arrays(frame: TumFrame, depth_factor: float):
    """Returns (gray [H,W] f32, depth [H,W] f32 metric, rgb [H,W,3] f32)."""
    from PIL import Image
    rgb = np.asarray(Image.open(frame.rgb_path), np.float32)
    if rgb.ndim == 2:
        rgb = np.stack([rgb] * 3, -1)
    gray = rgb @ np.array([0.299, 0.587, 0.114], np.float32)
    d = np.asarray(Image.open(frame.depth_path), np.float32) / depth_factor
    return gray, d, rgb


def load_groundtruth(seq_dir: str):
    """groundtruth.txt -> (timestamps [N], positions [N, 3], quats [N, 4])."""
    ts, pos, quat = [], [], []
    with open(os.path.join(seq_dir, 'groundtruth.txt')) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith('#'):
                continue
            v = [float(x) for x in line.split()]
            ts.append(v[0])
            pos.append(v[1:4])
            quat.append(v[4:8])
    return np.array(ts), np.array(pos), np.array(quat)


def load_semantics(semantic_dir: str, timestamp: float, cfg):
    dets = sem_loader.read_semantic_dir(
        semantic_dir, sem_loader.tum_frame_key(timestamp),
        cfg.semantic.min_confidence, cfg.semantic.valid_labels_tum)
    return sem_loader.detections_to_arrays(
        dets, cfg.semantic.max_instances, cfg.camera.height, cfg.camera.width)
