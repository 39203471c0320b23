#!/usr/bin/env python
"""Generate a KITTI-odometry-format stereo dataset (+ KITTI-keyed YOLACT
semantic dir with car masks) from the synthetic street-canyon scene, so
the full stereo experiment driver (scripts/run_kitti.py) runs end-to-end
without external downloads.

Layout written (what datasets/kitti.load_sequence expects):
  <out>/image_0/000000.png ...   left grayscale
  <out>/image_1/000000.png ...   right grayscale
  <out>/times.txt
  <out>/gt.txt                   KITTI 3x4 row-major cam-to-world poses
  <out>/semantic/<frame>/<frame>.txt + mask PNGs (label 2 = car)

Usage: python scripts/make_synth_kitti.py --out /tmp/synth_kitti --frames 150
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--frames", type=int, default=150)
    ap.add_argument("--speed", type=float, default=0.8)
    ap.add_argument("--seed", type=int, default=5)
    args = ap.parse_args()

    from PIL import Image
    from object_slam_tpu.config import SlamConfig
    from object_slam_tpu.datasets.synthetic import (SyntheticScene,
                                                    drive_trajectory)

    cfg = SlamConfig.kitti_stereo()
    poses = drive_trajectory(args.frames, speed=args.speed)
    centers = np.stack([np.linalg.inv(T)[:3, 3] for T in poses])
    scene = SyntheticScene.make(
        cfg, seed=args.seed, n_objects=6, plane_z=4.0, scale=8.0,
        n_structures=24,
        corridor_len=float(args.frames * args.speed + 20.0),
        path=centers)
    for b in scene.boxes:
        b['label'] = 2            # KITTI car class (Semantic.cc:11)

    seq = args.out
    os.makedirs(os.path.join(seq, "image_0"), exist_ok=True)
    os.makedirs(os.path.join(seq, "image_1"), exist_ok=True)
    sem_root = os.path.join(seq, "semantic")
    times, gt_lines = [], []

    # fork-based pool: the ray-caster is single-threaded numpy at ~4 s per
    # KITTI-resolution stereo frame; frames are independent. Context-
    # managed so workers are joined even when a render raises (ADVICE r2).
    import multiprocessing as mp
    with mp.get_context("fork").Pool(min(mp.cpu_count(), 16)) as pool:
        _render_loop(pool, scene, poses, seq, sem_root, times, gt_lines,
                     args)

    with open(os.path.join(seq, "times.txt"), "w") as f:
        f.write("\n".join(times) + "\n")
    with open(os.path.join(seq, "gt.txt"), "w") as f:
        f.write("\n".join(gt_lines) + "\n")
    print(f"wrote {args.frames} stereo frames to {seq}")


def _render_loop(pool, scene, poses, seq, sem_root, times, gt_lines, args):
    from PIL import Image
    renders = pool.imap(scene.render_stereo, poses, chunksize=4)

    for i, (T, render) in enumerate(zip(poses, renders)):
        gl, gr, depth, rgb, sem = render
        Image.fromarray(np.clip(gl, 0, 255).astype(np.uint8)).save(
            os.path.join(seq, "image_0", f"{i:06d}.png"))
        Image.fromarray(np.clip(gr, 0, 255).astype(np.uint8)).save(
            os.path.join(seq, "image_1", f"{i:06d}.png"))
        times.append(f"{i / 10.0:.6e}")
        Twc = np.linalg.inv(T)
        gt_lines.append(" ".join(f"{x:.9e}" for x in Twc[:3].reshape(-1)))

        # semantic dir keyed the KITTI way (zero-padded frame counter,
        # Semantic.cc:17 / semantic/loader.kitti_frame_key); mask files
        # are named <instance_id>.png per the loader contract
        key = f"{i:06d}"
        fdir = os.path.join(sem_root, key)
        os.makedirs(fdir, exist_ok=True)
        masks, labels, probs, bboxes, valid = sem
        lines = []
        for j in range(len(masks)):
            Image.fromarray((masks[j] * 255).astype(np.uint8)).save(
                os.path.join(fdir, f"{j}.png"))
            x, y, w, h = bboxes[j]
            lines.append(f"{labels[j]} {probs[j]:.3f} "
                         f"{x} {y} {w} {h} {j}")
        with open(os.path.join(fdir, f"{key}.txt"), "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
        if i % 25 == 0:
            print(f"frame {i}/{args.frames}", flush=True)


if __name__ == "__main__":
    main()
