#!/usr/bin/env python
"""Generate a TUM-RGB-D-format dataset (+ YOLACT-format semantic dir) from
the synthetic ray-cast scene — lets the full experiment driver
(scripts/run_tum.py) run end-to-end without external downloads.

Usage: python scripts/make_synth_tum.py --out /tmp/synth_tum --frames 60
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--step", type=float, default=0.01)
    ap.add_argument("--traj", choices=["orbit", "loop"], default="orbit",
                    help="'loop' = closed in-room circuit that revisits "
                         "the start (loop-closure / long-sequence testing)")
    ap.add_argument("--turns", type=float, default=1.0,
                    help="loop sweep in full turns; >1 retraces the ring "
                         "so the revisit spans many keyframes (gives the "
                         "3-consecutive-KF loop-consistency gate, "
                         "LoopClosing.cc:150-226, something to see)")
    ap.add_argument("--seed", type=int, default=3)
    args = ap.parse_args()

    from PIL import Image
    from object_slam_tpu.config import SlamConfig
    from object_slam_tpu.datasets.synthetic import (SyntheticScene,
                                                    orbit_poses,
                                                    loop_trajectory)

    cfg = SlamConfig.tum_rgbd()
    scene = SyntheticScene.make(cfg, seed=args.seed, n_objects=3,
                                plane_z=4.0)
    for b in scene.boxes:           # big objects for the VGA geometry
        b['size'] = 0.9
    if args.traj == "loop":
        import numpy as _np
        poses = loop_trajectory(args.frames,
                                sweep=2 * _np.pi * args.turns)
    else:
        poses = orbit_poses(args.frames, step=args.step)

    seq = args.out
    os.makedirs(os.path.join(seq, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(seq, "depth"), exist_ok=True)
    sem_root = os.path.join(seq, "semantic")
    rgb_lines, depth_lines, gt_lines = [], [], []

    for i, T in enumerate(poses):
        ts = 1000.0 + i / 30.0
        key = f"{ts:.6f}"
        gray, depth, rgb, sem = scene.render_rgbd(T)
        rgb_name = f"rgb/{key}.png"
        depth_name = f"depth/{key}.png"
        Image.fromarray(np.clip(rgb, 0, 255).astype(np.uint8)).save(
            os.path.join(seq, rgb_name))
        d16 = np.clip(depth * cfg.camera.depth_map_factor, 0, 65535)
        Image.fromarray(d16.astype(np.uint16)).save(
            os.path.join(seq, depth_name))
        rgb_lines.append(f"{key} {rgb_name}")
        depth_lines.append(f"{key} {depth_name}")

        Twc = np.linalg.inv(T)
        t = Twc[:3, 3]
        from object_slam_tpu.eval.trajectory_io import _rot_to_quat
        q = _rot_to_quat(Twc[:3, :3])
        gt_lines.append(f"{key} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
                        f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}")

        # semantic dir: <sem>/<key>/<key>.txt + <instance>.png
        masks, labels, probs, bboxes, valid = sem
        fdir = os.path.join(sem_root, key)
        os.makedirs(fdir, exist_ok=True)
        with open(os.path.join(fdir, key + ".txt"), "w") as f:
            for j in range(len(masks)):
                x, y, w, h = bboxes[j]
                f.write(f"{labels[j]} {probs[j]:.3f} {int(x)} {int(y)} "
                        f"{int(w)} {int(h)} {j}\n")
                Image.fromarray((masks[j] * 255).astype(np.uint8)).save(
                    os.path.join(fdir, f"{j}.png"))

    for name, lines in [("rgb.txt", rgb_lines), ("depth.txt", depth_lines),
                        ("groundtruth.txt", gt_lines)]:
        with open(os.path.join(seq, name), "w") as f:
            f.write("# synthetic\n" + "\n".join(lines) + "\n")
    print(f"wrote {len(poses)} frames to {seq} (semantic dir: {sem_root})")


if __name__ == "__main__":
    main()
