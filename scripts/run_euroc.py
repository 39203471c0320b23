#!/usr/bin/env python
"""EuRoC MAV stereo/monocular experiment driver.

Parity with `Examples/Stereo/stereo_euroc.cc` / `mono_euroc.cc`: enumerate
cam0/cam1 images from a timestamps file (or the mav0 csv), stereo-rectify
with the LEFT./RIGHT. calibration of the settings YAML, run the pipeline,
save a TUM-format trajectory, and (optionally) evaluate ATE against the
mav0 ground-truth csv.

Usage:
  python scripts/run_euroc.py --mav /data/euroc/MH_01_easy/mav0 \
      --calib Examples/Stereo/EuRoC.yaml [--mono] [--gt auto]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mav", required=True, help="path to mav0/")
    ap.add_argument("--calib", required=True, help="settings YAML with "
                    "LEFT./RIGHT. rectification blocks")
    ap.add_argument("--times", default=None,
                    help="optional timestamps file (default: cam0 csv)")
    ap.add_argument("--out", default="ExpResults")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--mono", action="store_true")
    ap.add_argument("--loop", action="store_true")
    ap.add_argument("--gt", default="auto",
                    help="'auto' = mav0/state_groundtruth_estimate0/data.csv")
    ap.add_argument("--platform", default=None, choices=["cpu", "axon"],
                    help="force the JAX backend (config.update beats the "
                         "sitecustomized jax_platforms).")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from object_slam_tpu.config import SlamConfig
    from object_slam_tpu.datasets import euroc
    from object_slam_tpu.eval import ate as ate_mod, trajectory_io
    from object_slam_tpu.native.loader import FramePrefetcher
    from object_slam_tpu.slam.system import SlamSystem

    calib = euroc.EurocCalib.from_yaml(args.calib)
    base = SlamConfig.euroc_stereo()
    cfg = base.replace(camera=euroc.euroc_camera_config(calib),
                       sensor="mono" if args.mono else "stereo")
    if args.times:
        frames = euroc.load_sequence(
            os.path.join(args.mav, "cam0", "data"),
            os.path.join(args.mav, "cam1", "data"), args.times)
    else:
        frames = euroc.load_sequence_mav(args.mav)
    if args.max_frames:
        frames = frames[:args.max_frames]

    rect = euroc.Rectifier(calib)
    sys_ = SlamSystem(cfg, enable_objects=False, enable_loop=args.loop)
    pf = FramePrefetcher(n_workers=4, capacity=6)
    for i, fr in enumerate(frames):
        pf.submit(2 * i, fr.left_path)
        if not args.mono:
            pf.submit(2 * i + 1, fr.right_path)

    t0 = time.perf_counter()
    for i, fr in enumerate(frames):
        gl, _, _ = pf.get(2 * i)
        gl = gl.astype(np.float32)
        if gl.ndim == 3:
            gl = gl @ np.array([0.299, 0.587, 0.114], np.float32)
        if args.mono:
            gl = euroc.remap_bilinear(gl, rect.lx, rect.ly)
            sys_.track_mono(jnp.asarray(gl), timestamp=fr.timestamp)
        else:
            gr, _, _ = pf.get(2 * i + 1)
            gr = gr.astype(np.float32)
            if gr.ndim == 3:
                gr = gr @ np.array([0.299, 0.587, 0.114], np.float32)
            gl, gr = rect(gl, gr)
            rgb = np.stack([gl] * 3, -1)
            sys_.track_stereo(jnp.asarray(gl), jnp.asarray(gr),
                              jnp.asarray(rgb), None,
                              timestamp=fr.timestamp)
        if i % 100 == 0:
            print(f"frame {i}/{len(frames)} kfs={sys_.n_keyframes}")
    total = time.perf_counter() - t0
    pf.close()

    os.makedirs(args.out, exist_ok=True)
    traj = sys_.final_trajectory()
    trajectory_io.save_trajectory_tum(
        os.path.join(args.out, "CameraTrajectory.txt"), traj)

    result = {"frames": len(frames), "fps": len(frames) / total,
              "keyframes": sys_.n_keyframes, "points": sys_.n_points}
    gt_path = (os.path.join(args.mav, "state_groundtruth_estimate0",
                            "data.csv") if args.gt == "auto" else args.gt)
    if gt_path and os.path.isfile(gt_path):
        gt_ts, gt_pos, _ = euroc.load_groundtruth_csv(gt_path)
        est_ts = np.array([t for t, _, _ in traj])
        est = np.array([np.linalg.inv(T)[:3, 3] for _, T, _ in traj])
        pairs = ate_mod.associate_timestamps(est_ts, gt_ts, max_dt=0.02)
        if len(pairs) > 10:
            ia = [a for a, _ in pairs]
            ib = [b for _, b in pairs]
            result["ate_rmse"] = ate_mod.ate_rmse(est[ia], gt_pos[ib])
    print(json.dumps(result))


if __name__ == "__main__":
    main()
