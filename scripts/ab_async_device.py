#!/usr/bin/env python
"""Second-device async-mapping A/B — the LocalMapping-thread-overlap
measurement on the virtual device mesh.

The reference overlaps mapping with tracking on a second CPU thread at no
accuracy cost (System.cc:95, LocalMapping.cc:48). The TPU analogue is
_AsyncMapping.dispatch onto a SECOND DEVICE (slam/system.py): the mapping
pass runs there on a map snapshot while the tracker keeps the first
device, and the result merges at the next keyframe (merge lag bounded to
one KF by the insert-time barrier).

This script records, on the same synthetic circuit:
  sync        — mapping inline on device 0 (single-chip default)
  async dev1  — mapping dispatched to a second XLA device

for each: wall fps, per-frame median, ATE, keyframes, max merge lag.

On the 8-way virtual CPU mesh the two "devices" share physical cores, so
fps is contention-bound (see BENCHMARKS.md's ceiling analysis); the
decision-grade signals are the ATE cost of the bounded merge lag and that
the cross-device snapshot/merge protocol works. Run on a 2-chip host for
true overlap numbers.

Usage: python scripts/ab_async_device.py --frames 120 [--platform cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-tests")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--scale", type=int, default=2)
    ap.add_argument("--turns", type=float, default=1.15)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "axon"])
    ap.add_argument("--out", default=None, help="write the JSON record")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", args.platform)

    from scripts.ab_deviations import build_cfg
    from object_slam_tpu.datasets.synthetic import (SyntheticScene,
                                                    loop_trajectory)
    from object_slam_tpu.slam.system import SlamSystem

    cfg = build_cfg(args.scale)
    scene = SyntheticScene.make(cfg, seed=args.seed, n_objects=3,
                                plane_z=4.0)
    poses = loop_trajectory(args.frames, sweep=2 * np.pi * args.turns)
    rendered = [scene.render_rgbd(T) for T in poses]
    sems = [scene.sem_arrays(s, cfg.semantic.max_instances)
            for (_, _, _, s) in rendered]

    def run(async_mapping):
        sys_ = SlamSystem(cfg, enable_objects=True,
                          async_mapping=async_mapping)
        lags = []  # frames-since-dispatch, one sample per frame with a pass in flight
        dispatch_frame, last_pending_kf = -1, -1
        t0 = time.perf_counter()
        times = []
        for i, (T, (gray, depth, rgb, _)) in enumerate(zip(poses,
                                                           rendered)):
            tf0 = time.perf_counter()
            sys_.track_rgbd(gray, depth, rgb, sems[i], timestamp=i / 30.0)
            times.append(time.perf_counter() - tf0)
            if sys_._async is not None and sys_._async.pending is not None:
                if sys_._async.pending_kf != last_pending_kf:
                    dispatch_frame, last_pending_kf = i, sys_._async.pending_kf
                lags.append(i - dispatch_frame)
        total = time.perf_counter() - t0
        sys_.flush_mapping()
        errs = []
        for rec, T in zip(sys_.trajectory, poses):
            if rec.tracked:
                errs.append(np.linalg.norm(rec.Tcw[:3, 3] - T[:3, 3]))
        dev = ("dev1" if (sys_._async is not None
                          and sys_._async.device is not None) else "dev0")
        # merge lag in KFs: pending spans frames between consecutive KFs,
        # bounded to 1 KF by the insert-time merge barrier
        return {
            "async": async_mapping, "mapping_device": dev,
            "fps": args.frames / total,
            "median_frame_ms": float(np.median(times) * 1e3),
            "ate_rmse_mm": float(np.sqrt(np.mean(np.square(errs))) * 1e3),
            "keyframes": sys_.n_keyframes,
            "tracked": sum(1 for r in sys_.trajectory if r.tracked),
            "frames_with_pending_pass": len(lags),
            "merge_lag_frames_max": int(max(lags)) if lags else 0,
            "merge_lag_frames_median": float(np.median(lags)) if lags else 0.0,
        }

    out = {"n_devices": len(__import__("jax").devices())}
    for name, flag in [("sync", False), ("async_dev1", True)]:
        out[name] = run(flag)
        print(name, json.dumps(out[name]), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
