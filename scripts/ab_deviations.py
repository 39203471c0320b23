#!/usr/bin/env python
"""A/B-measure the documented behavior deviations from the reference
(VERDICT round 1, item 10) on a loop-circuit sequence.

Three mapping-policy deviations are promoted to `cfg.mapping` flags:

  1. cull_recency_scope   — MapPointCulling only scrutinizes points during
                            their first ~3 KFs (reference behavior,
                            LocalMapping.cc:171-206) vs round-1's
                            test-forever variant.
  2. reelect_descriptors  — continuous min-median descriptor re-election
                            (MapPoint::ComputeDistinctiveDescriptors) vs
                            keeping the creation descriptor.
  3. kf_cull_scale_condition — KeyFrameCulling counts only same-or-finer-
                            scale observers (LocalMapping.cc:672-683) vs
                            scale-free counting.

Each variant runs the identical synthetic in-room loop circuit; the
winner-vs-loser ATE/robustness goes into PARITY.md.

Usage: python scripts/ab_deviations.py [--frames 120] [--scale 2]
       [--platform cpu|axon] [--variants base,recency_off,...]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


VARIANTS = {
    # name -> dict of MappingConfig field overrides
    "base": {},
    "recency_off": {"cull_recency_scope": False},
    "no_reelect": {"reelect_descriptors": False},
    "scale_cond_on": {"kf_cull_scale_condition": True},
}


def build_cfg(scale: int):
    """TUM2-shaped camera downscaled by `scale` (1 = full VGA)."""
    from object_slam_tpu.config import (SlamConfig, CameraConfig, OrbConfig,
                                        CapacityConfig)
    s = float(scale)
    cam = CameraConfig(
        width=int(640 // s), height=int(480 // s),
        fx=520.9 / s, fy=521.0 / s, cx=325.1 / s, cy=249.7 / s,
        dist=(0, 0, 0, 0, 0), bf=40.0 / s, th_depth=40.0,
        depth_map_factor=1.0)
    n_feat = max(300, int(1000 // s))
    return SlamConfig(
        camera=cam,
        orb=OrbConfig(n_features=n_feat, n_levels=8 if scale == 1 else 4),
        caps=CapacityConfig(n_kp=int(np.ceil(n_feat / 128) * 128),
                            max_points=32768 // (scale if scale <= 2 else 2),
                            max_keyframes=256))


def run_variant(cfg, scene, poses):
    import jax.numpy as jnp
    from object_slam_tpu.eval.ate import align_horn_svd
    from object_slam_tpu.slam.system import SlamSystem

    sys_ = SlamSystem(cfg, enable_objects=False, enable_mapping=True)
    est, gt, oks = [], [], []
    t0 = time.time()
    for i, T in enumerate(poses):
        gray, depth, rgb, sem = scene.render_rgbd(T)
        f = sys_.track_rgbd(jnp.asarray(gray), jnp.asarray(depth),
                            jnp.asarray(rgb), None,
                            timestamp=float(i) / 30.0)
        est.append(np.linalg.inv(np.asarray(f.Tcw))[:3, 3])
        gt.append(np.linalg.inv(T)[:3, 3])
        oks.append(bool(f.pose_ok))
    wall = time.time() - t0
    est, gt = np.array(est), np.array(gt)
    ok = np.array(oks)
    if ok.sum() >= 3:
        _, _, err = align_horn_svd(est[ok].T, gt[ok].T)
        ate_mm = float(np.sqrt((err ** 2).mean()) * 1e3)
        max_mm = float(err.max() * 1e3)
    else:
        ate_mm = max_mm = float("nan")
    res = {
        "tracked": int(ok.sum()), "frames": len(poses),
        "ate_rmse_mm": ate_mm, "max_err_mm": max_mm,
        "n_keyframes": int(sys_.n_keyframes),
        "n_points": int(sys_.n_points),
        "wall_s": round(wall, 1),
    }
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--scale", type=int, default=2,
                    help="camera downscale factor (1 = VGA)")
    ap.add_argument("--turns", type=float, default=1.15)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--platform", default=None, choices=["cpu", "axon"])
    ap.add_argument("--variants", default=",".join(VARIANTS))
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from object_slam_tpu.config import MappingConfig
    from object_slam_tpu.datasets.synthetic import (SyntheticScene,
                                                    loop_trajectory)

    cfg = build_cfg(args.scale)
    scene = SyntheticScene.make(cfg, seed=args.seed, n_objects=3,
                                plane_z=4.0)
    for b in scene.boxes:
        b["size"] = 0.9
    poses = loop_trajectory(args.frames, sweep=2 * np.pi * args.turns)

    results = {}
    for name in args.variants.split(","):
        over = VARIANTS[name]
        vcfg = cfg.replace(mapping=dataclasses.replace(
            MappingConfig(), **over))
        print(f"[{name}] {over or 'defaults'} ...", flush=True)
        results[name] = run_variant(vcfg, scene, poses)
        print(f"[{name}] {json.dumps(results[name])}", flush=True)

    print("\n=== A/B summary ===")
    print(f"{'variant':<16}{'tracked':>9}{'ATE mm':>9}{'max mm':>9}"
          f"{'KFs':>6}{'pts':>8}{'wall s':>8}")
    for name, r in results.items():
        print(f"{name:<16}{r['tracked']:>6}/{r['frames']:<3}"
              f"{r['ate_rmse_mm']:>8.1f}{r['max_err_mm']:>9.1f}"
              f"{r['n_keyframes']:>6}{r['n_points']:>8}{r['wall_s']:>8.1f}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
