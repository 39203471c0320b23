#!/usr/bin/env python
"""Does the semantically constrained pose optimization HELP?

Round 3's only A/B said objects-ON cost 55% ATE on the 200-frame circuit
(78.4 vs 50.7 mm sync — VERDICT r3 item 3), which contradicts the
paper's thesis (ObjectOptimizer.cc:624). This isolates the per-frame
effect: run the staged host path (cfg.tracking.fused=False) so the pose
BEFORE the semantic refinement (the plain local-map optimum) and AFTER
it are both visible, and compare each against ground truth.

Usage:
  python scripts/diag_semopt.py --seq /tmp/synth_tum200 [--frames 200]
"""
import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", default="/tmp/synth_tum200")
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--platform", default=None, choices=["cpu", "axon"])
    args = ap.parse_args()
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from object_slam_tpu.config import SlamConfig
    from object_slam_tpu.datasets import tum
    from object_slam_tpu.slam.system import SlamSystem
    from run_experiments import load_tum_frames

    cfg = SlamConfig.tum_rgbd()
    cfg = cfg.replace(tracking=dataclasses.replace(
        cfg.tracking, fused=False, pipelined_readback=False))
    metas, frames = load_tum_frames(args.seq, cfg, args.frames)
    ts_gt, pos_gt, quat_gt = tum.load_groundtruth(args.seq)
    gt_by_ts = {round(t, 4): p for t, p in zip(ts_gt, pos_gt)}

    sys_ = SlamSystem(cfg, enable_objects=True, async_mapping=False)
    deltas = []
    for i, (rgb8, d16, sem) in enumerate(frames):
        f = sys_.track_rgbd(None, d16, rgb8, sem,
                            timestamp=metas[i].timestamp)
        gt_p = gt_by_ts.get(round(metas[i].timestamp, 4))
        pre = getattr(sys_, "_last_presem_Tcw", None)
        if gt_p is None or pre is None:
            continue
        c_pre = np.linalg.inv(np.asarray(pre))[:3, 3]
        c_post = np.linalg.inv(np.asarray(f.Tcw))[:3, 3]
        e_pre = float(np.linalg.norm(c_pre - gt_p))
        e_post = float(np.linalg.norm(c_post - gt_p))
        deltas.append((i, e_pre, e_post))
        if i % 25 == 0:
            print(f"f={i:3d} pre={e_pre*1000:7.2f}mm "
                  f"post={e_post*1000:7.2f}mm "
                  f"shift={(e_post-e_pre)*1000:+7.2f}mm", flush=True)

    d = np.asarray([(a, b) for _, a, b in deltas])
    if len(d) == 0:
        print(json.dumps({"n_semopt_frames": 0}))
        return
    diff_mm = (d[:, 1] - d[:, 0]) * 1000
    out = {
        "n_semopt_frames": len(d),
        "mean_pre_mm": float(d[:, 0].mean() * 1000),
        "mean_post_mm": float(d[:, 1].mean() * 1000),
        "median_shift_mm": float(np.median(diff_mm)),
        "mean_shift_mm": float(diff_mm.mean()),
        "p90_shift_mm": float(np.percentile(diff_mm, 90)),
        "frames_worse": int((diff_mm > 0.1).sum()),
        "frames_better": int((diff_mm < -0.1).sum()),
        "worst_shift_mm": float(diff_mm.max()),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
