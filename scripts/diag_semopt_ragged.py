#!/usr/bin/env python
"""Does the semantic pose refinement pay off under MASK NOISE?

On exact renderer masks the per-frame refinement is neutral (the r4/r5
isolation probes: median pose shift ~+0.2 mm) — plausibly because exact
masks leave nothing for the mask-attraction constraints
(ObjectOptimizer.cc:624 M_joint/M_semantic) to correct. Real YOLACT
masks are ragged. This A/B runs the SAME 200-frame circuit with
block-raggedized masks (datasets.synthetic.degrade_masks — the census
robustness model) through three arms:

  ragged_semopt_on   — full pipeline on degraded masks
  ragged_semopt_off  — object pipeline on, refinement disabled
  (the exact-mask arms live in results/experiments_r5.json: t200_a vs
   t200_semopt_off)

If the refinement helps anywhere, it is here. Either way the answer
becomes a committed measurement (VERDICT r4 item 5).

Usage: python scripts/diag_semopt_ragged.py --seq /tmp/synth_tum200b
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
    ap.add_argument("--seq", default="/tmp/synth_tum200b")
    ap.add_argument("--frames", type=int, default=0)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--shift", type=int, default=2)
    ap.add_argument("--holes", type=float, default=0.0,
                    help="salt-hole fraction; default 0 — interior salt "
                         "annihilates the 20x20 erosion membership gate "
                         "(0 objects), which is not how YOLACT masks fail")
    ap.add_argument("--platform", default=None, choices=["cpu", "axon"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from object_slam_tpu.config import SlamConfig
    from object_slam_tpu.datasets.synthetic import degrade_masks
    from object_slam_tpu.semantic.object2d import (pack_mask_bits,
                                                   unpack_mask_bits)
    from run_experiments import load_tum_frames, run_tum_variant

    cfg = SlamConfig.tum_rgbd()
    cfg_semoff = cfg.replace(objects=dataclasses.replace(
        cfg.objects, semopt_enabled=False))
    metas, frames = load_tum_frames(args.seq, cfg, args.frames)

    rng = np.random.RandomState(args.seed)
    ragged = []
    n_deg = 0
    for rgb8, d16, sem in frames:
        if sem is None:
            ragged.append((rgb8, d16, None))
            continue
        packed, labels, probs, bboxes, valid = sem
        M = np.asarray(unpack_mask_bits(packed, cfg.camera.width))
        Mn, Bn = degrade_masks(M, np.asarray(valid), rng,
                               shift=args.shift, hole_frac=args.holes)
        n_deg += int(np.asarray(valid).sum())
        ragged.append((rgb8, d16, (pack_mask_bits(Mn), labels, probs,
                                   np.asarray(Bn, np.float32), valid)))
    print(f"degraded {n_deg} instance masks over {len(frames)} frames",
          flush=True)

    out = {}
    # prewarm both program sets on 12 frames (untimed)
    run_tum_variant(args.seq, cfg, ragged[:12], metas[:12],
                    enable_objects=True)
    run_tum_variant(args.seq, cfg_semoff, ragged[:12], metas[:12],
                    enable_objects=True)
    for name, vcfg in [("ragged_semopt_on", cfg),
                       ("ragged_semopt_off", cfg_semoff)]:
        out[name] = run_tum_variant(args.seq, vcfg, ragged, metas,
                                    enable_objects=True,
                                    async_mapping=False)
        print(name, json.dumps(out[name])[:240], flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
