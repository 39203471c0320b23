#!/usr/bin/env python
"""TUM RGB-D experiment driver.

Parity with `run_exp_tum.py` + `Examples/RGB-D/rgbd_tum.cc`: run the full
system over an associated TUM sequence with offline YOLACT masks, save
CameraTrajectory.txt / KeyFrameTrajectory.txt / ObjectInfo.txt, and
evaluate ATE/RPE against groundtruth.txt (eval/ate.py implements the TUM
benchmark math the reference shells out to).

Usage:
  python scripts/run_tum.py --seq /data/rgbd_dataset_freiburg2_desk \
      [--semantic-dir DIR] [--out OUT_DIR] [--max-frames N] [--loop]
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
    ap.add_argument("--seq", required=True)
    ap.add_argument("--semantic-dir", default=None)
    ap.add_argument("--out", default="ExpResults")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--loop", action="store_true")
    ap.add_argument("--vocab", default=None,
                    help="external DBoW2-text vocabulary (ORBvoc.txt "
                         "format) for --loop; default: the shipped "
                         "corpus-trained vocab_synth.txt")
    ap.add_argument("--async-mapping", action="store_true",
                    help="dispatch keyframe mapping asynchronously on a "
                         "map snapshot (the LocalMapping-thread analogue, "
                         "System.cc:95). Default OFF on a single chip: the "
                         "device stream is serial so async buys no fps "
                         "(3.4 vs 3.5 measured) while tracking against "
                         "pre-BA points costs ~2.5x ATE (BENCHMARKS.md); "
                         "with a second device it runs truly parallel")
    ap.add_argument("--no-objects", action="store_true")
    ap.add_argument("--metrics", default=None,
                    help="write per-frame JSONL metrics to this path "
                         "(utils/metrics.MetricsStream)")
    ap.add_argument("--viz-dir", default=None,
                    help="dump per-frame overlay PNGs + an interactive "
                         "HTML scrubber (the offline step-by-step viewer "
                         "analogue, viz/scrubber.py) to this directory")
    ap.add_argument("--platform", default=None, choices=["cpu", "axon"],
                    help="force the JAX backend (config.update beats the "
                         "sitecustomized jax_platforms; the env var alone "
                         "is ignored). Default: whatever is registered "
                         "(the attached TPU when present).")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from object_slam_tpu.config import SlamConfig
    from object_slam_tpu.datasets import tum
    from object_slam_tpu.eval import ate as ate_mod, trajectory_io
    from object_slam_tpu.native.loader import FramePrefetcher, native_available
    from object_slam_tpu.semantic import loader as sem_loader
    from object_slam_tpu.slam.system import SlamSystem

    cfg = SlamConfig.tum_rgbd()
    frames = tum.load_sequence(args.seq)
    if args.max_frames:
        frames = frames[:args.max_frames]
    print(f"{len(frames)} frames; native loader: {native_available()}")

    metrics = None
    if args.metrics:
        from object_slam_tpu.utils.metrics import MetricsStream
        metrics = MetricsStream(args.metrics)
    if args.viz_dir:
        # the scrubber reads per-frame state/pose eagerly; with the
        # one-frame-lagged readback those lag one frame behind the image
        # on screen (and reading them forces the sync the pipeline exists
        # to hide) — strict mode keeps every overlay consistent (ADVICE r3)
        import dataclasses
        cfg = cfg.replace(tracking=dataclasses.replace(
            cfg.tracking, pipelined_readback=False))
    sys_ = SlamSystem(cfg, enable_objects=not args.no_objects,
                      enable_loop=args.loop, vocab_path=args.vocab,
                      async_mapping=args.async_mapping,
                      metrics=metrics)

    # prefetch pipeline (native decode off the tracking thread)
    pf = FramePrefetcher(n_workers=4, capacity=8,
                         max_masks=cfg.semantic.max_instances)
    meta = []
    for i, fr in enumerate(frames):
        mask_paths, dets = [], []
        if args.semantic_dir:
            dets = sem_loader.read_semantic_dir(
                args.semantic_dir, sem_loader.tum_frame_key(fr.timestamp),
                cfg.semantic.min_confidence, cfg.semantic.valid_labels_tum)
        meta.append(dets)
        pf.submit(i, fr.rgb_path, fr.depth_path, [])

    scrub = None
    if args.viz_dir:
        from object_slam_tpu.viz.scrubber import Scrubber
        scrub = Scrubber(args.viz_dir, fps=cfg.camera.fps)

    t0 = time.perf_counter()
    times = []
    loop_times = []
    for i, fr in enumerate(frames):
        ti0 = time.perf_counter()
        rgb, depth16, _ = pf.get(i)
        if rgb.ndim == 2:
            rgb = np.stack([rgb] * 3, -1)
        dets = meta[i]
        sem_arrays = sem_loader.detections_to_arrays(
            dets, cfg.semantic.max_instances, cfg.camera.height,
            cfg.camera.width) if dets else None
        tf0 = time.perf_counter()
        # compact transfer: u8 rgb + raw u16 depth; grayscale conversion
        # and DepthMapFactor scaling happen on device (FrameBuilder) —
        # ~4x less host->device traffic per frame
        f = sys_.track_rgbd(None, jnp.asarray(depth16.astype(np.uint16)),
                            jnp.asarray(rgb.astype(np.uint8)),
                            sem_arrays, timestamp=fr.timestamp)
        times.append(time.perf_counter() - tf0)
        if scrub is not None:
            scrub.add_frame(rgb, f,
                            state={0: "NOT_INITIALIZED", 1: "OK",
                                   2: "LOST"}[sys_.state],
                            n_inliers=int(getattr(sys_, "_last_n_inliers",
                                                  -1)),
                            kfs=sys_.n_keyframes, ref_kf=sys_.last_kf_id)
        loop_times.append(time.perf_counter() - ti0)
        if i % 50 == 0:
            print(f"frame {i}/{len(frames)} kfs={sys_.n_keyframes} "
                  f"pts={sys_.n_points}")
    total = time.perf_counter() - t0
    if scrub is not None:
        print("scrubber:", scrub.write())
    if args.viz_dir:
        from object_slam_tpu.viz.map_viewer import export_map_html
        sys_.flush_mapping()
        print("map viewer:", export_map_html(
            sys_.map, trajectory=sys_.trajectory,
            path=os.path.join(args.viz_dir, "map.html")))
    pf.close()
    if metrics is not None:
        metrics.close()

    os.makedirs(args.out, exist_ok=True)
    traj = sys_.final_trajectory()
    trajectory_io.save_trajectory_tum(
        os.path.join(args.out, "CameraTrajectory.txt"), traj)
    trajectory_io.save_keyframe_trajectory_tum(
        os.path.join(args.out, "KeyFrameTrajectory.txt"),
        np.asarray(sys_.map.kf_timestamp), np.asarray(sys_.map.kf_pose),
        np.asarray(sys_.map.kf_valid))
    if sys_.objects is not None:
        trajectory_io.save_object_info(
            os.path.join(args.out, "ObjectInfo.txt"),
            sys_.map.obj_label, sys_.map.obj_valid,
            sys_.objects.semantic_constraints)

    lt = np.asarray(loop_times)
    tt = np.asarray(times)
    result = {
        "frames": len(frames),
        "fps": len(frames) / total,
        "median_track_ms": float(np.median(tt) * 1e3),
        # where the non-track loop time goes (prefetch get + sem array
        # assembly + overlay dump): median and worst-case per frame
        "median_overhead_ms": float(np.median(lt - tt) * 1e3),
        "p90_frame_ms": float(np.percentile(lt, 90) * 1e3),
        "max_frame_ms": float(np.max(lt) * 1e3),
        "keyframes": sys_.n_keyframes,
        "points": sys_.n_points,
    }
    if sys_.loop_closer is not None:
        result["loops_closed"] = sys_.loop_closer.n_loops_closed
        result["loops_rejected"] = sys_.loop_closer.n_loops_rejected
        result["loop_events"] = sys_.loop_closer.events

    gt_file = os.path.join(args.seq, "groundtruth.txt")
    if os.path.isfile(gt_file):
        ts_gt, pos_gt, _ = tum.load_groundtruth(args.seq)
        est = [(t, np.linalg.inv(T)[:3, 3]) for t, T, ok in traj if ok]
        pairs = ate_mod.associate_timestamps([t for t, _ in est], ts_gt)
        if len(pairs) > 10:
            e = np.array([est[a][1] for a, b in pairs])
            g = np.array([pos_gt[b] for a, b in pairs])
            result["ate_rmse"] = ate_mod.ate_rmse(e, g)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
