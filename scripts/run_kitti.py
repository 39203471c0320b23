#!/usr/bin/env python
"""KITTI stereo odometry experiment driver.

Parity with `run_exp_kitti.py` + `Examples/Stereo/stereo_kitti.cc`: run the
stereo pipeline over a KITTI odometry sequence with car-class masks, save
the KITTI-format trajectory, and evaluate APE/RPE against the ground truth
(the reference shells out to `evo`; eval/ate.py implements the same Horn
alignment + RMSE math).

Usage:
  python scripts/run_kitti.py --seq /data/kitti/sequences/00 \
      [--gt ExpResults/KITTI/groundtruth/00.txt] [--semantic-dir DIR]
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
    ap.add_argument("--gt", default=None)
    ap.add_argument("--semantic-dir", default=None)
    ap.add_argument("--out", default="ExpResults")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--loop", action="store_true")
    ap.add_argument("--vocab", default=None,
                    help="external DBoW2-text vocabulary (ORBvoc.txt "
                         "format) for --loop; default: the shipped "
                         "corpus-trained vocab_synth.txt")
    ap.add_argument("--async-mapping", dest="async_mapping",
                    action="store_true", default=True,
                    help="dispatch keyframe mapping asynchronously on a "
                         "map snapshot — the KITTI default: at KITTI-rate "
                         "keyframe insertion the LocalMapping-thread "
                         "overlap (System.cc:95) wins BOTH throughput "
                         "(2.3 vs 1.2 fps) and ATE (0.56 vs 0.71 m) on "
                         "the 300-frame canyon A/B (BENCHMARKS.md r4)")
    ap.add_argument("--sync-mapping", dest="async_mapping",
                    action="store_false",
                    help="run mapping inline per keyframe (the VGA/TUM "
                         "single-chip default; A/B in BENCHMARKS.md)")
    ap.add_argument("--platform", default=None, choices=["cpu", "axon"],
                    help="force the JAX backend (config.update beats the "
                         "sitecustomized jax_platforms).")
    ap.add_argument("--no-prewarm", action="store_true",
                    help="skip the untimed compile prewarm pass")
    ap.add_argument("--viz-dir", default=None,
                    help="write the interactive 3D map page (MapDrawer "
                         "analogue, viz/map_viewer.py) to this directory")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from object_slam_tpu.config import SlamConfig
    from object_slam_tpu.datasets import kitti
    from object_slam_tpu.eval import ate as ate_mod, trajectory_io
    from object_slam_tpu.native.loader import FramePrefetcher
    from object_slam_tpu.semantic import loader as sem_loader
    from object_slam_tpu.slam.system import SlamSystem

    cfg = SlamConfig.kitti_stereo()
    frames = kitti.load_sequence(args.seq)
    if args.max_frames:
        frames = frames[:args.max_frames]

    sys_ = SlamSystem(cfg, enable_objects=args.semantic_dir is not None,
                      enable_loop=args.loop, vocab_path=args.vocab,
                      async_mapping=args.async_mapping)
    pf = FramePrefetcher(n_workers=4, capacity=6)
    for i, fr in enumerate(frames):
        pf.submit(2 * i, fr.left_path)
        pf.submit(2 * i + 1, fr.right_path)

    def fetch_to_device(i):
        """Decode-prefetched frame i -> u8 grayscale pair, device_put
        issued NOW so the host->device transfer (the dominant per-frame
        host cost on a remote-attached chip: ~45 of 60 ms of
        build_stereo, measured r5) overlaps the PREVIOUS frame's device
        compute. On PCIe the same device_put is ~0.1 ms and the overlap
        is free."""
        gl, _, _ = pf.get(2 * i)
        gr, _, _ = pf.get(2 * i + 1)
        if gl.ndim == 3:
            w = np.array([0.299, 0.587, 0.114], np.float32)
            gl = (gl @ w).astype(np.uint8)
            gr = (gr @ w).astype(np.uint8)
        sem_arrays = None
        if args.semantic_dir:
            sem_arrays = kitti.load_semantics(args.semantic_dir,
                                              frames[i].index, cfg)
        return (jax.device_put(gl.astype(np.uint8)),
                jax.device_put(gr.astype(np.uint8)), sem_arrays)

    if not args.no_prewarm and len(frames) >= 4:
        # compile every program variant on a SCRATCH system before the
        # timed loop (the rgbd_tum driver likewise times only the
        # tracking loop, not ORB-vocabulary load — rgbd_tum.cc:111-119;
        # XLA's compile-on-first-hit otherwise lands inside the first
        # measured frames). The persistent cache makes this seconds.
        scratch = SlamSystem(cfg)
        for i in range(12):
            gl_d, gr_d, sem = fetch_to_device(i % len(frames))
            scratch.track_stereo(gl_d, gr_d, None, sem,
                                 timestamp=frames[i % len(frames)].timestamp)
        import jax as _jax
        kfi = np.int32(max(scratch.last_kf_id, 0))
        _jax.block_until_ready(scratch._jit_mapping(scratch.map, kfi).n_pt)
        _jax.block_until_ready(
            scratch._jit_mapping_fast(scratch.map, kfi).n_pt)
        scratch.flush_mapping()
        del scratch
        # the decode prefetcher indices were consumed; resubmit
        pf.close()
        pf = FramePrefetcher(n_workers=4, capacity=6)
        for i, fr in enumerate(frames):
            pf.submit(2 * i, fr.left_path)
            pf.submit(2 * i + 1, fr.right_path)

    t0 = time.perf_counter()
    times = []
    nxt = fetch_to_device(0)
    for i, fr in enumerate(frames):
        gl_d, gr_d, sem_arrays = nxt
        if i + 1 < len(frames):
            nxt = fetch_to_device(i + 1)   # transfer rides this frame
        tf0 = time.perf_counter()
        sys_.track_stereo(gl_d, gr_d, None, sem_arrays,
                          timestamp=fr.timestamp)
        times.append(time.perf_counter() - tf0)
        if i % 50 == 0:
            print(f"frame {i}/{len(frames)} kfs={sys_.n_keyframes}",
                  flush=True)
    total = time.perf_counter() - t0
    pf.close()

    if args.viz_dir:
        from object_slam_tpu.viz.map_viewer import export_map_html
        sys_.flush_mapping()
        print("map viewer:", export_map_html(
            sys_.map, trajectory=sys_.trajectory,
            path=os.path.join(args.viz_dir, "map.html")))

    os.makedirs(args.out, exist_ok=True)
    traj = sys_.final_trajectory()
    trajectory_io.save_trajectory_kitti(
        os.path.join(args.out, "CameraTrajectory.txt"), traj)
    if sys_.objects is not None:
        # SaveObjctInfo parity for the stereo mode (System.cc:331-374)
        trajectory_io.save_object_info(
            os.path.join(args.out, "ObjectInfo.txt"),
            sys_.map.obj_label, sys_.map.obj_valid,
            sys_.objects.semantic_constraints)

    result = {"frames": len(frames), "fps": len(frames) / total,
              "median_track_ms": float(np.median(times) * 1e3),
              "tracked": int(sum(1 for _, _, ok in traj if ok)),
              "keyframes": sys_.n_keyframes,
              "keyframes_valid": int(np.asarray(sys_.map.kf_valid).sum()),
              "points": sys_.n_points}
    if sys_.objects is not None:
        result["objects"] = int(np.asarray(sys_.map.obj_valid).sum())
        result["semantic_constraints"] = int(
            sys_.objects.semantic_constraints)
    if args.gt and os.path.isfile(args.gt):
        gt = kitti.load_groundtruth(args.gt)
        est = np.array([np.linalg.inv(T)[:3, 3] for _, T, _ in traj])
        n = min(len(est), len(gt))
        result["ate_rmse"] = ate_mod.ate_rmse(est[:n], gt[:n, :3, 3])
        tracked_mask = np.array([ok for _, _, ok in traj])[:n]
        rpe = ate_mod.rpe(
            np.array([np.linalg.inv(T) for _, T, _ in traj])[:n], gt[:n],
            tracked=tracked_mask)
        result.update({"rpe_" + k: v for k, v in rpe.items()})
    print(json.dumps(result))


if __name__ == "__main__":
    main()
