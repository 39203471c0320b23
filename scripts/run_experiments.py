#!/usr/bin/env python
"""One-process experiment battery: every recorded BENCHMARKS.md number in
a single run, sharing compiled programs across variants.

Why one process: the remote-attached TPU backend cannot reuse the
persistent compilation cache across processes (its executables don't
serialize), so per-variant driver invocations each paid the full compile
set (~5-20 min). The config-keyed jit-bundle caches (slam/system.py)
make same-config variants compile ONCE here.

Runs (RGB-D circuit dataset from scripts/make_synth_tum.py):
  t200 x3                determinism spread (identical inputs)
  t200-noobj             objects-off control (the objects A/B)
  t200-loop              loop-closure A/B + per-closure gate events
KITTI (dataset from scripts/make_synth_kitti.py, car masks):
  kitti                  stereo end-to-end ATE/RPE + object census

Usage:
  python scripts/run_experiments.py --tum /tmp/synth_tum200 \
      --kitti /tmp/synth_kitti --out /tmp/experiments.json
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


def run_tum_variant(tum_dir, cfg, frames, metas, **sys_kw):
    import jax.numpy as jnp
    from object_slam_tpu.slam.system import SlamSystem
    from object_slam_tpu.eval import ate as ate_mod
    from object_slam_tpu.datasets import tum

    sys_ = SlamSystem(cfg, **sys_kw)
    t0 = time.perf_counter()
    times = []
    for i, (rgb8, d16, sem) in enumerate(frames):
        tf0 = time.perf_counter()
        sys_.track_rgbd(None, d16, rgb8, sem, timestamp=metas[i].timestamp)
        times.append(time.perf_counter() - tf0)
    total = time.perf_counter() - t0

    traj = sys_.final_trajectory()
    result = {
        "frames": len(frames),
        "fps": len(frames) / total,
        "median_track_ms": float(np.median(times) * 1e3),
        "keyframes": sys_.n_keyframes,
        "points": sys_.n_points,
        "tracked": sum(1 for _, _, ok in traj if ok),
    }
    if sys_.objects is not None:
        import jax.numpy as jnp
        result["objects"] = int(np.asarray(sys_.map.obj_valid).sum())
        result["semantic_constraints"] = sys_.objects.semantic_constraints
    if sys_.loop_closer is not None:
        result["loops_closed"] = sys_.loop_closer.n_loops_closed
        result["loops_rejected"] = sys_.loop_closer.n_loops_rejected
        result["loop_events"] = sys_.loop_closer.events
    gt_file = os.path.join(tum_dir, "groundtruth.txt")
    if os.path.isfile(gt_file):
        ts_gt, pos_gt, _ = tum.load_groundtruth(tum_dir)
        est = [(t, np.linalg.inv(T)[:3, 3]) for t, T, ok in traj if ok]
        pairs = ate_mod.associate_timestamps([t for t, _ in est], ts_gt)
        if len(pairs) > 10:
            e = np.array([est[a][1] for a, b in pairs])
            g = np.array([pos_gt[b] for a, b in pairs])
            result["ate_rmse"] = ate_mod.ate_rmse(e, g)
    return result


def load_tum_frames(tum_dir, cfg, max_frames=0):
    """Decode + pack the whole sequence up front (compact dtypes)."""
    from object_slam_tpu.datasets import tum
    from object_slam_tpu.semantic import loader as sem_loader
    from object_slam_tpu.semantic.object2d import pack_mask_bits
    from PIL import Image

    metas = tum.load_sequence(tum_dir)
    if max_frames:
        metas = metas[:max_frames]
    sem_dir = os.path.join(tum_dir, "semantic")
    frames = []
    for fr in metas:
        rgb = np.asarray(Image.open(fr.rgb_path))
        if rgb.ndim == 2:
            rgb = np.stack([rgb] * 3, -1)
        d16 = np.asarray(Image.open(fr.depth_path)).astype(np.uint16)
        sem = None
        if os.path.isdir(sem_dir):
            dets = sem_loader.read_semantic_dir(
                sem_dir, sem_loader.tum_frame_key(fr.timestamp),
                cfg.semantic.min_confidence, cfg.semantic.valid_labels_tum)
            if dets:
                sa = sem_loader.detections_to_arrays(
                    dets, cfg.semantic.max_instances, cfg.camera.height,
                    cfg.camera.width)
                sem = (pack_mask_bits(sa[0]),) + tuple(sa[1:])
        frames.append((rgb.astype(np.uint8), d16, sem))
    return metas, frames


def run_kitti(kitti_dir, max_frames=0, async_mapping=False):
    import jax.numpy as jnp
    from object_slam_tpu.config import SlamConfig
    from object_slam_tpu.datasets import kitti
    from object_slam_tpu.eval import ate as ate_mod
    from object_slam_tpu.slam.system import SlamSystem
    from PIL import Image

    cfg = SlamConfig.kitti_stereo()
    frames = kitti.load_sequence(kitti_dir)
    if max_frames:
        frames = frames[:max_frames]
    gt = kitti.load_groundtruth(os.path.join(kitti_dir, "gt.txt"))
    sem_dir = os.path.join(kitti_dir, "semantic")

    # compact u8 transfer with device-derived HSV input (frame.py
    # _build_stereo); async_mapping is the KITTI A/B axis — the
    # reference's LocalMapping runs on its own thread (System.cc:95), and
    # KITTI-rate keyframe insertion is the regime where that overlap (and
    # the bounded merge lag) actually matters.
    # untimed compile prewarm on a scratch system (kernels shared
    # per-config) — same contract as scripts/run_kitti.py --prewarm
    scratch = SlamSystem(cfg, enable_objects=True,
                         async_mapping=async_mapping)
    for i, fr in enumerate(frames[:12]):
        gl = np.asarray(Image.open(fr.left_path), np.uint8)
        gr = np.asarray(Image.open(fr.right_path), np.uint8)
        scratch.track_stereo(jnp.asarray(gl), jnp.asarray(gr), None,
                             kitti.load_semantics(sem_dir, fr.index, cfg),
                             timestamp=fr.timestamp)
    kfi = np.int32(max(scratch.last_kf_id, 0))
    import jax as _jax
    _jax.block_until_ready(scratch._jit_mapping(scratch.map, kfi).n_pt)
    _jax.block_until_ready(scratch._jit_mapping_fast(scratch.map, kfi).n_pt)
    scratch.flush_mapping()
    del scratch

    sys_ = SlamSystem(cfg, enable_objects=True, async_mapping=async_mapping)

    # decode + device-transfer prefetch one frame ahead (same loop shape
    # as scripts/run_kitti.py — inline PIL decode + sync transfer cost
    # ~0.4 fps of pure IO on the battery's wall clock)
    from object_slam_tpu.native.loader import FramePrefetcher
    import jax as _jax
    pf = FramePrefetcher(n_workers=4, capacity=6)
    for i, fr in enumerate(frames):
        pf.submit(2 * i, fr.left_path)
        pf.submit(2 * i + 1, fr.right_path)

    def fetch(i):
        gl, _, _ = pf.get(2 * i)
        gr, _, _ = pf.get(2 * i + 1)
        sa = kitti.load_semantics(sem_dir, frames[i].index, cfg)
        return (_jax.device_put(gl.astype(np.uint8)),
                _jax.device_put(gr.astype(np.uint8)), sa)

    t0 = time.perf_counter()
    times = []
    nxt = fetch(0)
    for i, fr in enumerate(frames):
        gl_d, gr_d, sa = nxt
        if i + 1 < len(frames):
            nxt = fetch(i + 1)
        tf0 = time.perf_counter()
        f = sys_.track_stereo(gl_d, gr_d, None, sa,
                              timestamp=fr.timestamp)
        times.append(time.perf_counter() - tf0)
        # no per-frame device reads in the measured loop: np.asarray(Tcw)
        # / n_keyframes force a strict resolve (an RTT) and perturb the
        # async-merge timing; diagnostics live in scripts/run_kitti.py
        if i % 50 == 0:
            print(f"kitti f={i}", flush=True)
    total = time.perf_counter() - t0
    pf.close()

    traj = sys_.final_trajectory()
    est = np.array([np.linalg.inv(T)[:3, 3] for _, T, _ in traj])
    n = min(len(est), len(gt))
    result = {
        "frames": len(frames),
        "fps": len(frames) / total,
        "median_track_ms": float(np.median(times) * 1e3),
        "keyframes": sys_.n_keyframes,
        "points": sys_.n_points,
        "objects": int(np.asarray(sys_.map.obj_valid).sum()),
        "semantic_constraints": sys_.objects.semantic_constraints,
        "ate_rmse": ate_mod.ate_rmse(est[:n], gt[:n, :3, 3]),
    }
    tracked_mask = np.array([ok for _, _, ok in traj])[:n]
    rpe = ate_mod.rpe(
        np.array([np.linalg.inv(T) for _, T, _ in traj])[:n], gt[:n],
        tracked=tracked_mask)
    result.update({"rpe_" + k: v for k, v in rpe.items()})
    result["tracked"] = int(tracked_mask.sum())
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tum", default="/tmp/synth_tum200")
    ap.add_argument("--kitti", default=None)
    ap.add_argument("--out", default="/tmp/experiments.json")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--skip", default="",
                    help="comma list of variants to skip")
    args = ap.parse_args()
    skip = set(args.skip.split(","))

    from object_slam_tpu.config import SlamConfig
    cfg = SlamConfig.tum_rgbd()
    out = {}

    if args.tum and os.path.isdir(args.tum):
        metas, frames = load_tum_frames(args.tum, cfg, args.max_frames)
        print(f"tum: {len(frames)} frames loaded", flush=True)
        import dataclasses as _dc
        cfg_semoff = cfg.replace(objects=_dc.replace(
            cfg.objects, semopt_enabled=False))
        # untimed compile prewarm per distinct program set (VERDICT r4
        # weak 4: t200_a recorded 0.94 fps vs t200_b 13.48 for identical
        # runs — the first variant paid every compile; kernels are shared
        # per-config, so a 12-frame throwaway run warms each set)
        for wcfg, wkw in [(cfg, dict(enable_objects=True)),
                          (cfg, dict(enable_objects=False)),
                          (cfg_semoff, dict(enable_objects=True)),
                          (cfg, dict(enable_objects=True,
                                     enable_loop=True))]:
            run_tum_variant(args.tum, wcfg, frames[:12], metas[:12], **wkw)
        print("tum: prewarm done", flush=True)
        for name, vcfg, kw in [
                # determinism pair (identical inputs, sync, objects on)
                ("t200_a", cfg,
                 dict(enable_objects=True, async_mapping=False)),
                ("t200_b", cfg,
                 dict(enable_objects=True, async_mapping=False)),
                # the objects A/B (sync both sides)
                ("t200_noobj_sync", cfg,
                 dict(enable_objects=False, async_mapping=False)),
                # 3-way ablation middle arm: full object pipeline WITHOUT
                # the semantic pose refinement — isolates the
                # ObjectOptimizer.cc:624 mechanism from the pipeline's
                # KF-policy/retention side effects (VERDICT r4 item 5)
                ("t200_semopt_off", cfg_semoff,
                 dict(enable_objects=True, async_mapping=False)),
                # the async-mapping A/B side
                ("t200_async", cfg,
                 dict(enable_objects=True, async_mapping=True)),
                # loop module on the low-drift circuit (gate should
                # reject or be ATE-neutral)
                ("t200_loop", cfg,
                 dict(enable_objects=True, async_mapping=False,
                      enable_loop=True)),
        ]:
            if name in skip:
                continue
            t0 = time.perf_counter()
            out[name] = run_tum_variant(args.tum, vcfg, frames, metas, **kw)
            print(name, json.dumps(out[name])[:300],
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
            with open(args.out, "w") as f:
                json.dump(out, f, indent=1)

    if args.kitti and os.path.isdir(args.kitti) and "kitti" not in skip:
        out["kitti"] = run_kitti(args.kitti, args.max_frames)
        print("kitti", json.dumps(out["kitti"])[:300], flush=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    if args.kitti and os.path.isdir(args.kitti) \
            and "kitti_async" not in skip:
        out["kitti_async"] = run_kitti(args.kitti, args.max_frames,
                                       async_mapping=True)
        print("kitti_async", json.dumps(out["kitti_async"])[:300],
              flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
