#!/usr/bin/env python
"""Close-point retention attribution on the synthetic KITTI drive.

For each consecutive frame pair (t, t+1) under GROUND-TRUTH motion:
take frame t's close keypoints (stereo depth < th_depth*baseline),
project them into t+1 with the GT poses, and classify each as

  detected   — a t+1 keypoint exists within the level-scaled match
               radius of the GT projection
  lvl_ok     — ...whose pyramid level is within the motion-model
               search's level window of the frame-t level
  desc_ok    — ...whose descriptor is within TH_HIGH of frame t's
  retained   — all three (what the motion-model search can recover)

This is the measurement harness for the round-4 KITTI limitation
(BENCHMARKS.md "Stereo / KITTI"): ~40% close-corner retention under
0.8 m/frame forward motion kept the close-budget KF policy
(Tracking.cc:1242-1326 `bNeedToInsertClose`) firing every frame. The
split tells WHERE the loss is: FAST re-detection, the level window
(the reference searches levels >= lastOctave one-sidedly under forward
motion, ORBmatcher.cc:1341-1360), or descriptor drift under looming.

Usage: python scripts/diag_kitti_retention.py --seq /tmp/synth_kitti \
         --frames 40 [--start 100] [--radius-th 15]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", default="/tmp/synth_kitti")
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--radius-th", type=float, default=15.0,
                    help="motion-model base radius (radius_th)")
    ap.add_argument("--level-window", type=int, default=1)
    ap.add_argument("--forward-onesided", action="store_true",
                    help="score the one-sided forward window "
                         "(kp_level >= last_level - 1) instead")
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", args.platform)

    from PIL import Image
    from object_slam_tpu.config import SlamConfig
    from object_slam_tpu.datasets import kitti
    from object_slam_tpu.slam.frame import FrameBuilder

    cfg = SlamConfig.kitti_stereo()
    fb = FrameBuilder(cfg)
    frames = kitti.load_sequence(args.seq)
    gt = kitti.load_groundtruth(os.path.join(args.seq, "gt.txt"))
    K = fb.K
    sf = np.asarray(fb.scale_factors)
    close_z = cfg.camera.th_depth * cfg.camera.baseline

    def build(i):
        fr = frames[i]
        gl = np.asarray(Image.open(fr.left_path), np.uint8)
        gr = np.asarray(Image.open(fr.right_path), np.uint8)
        sa = kitti.load_semantics(os.path.join(args.seq, "semantic"),
                                  fr.index, cfg)
        return fb.build_stereo(gl, gr, None, sa, fr.timestamp)

    tot = dict(n=0, detected=0, lvl_ok=0, desc_ok=0, retained=0,
               det_in_img=0)
    lvl_jumps = []
    prev = build(args.start)
    for i in range(args.start + 1, args.start + args.frames):
        cur = build(i)
        p_uv = np.asarray(prev.uv)
        p_lvl = np.asarray(prev.level)
        p_desc = np.asarray(prev.desc)
        p_d = np.asarray(prev.depth)
        p_ok = np.asarray(prev.valid) & (p_d > 0) & (p_d < close_z)

        # GT transport t -> t+1 (gt.txt poses are cam-to-world)
        Tw_prev = gt[i - 1]
        Tw_cur = gt[i]
        Tcw_prev = np.linalg.inv(Tw_prev)
        Tcw_cur = np.linalg.inv(Tw_cur)
        z = np.maximum(p_d, 1e-6)
        pc = np.stack([(p_uv[:, 0] - K.cx) / K.fx * z,
                       (p_uv[:, 1] - K.cy) / K.fy * z, z], -1)
        pw = pc @ Tw_prev[:3, :3].T + Tw_prev[:3, 3]
        pc2 = pw @ Tcw_cur[:3, :3].T + Tcw_cur[:3, 3]
        z2 = pc2[:, 2]
        u2 = K.fx * pc2[:, 0] / np.maximum(z2, 1e-6) + K.cx
        v2 = K.fy * pc2[:, 1] / np.maximum(z2, 1e-6) + K.cy
        in_img = ((z2 > 0.1) & (u2 >= 0) & (u2 < cfg.camera.width)
                  & (v2 >= 0) & (v2 < cfg.camera.height))
        rows = p_ok & in_img

        c_uv = np.asarray(cur.uv)
        c_lvl = np.asarray(cur.level)
        c_desc = np.asarray(cur.desc)
        c_ok = np.asarray(cur.valid)

        radius = args.radius_th * sf[np.clip(p_lvl, 0, len(sf) - 1)]
        du = np.abs(u2[:, None] - c_uv[None, :, 0])
        dv = np.abs(v2[:, None] - c_uv[None, :, 1])
        win = (du < radius[:, None]) & (dv < radius[:, None]) & c_ok[None, :]

        if args.forward_onesided:
            lvl_win = c_lvl[None, :] >= (p_lvl[:, None] - 1)
        else:
            lvl_win = (np.abs(c_lvl[None, :] - p_lvl[:, None])
                       <= args.level_window)

        # descriptor hamming (u32 words)
        pb = np.unpackbits(
            np.ascontiguousarray(p_desc).view(np.uint8), axis=-1)
        cb = np.unpackbits(
            np.ascontiguousarray(c_desc).view(np.uint8), axis=-1)
        ham = (pb[:, None, :] != cb[None, :, :]).sum(-1).astype(np.int32)
        desc_win = ham <= 100

        detected = win.any(1)
        lvl_ok = (win & lvl_win).any(1)
        desc_ok = (win & desc_win).any(1)
        retained = (win & lvl_win & desc_win).any(1)
        tot["n"] += int(rows.sum())
        tot["det_in_img"] += int(rows.sum())
        tot["detected"] += int((detected & rows).sum())
        tot["lvl_ok"] += int((lvl_ok & rows).sum())
        tot["desc_ok"] += int((desc_ok & rows).sum())
        tot["retained"] += int((retained & rows).sum())

        # level jump of the NEAREST window hit
        hit_rows = np.where(rows & detected)[0]
        if hit_rows.size:
            d2 = du[hit_rows] ** 2 + dv[hit_rows] ** 2
            d2 = np.where(win[hit_rows], d2, np.inf)
            nearest = d2.argmin(1)
            lvl_jumps.extend(
                (c_lvl[nearest] - p_lvl[hit_rows]).tolist())

        print(f"f={i:3d} close={int(rows.sum()):4d} "
              f"det={int((detected & rows).sum()):4d} "
              f"lvl={int((lvl_ok & rows).sum()):4d} "
              f"desc={int((desc_ok & rows).sum()):4d} "
              f"ret={int((retained & rows).sum()):4d}", flush=True)
        prev = cur

    n = max(tot["n"], 1)
    print(f"\nclose rows: {tot['n']}")
    for k in ("detected", "lvl_ok", "desc_ok", "retained"):
        print(f"  {k:9s}: {tot[k]:6d}  ({100.0 * tot[k] / n:5.1f}%)")
    if lvl_jumps:
        vals, cnts = np.unique(lvl_jumps, return_counts=True)
        print("  level jump of nearest hit:",
              {int(v): int(c) for v, c in zip(vals, cnts)})


if __name__ == "__main__":
    main()
