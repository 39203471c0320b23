#!/usr/bin/env python
"""Motion-model search loss-chain attribution on the KITTI drive.

diag_kitti_retention.py bounds what detection allows (GT transport);
diag_local_recovery.py attributes the LOCAL-map search. This probe runs
the real system and, per frame, replays the MOTION search
(slam/tracking.track_motion_model ≙ ORBmatcher::SearchByProjection
frame-to-frame, ORBmatcher.cc:1328-1470) stage by stage on the actual
inputs (last frame's bindings, velocity-predicted pose), restricted to
CLOSE rows:

  bound      — last-frame close keypoints carrying a map-point binding
               (the only rows the motion search can recover)
  window     — a current keypoint inside the velocity-predicted search
               window (radius_th * sf[last_level])
  ur_ok      — ...passing the stereo right-u gate
  level      — ...passing the forward-motion one-sided level window
  desc       — ...with descriptor <= TH_HIGH (a matchable candidate)
  matched    — survived nn-ratio, rotation histogram, duplicate resolve
  inlier     — survived the pose-opt chi^2 regate (what close_trk sees
               from this stage)

Usage: python scripts/diag_motion_chain.py --frames 30 [--start 0]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", default="/tmp/synth_kitti")
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--platform", default=None, choices=["cpu", "axon"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp
    from PIL import Image
    from object_slam_tpu.config import SlamConfig
    from object_slam_tpu.datasets import kitti
    from object_slam_tpu.geometry import se3
    from object_slam_tpu.slam import tracking as trk
    from object_slam_tpu.slam.system import SlamSystem

    cfg = SlamConfig.kitti_stereo()
    sys_ = SlamSystem(cfg)
    frames = kitti.load_sequence(args.seq)
    gt = kitti.load_groundtruth(os.path.join(args.seq, "gt.txt"))
    close_z = cfg.camera.th_depth * cfg.camera.baseline
    sf = np.asarray(sys_.scale_factors)
    K = sys_.K

    motion_jit = jax.jit(lambda m, fr, lu, lp, ll, lv, tp, tl, la:
                         trk.track_motion_model(
                             K, m, fr, lu, lp, ll, lv, tp,
                             sys_.scale_factors, sys_.inv_sigma2,
                             radius_th=cfg.tracking.motion_model_radius,
                             T_last=tl, last_angle=la))
    motion_norot_jit = jax.jit(lambda m, fr, lu, lp, ll, lv, tp, tl:
                               trk.track_motion_model(
                                   K, m, fr, lu, lp, ll, lv, tp,
                                   sys_.scale_factors, sys_.inv_sigma2,
                                   radius_th=cfg.tracking.motion_model_radius,
                                   T_last=tl, last_angle=None))

    tot = {k: 0 for k in ["bound", "window", "ur_ok", "level", "desc",
                          "matched", "matched_norot", "inlier",
                          "inlier_norot", "killed_total",
                          "killed_correct"]}
    prev = None
    prev_Tcw = None
    for i in range(args.start, args.start + args.frames):
        fr = frames[i]
        gl = np.asarray(Image.open(fr.left_path), np.uint8)
        gr = np.asarray(Image.open(fr.right_path), np.uint8)
        sa = kitti.load_semantics(os.path.join(args.seq, "semantic"),
                                  fr.index, cfg)
        last_snapshot = sys_.last_frame
        last_Tcw = (np.asarray(last_snapshot.Tcw)
                    if last_snapshot is not None else None)
        vel = np.asarray(sys_.velocity) if sys_.velocity is not None \
            else np.eye(4)
        sys_.track_stereo(gl, gr, None, sa, fr.timestamp)

        if last_snapshot is None or i < args.start + 2:
            prev = sys_.last_frame
            continue

        m = sys_.map
        last = last_snapshot
        cur = sys_.last_frame
        T_pred = vel @ last_Tcw

        # host-side stage chain
        P = np.asarray(m.pt_xyz).shape[0]
        l_uv = np.asarray(last.uv)
        l_pt = np.asarray(last.kp_pt)
        l_lvl = np.asarray(last.level)
        l_d = np.asarray(last.depth)
        l_valid = np.asarray(last.valid)
        l_desc = np.asarray(last.desc)
        pt_valid = np.asarray(m.pt_valid)
        close = l_valid & (l_d > 0) & (l_d < close_z)
        bound = close & (l_pt >= 0) & pt_valid[np.clip(l_pt, 0, P - 1)]

        pw = np.asarray(m.pt_xyz)[np.clip(l_pt, 0, P - 1)]
        pc = pw @ T_pred[:3, :3].T + T_pred[:3, 3]
        z = pc[:, 2]
        u = K.fx * pc[:, 0] / np.maximum(z, 1e-6) + K.cx
        v = K.fy * pc[:, 1] / np.maximum(z, 1e-6) + K.cy
        ur_pred = u - K.bf / np.maximum(z, 1e-6)
        in_img = (z > 0) & (u >= 0) & (u < cfg.camera.width) & \
            (v >= 0) & (v < cfg.camera.height)
        rows = bound & in_img

        c_uv = np.asarray(cur.uv)
        c_lvl = np.asarray(cur.level)
        c_desc = np.asarray(cur.desc)
        c_ur = np.asarray(cur.ur)
        c_ok = np.asarray(cur.valid)

        radius = cfg.tracking.motion_model_radius * sf[
            np.clip(l_lvl, 0, len(sf) - 1)]
        du = np.abs(u[:, None] - c_uv[None, :, 0])
        dv = np.abs(v[:, None] - c_uv[None, :, 1])
        win = (du < radius[:, None]) & (dv < radius[:, None]) & c_ok[None, :]
        ur_ok_m = (c_ur[None, :] < 0) | (
            np.abs(ur_pred[:, None] - c_ur[None, :]) < radius[:, None])
        # forward one-sided level window (_motion_level_bounds mirror)
        lvl_win = c_lvl[None, :] >= (l_lvl[:, None] - 1)

        pb = np.unpackbits(np.ascontiguousarray(l_desc).view(np.uint8),
                           axis=-1)
        cb = np.unpackbits(np.ascontiguousarray(c_desc).view(np.uint8),
                           axis=-1)
        # chunked hamming to bound memory
        desc_hit = np.zeros(win.shape, bool)
        step = 256
        for a in range(0, pb.shape[0], step):
            ham = (pb[a:a + step, None, :] != cb[None, :, :]).sum(-1)
            desc_hit[a:a + step] = ham <= 100

        stage_w = (win).any(1)
        stage_u = (win & ur_ok_m).any(1)
        stage_l = (win & ur_ok_m & lvl_win).any(1)
        stage_d = (win & ur_ok_m & lvl_win & desc_hit).any(1)

        # real motion search + pose opt on the same inputs
        res = motion_jit(m, cur, last.uv, last.kp_pt, last.level,
                         last.valid, jnp.asarray(T_pred),
                         jnp.asarray(last_Tcw), last.angle)
        res_norot = motion_norot_jit(m, cur, last.uv, last.kp_pt,
                                     last.level, last.valid,
                                     jnp.asarray(T_pred),
                                     jnp.asarray(last_Tcw))
        mt = np.asarray(res.kp_pt_all)
        inl = np.asarray(res.kp_pt)
        mt_nr = np.asarray(res_norot.kp_pt_all)
        inl_nr = np.asarray(res_norot.kp_pt)
        matched_set = np.zeros((P,), bool)
        matched_set[np.clip(mt, 0, P - 1)] |= (mt >= 0)
        matched_nr_set = np.zeros((P,), bool)
        matched_nr_set[np.clip(mt_nr, 0, P - 1)] |= (mt_nr >= 0)
        inlier_set = np.zeros((P,), bool)
        inlier_set[np.clip(inl, 0, P - 1)] |= (inl >= 0)
        inlier_nr_set = np.zeros((P,), bool)
        inlier_nr_set[np.clip(inl_nr, 0, P - 1)] |= (inl_nr >= 0)
        lptc = np.clip(l_pt, 0, P - 1)

        # GT-correctness of the rotation-killed recoveries: the no-rot
        # match binds keypoint j to map point p — correct if p's GT
        # projection (current true pose from the dataset gt) lands
        # within 3 px of keypoint j
        killed_correct = killed_total = 0
        gtTcw = np.linalg.inv(gt[i])
        kp_of_pt = np.full((P,), -1, np.int64)
        kp_of_pt[np.clip(mt_nr, 0, P - 1)] = np.where(
            mt_nr >= 0, np.arange(len(mt_nr)), -1)
        pw_all = np.asarray(m.pt_xyz)
        for pslot in np.where(matched_nr_set & ~matched_set)[0]:
            r_last = np.where((lptc == pslot) & rows)[0]
            if len(r_last) == 0:
                continue
            j = kp_of_pt[pslot]
            if j < 0:
                continue
            pcg = pw_all[pslot] @ gtTcw[:3, :3].T + gtTcw[:3, 3]
            if pcg[2] <= 0:
                continue
            ug = K.fx * pcg[0] / pcg[2] + K.cx
            vg = K.fy * pcg[1] / pcg[2] + K.cy
            killed_total += 1
            if (ug - c_uv[j, 0]) ** 2 + (vg - c_uv[j, 1]) ** 2 < 9.0:
                killed_correct += 1

        row_stats = dict(
            bound=int(rows.sum()),
            window=int((stage_w & rows).sum()),
            ur_ok=int((stage_u & rows).sum()),
            level=int((stage_l & rows).sum()),
            desc=int((stage_d & rows).sum()),
            matched=int((matched_set[lptc] & rows).sum()),
            matched_norot=int((matched_nr_set[lptc] & rows).sum()),
            inlier=int((inlier_set[lptc] & rows).sum()),
            inlier_norot=int((inlier_nr_set[lptc] & rows).sum()),
            killed_total=killed_total,
            killed_correct=killed_correct)
        for k, val in row_stats.items():
            tot[k] += val
        print(f"f={i} " + " ".join(f"{k}={val}"
                                   for k, val in row_stats.items()),
              flush=True)
        prev = cur

    print("\ntotals:")
    base = max(tot["bound"], 1)
    for k, val in tot.items():
        print(f"  {k:8s}: {val:7d}  ({100.0 * val / base:5.1f}% of bound)")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(tot, f, indent=1)


if __name__ == "__main__":
    main()
