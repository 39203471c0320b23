#!/usr/bin/env python
"""Close map-point recovery attribution inside the REAL tracker.

The retention probe (diag_kitti_retention.py) bounds what the motion
search COULD recover from detection alone (71% on the r5 scene); but the
live pipeline's close_trk plateaus far below that. This probe runs the
actual SlamSystem on the KITTI drive and, after every frame, classifies
every CLOSE map point (z < th_depth*baseline in the current camera) by
the first gate of the local-map search chain (slam/tracking.py
track_local_map ≙ Tracking.cc:1408-1456 SearchLocalPoints) that blocks
it:

  matched      — kp_pt binding exists (counts toward close_trk)
  no_local     — not in the local point set (select_local_points cap/vote)
  frustum      — z<=0 / out of image / dist outside [0.8 min, 1.2 max] /
                 view_cos <= 0.5      (Frame::isInFrustum)
  no_kp_radius — no free keypoint within the (2.5|4.0)*sf[pred] window
  level        — keypoint in window but outside pred±1 level gate
  desc         — keypoint in window+level but descriptor > TH_HIGH
  lost         — a matchable candidate existed and still no binding
                 (pose-opt regating or duplicate resolution took it)

Usage: python scripts/diag_local_recovery.py --frames 40 [--start 0]
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
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--platform", default=None, choices=["cpu", "axon"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from PIL import Image
    from object_slam_tpu.config import SlamConfig
    from object_slam_tpu.datasets import kitti
    from object_slam_tpu.slam.system import SlamSystem

    cfg = SlamConfig.kitti_stereo()
    sys_ = SlamSystem(cfg)
    frames = kitti.load_sequence(args.seq)
    close_z = cfg.camera.th_depth * cfg.camera.baseline
    cam = cfg.camera
    sf = np.asarray(sys_.scale_factors)
    log_scale = float(sys_.log_scale)
    n_levels = len(sf)

    tot = {k: 0 for k in ["close_vis", "matched", "no_local", "frustum",
                          "no_kp_radius", "level", "desc", "lost",
                          "level_would_pass_w2", "radius_would_pass_2x"]}
    per_frame = []

    for i in range(args.start, args.start + args.frames):
        fr = frames[i]
        gl = np.asarray(Image.open(fr.left_path), np.uint8)
        gr = np.asarray(Image.open(fr.right_path), np.uint8)
        sa = kitti.load_semantics(os.path.join(args.seq, "semantic"),
                                  fr.index, cfg)
        sys_.track_stereo(gl, gr, None, sa, fr.timestamp)
        if sys_.last_frame is None or i < args.start + 2:
            continue

        m = sys_.map
        frame = sys_.last_frame
        Tcw = np.asarray(frame.Tcw)
        pt_valid = np.asarray(m.pt_valid)
        pw = np.asarray(m.pt_xyz)
        normal = np.asarray(m.pt_normal)
        mind = np.asarray(m.pt_min_dist)
        maxd = np.asarray(m.pt_max_dist)
        desc = np.asarray(m.pt_desc)
        P = pw.shape[0]

        pc = pw @ Tcw[:3, :3].T + Tcw[:3, 3]
        z = pc[:, 2]
        close = pt_valid & (z > 0.1) & (z < close_z)
        u = cam.fx * pc[:, 0] / np.maximum(z, 1e-6) + cam.cx
        v = cam.fy * pc[:, 1] / np.maximum(z, 1e-6) + cam.cy
        in_img = (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)
        close_vis = close & in_img
        n_close_vis = int(close_vis.sum())
        if n_close_vis == 0:
            continue

        kp_pt = np.asarray(frame.kp_pt)
        matched_set = np.zeros((P,), bool)
        matched_set[np.clip(kp_pt, 0, P - 1)] |= (kp_pt >= 0)
        matched = close_vis & matched_set

        # local set membership (mirror select_local_points voting)
        kf_kp_pt = np.asarray(m.kf_kp_pt)
        kf_kp_valid = np.asarray(m.kf_kp_valid)
        kf_valid = np.asarray(m.kf_valid)
        obs_ok = (kf_kp_pt >= 0) & kf_kp_valid & kf_valid[:, None]
        votes = (matched_set[np.clip(kf_kp_pt, 0, P - 1)] & obs_ok).sum(1)
        order = np.argsort(-votes)[:16]
        order = order[votes[order] > 0]
        local_mask = np.zeros((P,), bool)
        for kf in order:
            sel = kf_kp_pt[kf]
            okk = (sel >= 0) & kf_kp_valid[kf]
            local_mask[np.clip(sel, 0, P - 1)] |= okk
        local_mask &= pt_valid
        # compaction cap: recent-first then obs count (mirror)
        cap = cfg.caps.local_search_pts
        if local_mask.sum() > cap:
            recent = np.asarray(m.pt_first_kf) >= int(m.n_kf) - 3
            score = np.where(recent, 1e6, 0) + np.asarray(m.pt_n_obs)
            score = np.where(local_mask, score, -1)
            keep = np.argsort(-score)[:cap]
            lm2 = np.zeros((P,), bool)
            lm2[keep] = score[keep] >= 0
            local_mask = lm2

        # frustum (dist + viewcos)
        cc = -Tcw[:3, :3].T @ Tcw[:3, 3]
        po = pw - cc
        dist = np.linalg.norm(po, axis=1)
        vcos = (po * normal).sum(1) / np.maximum(dist, 1e-6)
        frustum_ok = ((dist >= 0.8 * mind) & (dist <= 1.2 * maxd)
                      & (vcos > 0.5))

        # keypoint window
        kp_uv = np.asarray(frame.uv)
        kp_lvl = np.asarray(frame.level)
        kp_desc = np.asarray(frame.desc)
        kp_free = np.asarray(frame.valid) & (kp_pt < 0)

        lvl = np.clip(np.ceil(np.log(np.maximum(
            maxd / np.maximum(dist, 1e-6), 1e-6)) / log_scale
        ).astype(np.int32), 0, n_levels - 1)
        r0 = np.where(vcos > 0.998, 2.5, 4.0)
        radius = r0 * sf[lvl] * (7.0 / 7.0)

        rows = np.where(close_vis & ~matched)[0]
        cnt = dict(no_local=0, frustum=0, no_kp_radius=0, level=0,
                   desc=0, lost=0, level_would_pass_w2=0,
                   radius_would_pass_2x=0)
        pb = np.unpackbits(np.ascontiguousarray(desc[rows]).view(np.uint8),
                           axis=-1) if len(rows) else None
        cb = np.unpackbits(np.ascontiguousarray(kp_desc).view(np.uint8),
                           axis=-1)
        for k, p in enumerate(rows):
            if not local_mask[p]:
                cnt["no_local"] += 1
                continue
            if not frustum_ok[p]:
                cnt["frustum"] += 1
                continue
            du = np.abs(u[p] - kp_uv[:, 0])
            dv = np.abs(v[p] - kp_uv[:, 1])
            win = (du < radius[p]) & (dv < radius[p]) & kp_free
            if not win.any():
                if ((du < 2 * radius[p]) & (dv < 2 * radius[p])
                        & kp_free).any():
                    cnt["radius_would_pass_2x"] += 1
                cnt["no_kp_radius"] += 1
                continue
            lvl_ok = np.abs(kp_lvl - lvl[p]) <= 1
            if not (win & lvl_ok).any():
                if (win & (np.abs(kp_lvl - lvl[p]) <= 2)).any():
                    cnt["level_would_pass_w2"] += 1
                cnt["level"] += 1
                continue
            ham = (pb[k][None, :] != cb[win & lvl_ok]).sum(-1)
            if ham.min() > 100:
                cnt["desc"] += 1
                continue
            cnt["lost"] += 1

        tot["close_vis"] += n_close_vis
        tot["matched"] += int(matched.sum())
        for k in cnt:
            tot[k] += cnt[k]
        per_frame.append(dict(f=i, close_vis=n_close_vis,
                              matched=int(matched.sum()), **cnt))
        print(f"f={i} vis={n_close_vis} matched={int(matched.sum())} "
              + " ".join(f"{k}={v}" for k, v in cnt.items()), flush=True)

    print("\ntotals over", len(per_frame), "frames:")
    for k, v in tot.items():
        pct = 100.0 * v / max(tot["close_vis"], 1)
        print(f"  {k:12s}: {v:7d}  ({pct:5.1f}%)")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"totals": tot, "per_frame": per_frame}, f, indent=1)


if __name__ == "__main__":
    main()
