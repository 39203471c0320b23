#!/usr/bin/env python
"""Diagnose loop-closure quality on the in-room circuit: track the
sequence with the loop module on, record ATE before/after each closure,
and dump the Sim3 each closure applied vs the ground-truth relative pose.

Context: on the low-drift 200-frame circuit the loop-enabled driver run
came back WORSE (ATE 76.7 mm vs 30.2 mm without). This isolates whether
the regression is (a) a bad Sim3 estimate, (b) pose-graph warping, or
(c) closures firing where the revisit is already absorbed by local-map
matching against the original points.

Usage: python scripts/diag_loop.py [--frames 120] [--scale 2]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-tests")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--scale", type=int, default=2)
    ap.add_argument("--turns", type=float, default=1.15)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--no-loop", action="store_true",
                    help="identical run with the loop module off — the "
                         "A/B control for the closure's ATE effect")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "axon"])
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from scripts.ab_deviations import build_cfg
    from object_slam_tpu.datasets.synthetic import (SyntheticScene,
                                                    loop_trajectory)
    from object_slam_tpu.eval.ate import align_horn_svd
    from object_slam_tpu.geometry import se3
    from object_slam_tpu.slam.system import SlamSystem

    cfg = build_cfg(args.scale)
    scene = SyntheticScene.make(cfg, seed=args.seed, n_objects=3,
                                plane_z=4.0)
    for b in scene.boxes:
        b["size"] = 0.9
    poses = loop_trajectory(args.frames, sweep=2 * np.pi * args.turns)

    sys_ = SlamSystem(cfg, enable_objects=False,
                      enable_loop=not args.no_loop)
    lc = sys_.loop_closer

    # monkey-patch instrumentation around _correct_loop
    orig_correct = lc._correct_loop if lc is not None else None
    events = []

    def kf_pose_errors(m, tag):
        """Per-KF translation error vs GT (mm), for valid KFs."""
        errs = {}
        kv = np.asarray(m.kf_valid)
        kp = np.asarray(m.kf_pose)
        for k, fi in kf_frame.items():
            if k < len(kv) and kv[k]:
                errs[k] = float(np.linalg.norm(
                    np.linalg.inv(kp[k])[:3, 3]
                    - np.linalg.inv(poses[fi])[:3, 3]) * 1e3)
        mean = np.mean(list(errs.values())) if errs else float("nan")
        print(f"KF-ERR[{tag}] mean {mean:.1f} mm :",
              {k: round(v, 1) for k, v in sorted(errs.items())}, flush=True)
        return errs

    def instrumented(m, q, l, T12, s12):
        q_fi = kf_frame.get(int(q), current_frame[0])
        kf_frame[int(q)] = q_fi
        Tq = np.asarray(m.kf_pose[q])
        Tl = np.asarray(m.kf_pose[l])
        gt_q, gt_l = poses[q_fi], poses[kf_frame[int(l)]]
        ev = {"q": int(q), "l": int(l), "s12": float(s12)}
        T12_gt = gt_q @ np.linalg.inv(gt_l)
        T12_np = np.asarray(T12)
        dT = T12_np @ np.linalg.inv(T12_gt)
        ev["sim3_trans_err_mm"] = float(np.linalg.norm(dT[:3, 3]) * 1e3)
        ev["sim3_rot_err_deg"] = float(np.degrees(np.arccos(
            np.clip((np.trace(dT[:3, :3]) - 1) / 2, -1, 1))))
        # drift the closure is supposed to fix: current estimated
        # relative pose vs ground truth
        T12_est = Tq @ np.linalg.inv(Tl)
        dD = T12_est @ np.linalg.inv(T12_gt)
        ev["drift_trans_mm"] = float(np.linalg.norm(dD[:3, 3]) * 1e3)
        ev["drift_rot_deg"] = float(np.degrees(np.arccos(
            np.clip((np.trace(dD[:3, :3]) - 1) / 2, -1, 1))))
        events.append(ev)
        print("CLOSURE", json.dumps(ev), flush=True)
        kf_pose_errors(m, "before")
        m2, accepted = orig_correct(m, q, l, T12, s12)
        ev["accepted"] = bool(accepted)
        if lc.events:
            print("GATE", json.dumps(lc.events[-1]), flush=True)
        kf_pose_errors(m2, "after" if accepted else "after(REJECTED)")
        return m2, accepted

    if lc is not None:
        lc._correct_loop = instrumented

    kf_frame = {}
    current_frame = [0]
    est, gt, oks = [], [], []
    last_nkf = 0
    for i, T in enumerate(poses):
        current_frame[0] = i
        gray, depth, rgb, sem = scene.render_rgbd(T)
        f = sys_.track_rgbd(jnp.asarray(gray), jnp.asarray(depth),
                            jnp.asarray(rgb), None,
                            timestamp=float(i) / 30.0)
        if sys_.last_kf_id >= 0 and sys_.last_kf_id not in kf_frame:
            kf_frame[sys_.last_kf_id] = i
        est.append(np.linalg.inv(np.asarray(f.Tcw))[:3, 3])
        gt.append(np.linalg.inv(T)[:3, 3])
        oks.append(bool(f.pose_ok))

    est, gt, ok = np.array(est), np.array(gt), np.array(oks)
    _, _, err = align_horn_svd(est[ok].T, gt[ok].T)
    print(json.dumps({
        "tracked": int(ok.sum()), "frames": args.frames,
        "online_ate_mm": float(np.sqrt((err ** 2).mean()) * 1e3),
        "loops_closed": lc.n_loops_closed if lc is not None else 0,
        "loops_rejected": lc.n_loops_rejected if lc is not None else 0,
    }))

    # final (retro-corrected) trajectory, as the driver saves it
    traj = sys_.final_trajectory()
    fin = np.array([np.linalg.inv(T)[:3, 3] for _, T, okk in traj if okk])
    gtf = gt[[i for i, (_, _, okk) in enumerate(traj) if okk]]
    _, _, err2 = align_horn_svd(fin.T, gtf.T)
    print(json.dumps({
        "final_traj_ate_mm": float(np.sqrt((err2 ** 2).mean()) * 1e3)}))


if __name__ == "__main__":
    main()
