#!/usr/bin/env python
"""Per-frame tracking retention diagnostic on the synthetic VGA scene.

Renders an orbit (rotation+translation) sequence and prints, per frame,
the motion-model match count, local-map inliers, and pose error vs ground
truth — the measurement harness for the round-1 retention limitation
(BENCHMARKS.md "Known round-1 limitation").

Usage: JAX_PLATFORMS=cpu python scripts/diag_retention.py --frames 30
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

flags = os.environ.get("XLA_FLAGS", "")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--step", type=float, default=0.03)
    ap.add_argument("--radius", type=float, default=0.4)
    ap.add_argument("--objects", action="store_true")
    ap.add_argument("--loc-only", action="store_true",
                    help="freeze the map after initialization")
    ap.add_argument("--no-ba", action="store_true",
                    help="skip local BA in mapping")
    ap.add_argument("--traj", choices=["orbit", "loop"], default="orbit")
    ap.add_argument("--traj-frames", type=int, default=0,
                    help="full trajectory length (pan rate); default = "
                         "--frames")
    ap.add_argument("--flat", action="store_true",
                    help="old degenerate single-plane scene (room=False)")
    args = ap.parse_args()

    import jax
    # config.update beats the env var: the axon sitecustomize forces
    # jax_platforms="axon,cpu" via jax.config at import, so an env-level
    # JAX_PLATFORMS=cpu is silently ignored. OSLAM_PLATFORM=axon runs the
    # diagnostic on the attached TPU instead (remote-compile: slow cold).
    jax.config.update("jax_platforms",
                      os.environ.get("OSLAM_PLATFORM", "cpu"))

    from object_slam_tpu.config import SlamConfig
    from object_slam_tpu.datasets.synthetic import (SyntheticScene,
                                                    orbit_poses,
                                                    loop_trajectory)
    from object_slam_tpu.slam.system import SlamSystem

    cfg = SlamConfig.tum_rgbd()
    scene = SyntheticScene.make(cfg, seed=3, n_objects=2, plane_z=4.0,
                                room=not args.flat)
    if args.traj == "loop":
        poses = loop_trajectory(args.traj_frames or args.frames)
        poses = poses[:args.frames]
    else:
        poses = orbit_poses(args.frames, radius=args.radius, step=args.step)

    sys_ = SlamSystem(cfg, enable_objects=args.objects)
    if args.no_ba:
        from object_slam_tpu.slam import local_mapping as lm

        def _no_ba(K, m, kf_id, window, n_fixed, inv_sigma2_lvl, **kw):
            return m
        lm.run_local_ba = _no_ba
        sys_._jit_mapping = __import__("jax").jit(sys_.kernels._mapping_impl)
    errs = []
    for i, T in enumerate(poses):
        gray, depth, rgb, sem = scene.render_rgbd(T)
        if args.loc_only and sys_.state == 1:
            sys_.enable_mapping = False
        frame = sys_.track_rgbd(gray, depth, rgb, timestamp=i / 30.0)
        Tcw = np.asarray(frame.Tcw)
        # align to gt frame 0 (both start at poses[0])
        err = np.linalg.norm(Tcw[:3, 3] - T[:3, 3])
        dR = Tcw[:3, :3] @ T[:3, :3].T
        rot_deg = np.degrees(np.arccos(
            np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        # camera-center error resolved in the GT camera frame (x right,
        # y down, z forward): separates lateral slip from depth drift
        C_est = -Tcw[:3, :3].T @ Tcw[:3, 3]
        C_gt = -T[:3, :3].T @ T[:3, 3]
        dC = T[:3, :3] @ (C_est - C_gt)
        errs.append(err)
        rec = sys_.trajectory[-1]
        extra = ""
        dbg = getattr(sys_, "debug_last", None)
        if dbg is not None and i > 0:
            # match correctness vs ground truth: reproject each matched map
            # point with the GT pose; >3px from its keypoint = wrong match
            from object_slam_tpu.geometry import se3 as se3m
            from object_slam_tpu.geometry import camera as camm
            for tag in ("tr_motion", "tr_local"):
                tr = dbg[tag]
                kp_pt = np.asarray(tr.kp_pt)
                sel = kp_pt >= 0
                if sel.sum() == 0:
                    extra += f" {tag}: 0 matches"
                    continue
                pw = np.asarray(sys_.map.pt_xyz)[kp_pt[sel]]
                pc = (T[:3, :3] @ pw.T).T + T[:3, 3]
                z = np.maximum(pc[:, 2], 1e-6)
                u = cfg.camera.fx * pc[:, 0] / z + cfg.camera.cx
                v = cfg.camera.fy * pc[:, 1] / z + cfg.camera.cy
                kp_uv = np.asarray(frame.uv)[sel]
                d = np.hypot(u - kp_uv[:, 0], v - kp_uv[:, 1])
                terr = np.linalg.norm(
                    np.asarray(tr.Tcw)[:3, 3] - T[:3, 3]) * 1000
                extra += (f" | {tag[3:]}: n={sel.sum():4d} "
                          f"wrong={(d > 3).mean()*100:4.1f}% "
                          f"err={terr:7.1f}mm")
            # map bias: matched map-point positions vs GT backprojection of
            # the keypoint through the rendered depth + GT pose
            kp_pt = np.asarray(dbg["tr_local"].kp_pt)
            fd = np.asarray(frame.depth)
            sel = (kp_pt >= 0) & (fd > 0)
            if sel.sum() > 0:
                uvn = np.asarray(frame.uv)[sel]
                z = fd[sel]
                pc_gt = np.stack([(uvn[:, 0] - cfg.camera.cx) / cfg.camera.fx * z,
                                  (uvn[:, 1] - cfg.camera.cy) / cfg.camera.fy * z,
                                  z], -1)
                Twc = np.linalg.inv(T)
                pw_gt = pc_gt @ Twc[:3, :3].T + Twc[:3, 3]
                e3d = np.linalg.norm(
                    np.asarray(sys_.map.pt_xyz)[kp_pt[sel]] - pw_gt, axis=1)
                extra += (f" | map3d med={np.median(e3d)*1000:6.1f}mm "
                          f"p90={np.percentile(e3d, 90)*1000:6.1f}mm")
                pv = np.asarray(sys_.map.pt_valid)
                px = np.asarray(sys_.map.pt_xyz)
                far = pv & (np.linalg.norm(px, axis=1) > 20.0)
                if far.sum():
                    extra += f" | FAR_PTS={far.sum()}"
            if err > 0.02 and os.environ.get("OSLAM_DUMP"):
                out = os.environ["OSLAM_DUMP"]
                os.makedirs(out, exist_ok=True)
                np.savez(os.path.join(out, f"f{i:03d}.npz"),
                         uv=np.asarray(frame.uv), ur=np.asarray(frame.ur),
                         level=np.asarray(frame.level),
                         valid=np.asarray(frame.valid),
                         depth=np.asarray(frame.depth),
                         kp_pt_motion=np.asarray(dbg["tr_motion"].kp_pt_all),
                         kp_pt_local=np.asarray(dbg["tr_local"].kp_pt_all),
                         T_pred=np.asarray(dbg["T_pred"]),
                         Tcw_motion=np.asarray(dbg["tr_motion"].Tcw),
                         Tcw_local=np.asarray(dbg["tr_local"].Tcw),
                         pt_xyz=np.asarray(sys_.map.pt_xyz),
                         pt_valid=np.asarray(sys_.map.pt_valid),
                         T_gt=T)
            sys_.debug_last = None
        print(f"f={i:3d} tracked={int(rec.tracked)} "
              f"state={sys_.state} err={err*1000:7.1f}mm "
              f"rot={rot_deg:5.2f}deg dC=({dC[0]*1000:6.1f},"
              f"{dC[1]*1000:6.1f},{dC[2]*1000:6.1f})mm "
              f"kfs={sys_.n_keyframes} pts={sys_.n_points}{extra}",
              flush=True)
    errs = np.asarray(errs)
    n_ok = sum(1 for r in sys_.trajectory if r.tracked)
    print(f"\ntracked {n_ok}/{len(poses)} frames; "
          f"ATE(raw) {np.sqrt(np.mean(errs**2))*1000:.1f}mm; "
          f"max {errs.max()*1000:.1f}mm")


if __name__ == "__main__":
    main()
