#!/usr/bin/env python
"""Replay a dumped frame's pose optimization offline.

Usage: python scripts/diag_replay.py /tmp/dump/f015.npz
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax.numpy as jnp

from object_slam_tpu.config import SlamConfig
from object_slam_tpu.geometry.camera import Intrinsics
from object_slam_tpu.solvers.pose_opt import PoseObs, pose_optimize

cfg = SlamConfig.tum_rgbd()
K = Intrinsics.from_config(cfg.camera)
sf = np.asarray([cfg.orb.scale_factor ** l for l in range(cfg.orb.n_levels)])
inv_sigma2_lvl = (1.0 / (sf * sf)).astype(np.float32)

d = np.load(sys.argv[1])
T_gt = d["T_gt"]


def replay(kp_pt, T0, label):
    matched = (kp_pt >= 0) & d["valid"]
    P = d["pt_xyz"].shape[0]
    ptc = np.clip(kp_pt, 0, P - 1)
    obs = PoseObs(
        uv=jnp.asarray(d["uv"]),
        ur=jnp.asarray(np.where(matched, d["ur"], -1.0)),
        pw=jnp.asarray(d["pt_xyz"][ptc]),
        inv_sigma2=jnp.asarray(inv_sigma2_lvl[np.clip(d["level"], 0, 7)]),
        valid=jnp.asarray(matched))
    Tcw, inl, n_inl = pose_optimize(K, jnp.asarray(T0), obs)
    Tcw = np.asarray(Tcw)
    err0 = np.linalg.norm(T0[:3, 3] - T_gt[:3, 3]) * 1000
    err = np.linalg.norm(Tcw[:3, 3] - T_gt[:3, 3]) * 1000
    # match correctness + spatial spread
    pw = d["pt_xyz"][ptc[matched]]
    pc = (T_gt[:3, :3] @ pw.T).T + T_gt[:3, 3]
    z = np.maximum(pc[:, 2], 1e-6)
    u = float(K.fx) * pc[:, 0] / z + float(K.cx)
    v = float(K.fy) * pc[:, 1] / z + float(K.cy)
    kp = d["uv"][matched]
    dd = np.hypot(u - kp[:, 0], v - kp[:, 1])
    lv = d["level"][matched]
    print(f"{label}: n={matched.sum():4d} wrong={(dd>3).mean()*100:4.1f}% "
          f"err {err0:7.1f} -> {err:7.1f}mm  n_inl={int(n_inl):4d}  "
          f"uv-spread=({kp[:,0].std():.0f},{kp[:,1].std():.0f})px "
          f"levels p50={np.median(lv):.0f} p90={np.percentile(lv,90):.0f}")
    return Tcw


for name, T0 in [("from T_pred", d["T_pred"]),
                 ("from Tcw_local", d["Tcw_local"]),
                 ("from T_gt  ", T_gt.astype(np.float32))]:
    print(f"--- init {name} ---")
    replay(d["kp_pt_motion"], T0, "motion-matches")
    replay(d["kp_pt_local"], T0, "local-matches ")
print("recorded: Tcw_motion err = {:.1f}mm, Tcw_local err = {:.1f}mm".format(
    np.linalg.norm(d["Tcw_motion"][:3, 3] - T_gt[:3, 3]) * 1000,
    np.linalg.norm(d["Tcw_local"][:3, 3] - T_gt[:3, 3]) * 1000))
print("T_pred err = {:.1f}mm".format(
    np.linalg.norm(d["T_pred"][:3, 3] - T_gt[:3, 3]) * 1000))

# --- cost comparison at the two solutions ---
def cost(kp_pt, T):
    matched = (kp_pt >= 0) & d["valid"]
    P = d["pt_xyz"].shape[0]
    ptc = np.clip(kp_pt, 0, P - 1)
    pw = d["pt_xyz"][ptc]
    pc = (T[:3, :3] @ pw.T).T + T[:3, 3]
    z = np.maximum(pc[:, 2], 1e-6)
    u = float(K.fx) * pc[:, 0] / z + float(K.cx)
    v = float(K.fy) * pc[:, 1] / z + float(K.cy)
    urp = u - float(K.bf) / z
    ru = d["uv"][:, 0] - u
    rv = d["uv"][:, 1] - v
    rr = np.where(d["ur"] >= 0, d["ur"] - urp, 0.0)
    isig = inv_sigma2_lvl[np.clip(d["level"], 0, 7)]
    chi2 = (ru * ru + rv * rv + rr * rr) * isig
    # Huber rho
    delta2 = np.where(d["ur"] >= 0, 7.815, 5.991)
    rho = np.where(chi2 <= delta2, chi2,
                   2 * np.sqrt(delta2 * np.maximum(chi2, 1e-12)) - delta2)
    rho = np.where(matched, rho, 0.0)
    n = matched.sum()
    print(f"  cost={rho.sum():10.1f} mean={rho.sum()/n:6.3f} "
          f"medianchi2={np.median(chi2[matched]):6.3f} n={n}")

import jax
T_wrong = np.asarray(replay(d["kp_pt_local"], d["T_pred"], "wrong-basin  "))
T_right = np.asarray(replay(d["kp_pt_local"], T_gt.astype(np.float32), "right-basin  "))
print("cost at wrong solution:"); cost(d["kp_pt_local"], T_wrong)
print("cost at right solution:"); cost(d["kp_pt_local"], T_right)
print("cost at exact GT      :"); cost(d["kp_pt_local"], T_gt)
