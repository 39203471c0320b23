#!/usr/bin/env python
"""Step-by-step GN trace on a dumped frame: error after each iteration."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax.numpy as jnp

from object_slam_tpu.config import SlamConfig
from object_slam_tpu.geometry.camera import Intrinsics
from object_slam_tpu.solvers import pose_opt as po

cfg = SlamConfig.tum_rgbd()
K = Intrinsics.from_config(cfg.camera)
sf = np.asarray([cfg.orb.scale_factor ** l for l in range(cfg.orb.n_levels)])
inv_sigma2_lvl = (1.0 / (sf * sf)).astype(np.float32)

d = np.load(sys.argv[1])
T_gt = d["T_gt"]
kp_pt = d["kp_pt_local"]
matched = (kp_pt >= 0) & d["valid"]
P = d["pt_xyz"].shape[0]
ptc = np.clip(kp_pt, 0, P - 1)
obs = po.PoseObs(
    uv=jnp.asarray(d["uv"]),
    ur=jnp.asarray(np.where(matched, d["ur"], -1.0)),
    pw=jnp.asarray(d["pt_xyz"][ptc]),
    inv_sigma2=jnp.asarray(inv_sigma2_lvl[np.clip(d["level"], 0, 7)]),
    valid=jnp.asarray(matched))

import jax
gn = jax.jit(lambda T, l, a: po._lm_step(K, T, l, obs, a, 5.991, 7.815))
regate = jax.jit(lambda T: po.reproj_residual_jac(K, T, obs))
T = jnp.asarray(d["T_pred"])
lam = jnp.float32(1e-3)
active = obs.valid
print(f"start err={np.linalg.norm(np.asarray(T)[:3,3]-T_gt[:3,3])*1000:.1f}mm")
for rnd in range(4):
    for it in range(10):
        T2, lam = gn(T, lam, active)
        step = np.linalg.norm(np.asarray(T2)[:3, 3] - np.asarray(T)[:3, 3])
        T = T2
        err = np.linalg.norm(np.asarray(T)[:3, 3] - T_gt[:3, 3]) * 1000
        if it < 3 or it == 9:
            print(f"r{rnd} it{it}: err={err:8.2f}mm |dt|={step*1000:7.2f}mm "
                  f"active={int(jnp.sum(active)):4d}")
    r, _, stereo, z = regate(T)
    chi2 = po.edge_chi2(r, obs.inv_sigma2, stereo)
    gate = jnp.where(stereo, 7.815, 5.991)
    active = obs.valid & (chi2 <= gate) & (z > 0)
    print(f"after regate: active={int(jnp.sum(active))}")
