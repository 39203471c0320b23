#!/usr/bin/env python
"""Isolated convergence probe for pose_optimize: correct correspondences
from a planar scene, initialization perturbed by growing amounts."""

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

rng = np.random.RandomState(0)
N = 500
# plane at z=4 in front of the camera, some boxes nearer
pw = np.stack([rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N),
               rng.uniform(3.5, 4.5, N)], -1).astype(np.float32)
T_gt = np.eye(4, dtype=np.float32)

pc = pw
u = K.fx * pc[:, 0] / pc[:, 2] + K.cx
v = K.fy * pc[:, 1] / pc[:, 2] + K.cy
ur = u - K.bf / pc[:, 2]
uv = np.stack([u, v], -1)
# 0.3px measurement noise, levels 0..7 geometric
levels = np.minimum((rng.geometric(0.45, N) - 1), 7)
sf = 1.2 ** levels
uv = uv + rng.randn(N, 2) * 0.3 * sf[:, None]
inv_sigma2 = (1.0 / (sf * sf)).astype(np.float32)

inb = (u >= 0) & (u < K.width) & (v >= 0) & (v < K.height)
obs = PoseObs(uv=jnp.asarray(uv), ur=jnp.asarray(ur),
              pw=jnp.asarray(pw), inv_sigma2=jnp.asarray(inv_sigma2),
              valid=jnp.asarray(inb))

print(f"N valid = {inb.sum()}", flush=True)
import jax
popt = jax.jit(lambda T0: pose_optimize(K, T0, obs))
for dt in [0.005, 0.01, 0.03, 0.1, 0.3, 1.0]:
    for dr_deg in [0.0, 0.5, 2.0]:
        T0 = np.eye(4, dtype=np.float32)
        d = rng.randn(3)
        T0[:3, 3] = dt * d / np.linalg.norm(d)
        th = np.deg2rad(dr_deg)
        c, s = np.cos(th), np.sin(th)
        T0[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        Tcw, inl, n_inl = popt(jnp.asarray(T0))
        err = np.linalg.norm(np.asarray(Tcw)[:3, 3] - T_gt[:3, 3]) * 1000
        print(f"init dt={dt*1000:6.1f}mm dr={dr_deg:3.1f}deg -> "
              f"err={err:8.2f}mm n_inl={int(n_inl):4d}", flush=True)
