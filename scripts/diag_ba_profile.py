#!/usr/bin/env python
"""Isolate where local-BA time goes at KITTI caps: scaling probes over
LM iteration count, CG iteration count, and the reduction structure
(scatter vs blocked/gather form), on a synthetic problem with realistic
shapes (Wtot=40 window KFs x N=2048 kps, Lp-compacted points)."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=["cpu", "axon"])
    ap.add_argument("--wtot", type=int, default=40)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--lp", type=int, default=8192)
    args = ap.parse_args()
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from object_slam_tpu.config import SlamConfig
    from object_slam_tpu.geometry.camera import Intrinsics
    from object_slam_tpu.solvers.ba import BAProblem, ba_iterate

    cfg = SlamConfig.kitti_stereo()
    K = Intrinsics.from_config(cfg.camera)
    Wtot, N, Lp = args.wtot, args.n, args.lp
    O = Wtot * N
    rng = np.random.RandomState(0)

    # camera ring looking at a point cloud
    pts = rng.uniform([-20, -5, 5], [20, 5, 60], (Lp, 3)).astype(np.float32)
    poses = []
    for i in range(Wtot):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.1 * i, 0, -0.5 * i]
        poses.append(T)
    poses = np.stack(poses)

    fx, fy, cx, cy, bf = (float(K.fx), float(K.fy), float(K.cx),
                          float(K.cy), float(K.bf))
    obs_pt = rng.randint(0, Lp, (O,)).astype(np.int32)
    obs_kf = np.repeat(np.arange(Wtot), N).astype(np.int32)
    pw = pts[obs_pt]
    pc = (poses[obs_kf, :3, :3] @ pw[..., None])[..., 0] + poses[obs_kf, :3, 3]
    z = np.maximum(pc[:, 2], 0.1)
    uv = np.stack([fx * pc[:, 0] / z + cx,
                   fy * pc[:, 1] / z + cy], -1)
    uv += rng.normal(0, 0.5, uv.shape)
    ur = uv[:, 0] - bf / z
    valid = (pc[:, 2] > 0.5) & (np.abs(uv[:, 0] - cx) < cx) \
        & (np.abs(uv[:, 1] - cy) < cy)
    valid = np.asarray(valid)

    # per-point slot table: obs o in slot (kf % Wtot) — here each point is
    # hit by random obs; build via host loop
    slot = np.full((Lp, Wtot), -1, np.int64)
    for o in range(O):
        if not valid[o]:
            continue
        p, w = obs_pt[o], obs_kf[o]
        if slot[p, w] < 0:
            slot[p, w] = o
        else:
            valid[o] = False          # dedupe like the real builder

    prob = BAProblem(
        kf_pose=jnp.asarray(poses),
        kf_fixed=jnp.zeros((Wtot,), bool).at[0].set(True),
        kf_valid=jnp.ones((Wtot,), bool),
        pt_xyz=jnp.asarray(pts + rng.normal(0, 0.05, pts.shape)
                           .astype(np.float32)),
        pt_valid=jnp.ones((Lp,), bool),
        obs_kf=jnp.asarray(obs_kf), obs_pt=jnp.asarray(obs_pt),
        obs_uv=jnp.asarray(uv.astype(np.float32)),
        obs_ur=jnp.asarray(np.where(valid, ur, -1.0).astype(np.float32)),
        obs_inv_sigma2=jnp.ones((O,)),
        obs_valid=jnp.asarray(valid))
    slot_j = jnp.asarray(slot.astype(np.int32))

    def timeit(name, fn, n=3):
        out = fn(); jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out)
        print(f"{name:44s} {(time.perf_counter()-t0)/n*1e3:9.1f} ms",
              flush=True)

    variants = [
        ("scatter  n_iters=5  cg=24", dict(block_n=None, slot=False, it=5, cg=24)),
        ("blocked  n_iters=5  cg=24", dict(block_n=N, slot=False, it=5, cg=24)),
        ("blk+slot n_iters=1  cg=24", dict(block_n=N, slot=True, it=1, cg=24)),
        ("blk+slot n_iters=5  cg=0 ", dict(block_n=N, slot=True, it=5, cg=0)),
        ("blk+slot n_iters=5  cg=8 ", dict(block_n=N, slot=True, it=5, cg=8)),
        ("blk+slot n_iters=5  cg=24", dict(block_n=N, slot=True, it=5, cg=24)),
        ("blk+slot n_iters=15 cg=24", dict(block_n=N, slot=True, it=15, cg=24)),
    ]
    for name, v in variants:
        fn = jax.jit(lambda p, it=v["it"], cg=v["cg"], bn=v["block_n"],
                     sl=v["slot"]: ba_iterate(
                         K, p, it, cg_iters=cg, block_n=bn,
                         pt_obs_slot=slot_j if sl else None))
        timeit(name, lambda fn=fn: fn(prob))


if __name__ == "__main__":
    main()
