#!/usr/bin/env python
"""Distributed-BA scaling benchmark.

Measures global-BA iteration throughput of the observation-sharded Schur
solver at 1..N devices (BASELINE.md: >= 70% scaling efficiency target).
On the single-chip environment run it with a virtual CPU mesh:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      JAX_PLATFORMS=cpu python scripts/bench_ba_scaling.py

On a real pod slice it uses the actual devices (and jax.distributed for
multi-host). Prints one JSON line per mesh size.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kf", type=int, default=64)
    ap.add_argument("--pts", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpu-mesh", type=int, default=0,
                    help="force a virtual CPU mesh of this size")
    args = ap.parse_args()

    if args.cpu_mesh:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   f" --xla_force_host_platform_device_count={args.cpu_mesh}")
    from object_slam_tpu.parallel.distributed import \
        maybe_initialize_distributed
    multihost = maybe_initialize_distributed()   # no-op without coordinator
    import jax
    if args.cpu_mesh:
        jax.config.update("jax_platforms", "cpu")
    if multihost:
        print(json.dumps({"distributed": True,
                          "process": jax.process_index(),
                          "devices": jax.device_count()}))
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh
    from object_slam_tpu.config import SlamConfig
    from object_slam_tpu.geometry import se3, camera as cam_mod
    from object_slam_tpu.parallel.sharded_ba import make_sharded_ba, pad_obs_to
    from object_slam_tpu.solvers.ba import BAProblem

    K = cam_mod.Intrinsics.from_config(SlamConfig().camera)
    rng = np.random.RandomState(0)
    n_kf, n_pt = args.kf, args.pts
    pts = jnp.asarray(rng.uniform(-3, 3, (n_pt, 3)).astype(np.float32)
                      + np.array([0, 0, 6], np.float32))
    poses = jnp.stack([se3.exp(jnp.asarray(
        rng.normal(0, 0.1, 6).astype(np.float32))) for _ in range(n_kf)])
    obs_kf = jnp.asarray(np.repeat(np.arange(n_kf), n_pt // 4))
    obs_pt = jnp.asarray(rng.randint(0, n_pt, obs_kf.shape[0]))
    pc = jnp.einsum('oij,oj->oi', poses[obs_kf, :3, :3], pts[obs_pt]) \
        + poses[obs_kf, :3, 3]
    z = jnp.maximum(pc[:, 2], 1e-3)
    uv = jnp.stack([K.fx * pc[:, 0] / z + K.cx,
                    K.fy * pc[:, 1] / z + K.cy], -1)
    prob = BAProblem(
        kf_pose=poses, kf_fixed=jnp.zeros(n_kf, bool).at[0].set(True),
        kf_valid=jnp.ones(n_kf, bool),
        pt_xyz=pts + 0.01, pt_valid=jnp.ones(n_pt, bool),
        obs_kf=obs_kf, obs_pt=obs_pt, obs_uv=uv,
        obs_ur=uv[:, 0] - K.bf / z,
        obs_inv_sigma2=jnp.ones(obs_kf.shape[0]),
        obs_valid=z > 0.1)

    devices = jax.devices()
    sizes = [s for s in (1, 2, 4, 8, len(devices)) if s <= len(devices)]
    sizes = sorted(set(sizes))
    base_rate = None
    for nd in sizes:
        mesh = Mesh(np.asarray(devices[:nd]).reshape(-1), ('ba',))
        p = pad_obs_to(prob, nd)
        fn = make_sharded_ba(K, mesh, n_iters=args.iters)
        out = fn(p)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(p)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.reps
        rate = args.iters / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * nd)
        print(json.dumps({
            "devices": nd, "ba_iters_per_s": round(rate, 2),
            "scaling_efficiency": round(eff, 3),
            "obs": int(obs_kf.shape[0]), "kf": n_kf, "pts": n_pt}))


if __name__ == "__main__":
    main()
