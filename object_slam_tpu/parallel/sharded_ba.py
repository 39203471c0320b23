"""Multi-chip bundle adjustment: observation-sharded Schur BA over a mesh.

The reference has no distributed computing (SURVEY.md §2.3); this is the
first-class TPU-native scaling layer called for by BASELINE.md: keyframe
trajectory + landmark observation slabs partitioned over devices, the
reduced-camera-system reductions riding ICI collectives.

Design: the observation slab is the data axis — each device holds O/D
observations; pose [K] and point [P] slabs are replicated. Every segment
sum inside solvers/ba.ba_iterate becomes a partial sum + psum (the
`comm_axis` hook), which is exactly the BA analogue of data-parallel
gradient all-reduce. Dense per-point 3x3 inversions and the CG pose solve
are replicated (tiny next to the obs sweeps). This keeps the math
bit-identical to single-chip BA — sharding changes layout, not results.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map

from object_slam_tpu.solvers.ba import BAProblem, ba_iterate


def pad_obs_to(prob: BAProblem, multiple: int) -> BAProblem:
    O = prob.obs_kf.shape[0]
    pad = (-O) % multiple
    if pad == 0:
        return prob

    def padz(a, fill=0):
        return jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], 0)

    return prob._replace(
        obs_kf=padz(prob.obs_kf), obs_pt=padz(prob.obs_pt),
        obs_uv=padz(prob.obs_uv), obs_ur=padz(prob.obs_ur, -1.0),
        obs_inv_sigma2=padz(prob.obs_inv_sigma2),
        obs_valid=padz(prob.obs_valid, False))


def make_sharded_ba(K, mesh: Mesh, axis: str = 'ba',
                    n_iters: int = 10, cg_iters: int = 24):
    """Returns a jitted fn(prob) -> (kf_pose, pt_xyz) with observations
    sharded over `axis` and state replicated."""
    obs_spec = P(axis)
    rep = P()

    in_specs = BAProblem(
        kf_pose=rep, kf_fixed=rep, kf_valid=rep,
        pt_xyz=rep, pt_valid=rep,
        obs_kf=obs_spec, obs_pt=obs_spec, obs_uv=obs_spec,
        obs_ur=obs_spec, obs_inv_sigma2=obs_spec, obs_valid=obs_spec)

    def step(prob: BAProblem):
        return ba_iterate(K, prob, n_iters, cg_iters=cg_iters,
                          comm_axis=axis)

    fn = shard_map(step, mesh=mesh, in_specs=(in_specs,),
                   out_specs=(rep, rep), check_vma=False)
    return jax.jit(fn)


def run_sharded_global_ba(K, prob: BAProblem, devices=None,
                          n_iters: int = 10):
    """Convenience: build a 1-D mesh over the given devices and run."""
    devices = devices if devices is not None else jax.devices()
    mesh = Mesh(np.asarray(devices).reshape(-1), ('ba',))
    prob = pad_obs_to(prob, len(devices))
    fn = make_sharded_ba(K, mesh, n_iters=n_iters)
    return fn(prob)
