"""Batched (data-parallel) tracking tests."""

import jax
import jax.numpy as jnp
import numpy as np

from object_slam_tpu.config import SlamConfig, CapacityConfig
from object_slam_tpu.geometry import se3, camera as cam_mod
from object_slam_tpu.parallel.batched_tracking import (BatchedTracker,
                                                       stack_pytrees)
from object_slam_tpu.semantic.object2d import empty_slab
from object_slam_tpu.slam.frame import FrameData
from object_slam_tpu.slam.map_state import init_map
import pytest


def make_sequence_state(cfg, K, seed):
    """A tiny map + a consistent current frame observing it from T_true."""
    key = jax.random.PRNGKey(seed)
    N = cfg.caps.n_kp
    m = init_map(cfg.caps, 16)
    pw = jax.random.uniform(key, (N, 3),
                            minval=jnp.array([-2.0, -2.0, 2.0]),
                            maxval=jnp.array([2.0, 2.0, 6.0]))
    desc = jax.random.bits(jax.random.fold_in(key, 1), (N, 8), jnp.uint32)
    m = m._replace(
        pt_xyz=m.pt_xyz.at[:N].set(pw),
        pt_desc=m.pt_desc.at[:N].set(desc),
        pt_valid=m.pt_valid.at[:N].set(True),
        kf_valid=m.kf_valid.at[0].set(True),
        kf_kp_valid=m.kf_kp_valid.at[0].set(True),
        kf_kp_pt=m.kf_kp_pt.at[0].set(jnp.arange(N)),
        n_kf=jnp.int32(1), n_pt=jnp.int32(N))

    T_true = se3.exp(jax.random.normal(jax.random.fold_in(key, 2), (6,))
                     * jnp.array([0.05, 0.05, 0.05, 0.01, 0.01, 0.01]))
    pc = se3.apply(T_true, pw[None])[0]
    uvr = cam_mod.project_stereo(K, pc)
    frame = FrameData(
        timestamp=jnp.float32(0.0), uv_raw=uvr[:, :2], uv=uvr[:, :2],
        ur=uvr[:, 2], depth=pc[:, 2],
        level=jnp.zeros(N, jnp.int32), angle=jnp.zeros(N),
        response=jnp.ones(N), desc=desc, valid=jnp.ones(N, bool),
        obj=empty_slab(2, 8, 8, N),
        obj3d=jnp.full((2,), -1, jnp.int32),
        kp_pt=jnp.full((N,), -1, jnp.int32),
        Tcw=jnp.eye(4), pose_ok=jnp.array(False))
    last_uv = uvr[:, :2]
    last_pt = jnp.arange(N, dtype=jnp.int32)
    return m, frame, last_uv, last_pt, T_true


@pytest.mark.slow
class TestBatchedTracking:
    def test_batch_of_sequences_tracks(self):
        cfg = SlamConfig(caps=CapacityConfig(n_kp=128, max_points=512,
                                             max_keyframes=8))
        K = cam_mod.Intrinsics.from_config(cfg.camera)
        sf = jnp.asarray([1.2 ** l for l in range(8)], jnp.float32)
        inv_s2 = 1.0 / (sf * sf)
        B = 4
        parts = [make_sequence_state(cfg, K, s) for s in range(B)]
        maps = stack_pytrees([p[0] for p in parts])
        frames = stack_pytrees([p[1] for p in parts])
        last_uv = jnp.stack([p[2] for p in parts])
        last_pt = jnp.stack([p[3] for p in parts])
        T_true = jnp.stack([p[4] for p in parts])
        N = cfg.caps.n_kp
        last_level = jnp.zeros((B, N), jnp.int32)
        last_valid = jnp.ones((B, N), bool)
        T_pred = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))

        bt = BatchedTracker(K, sf, inv_s2, float(np.log(1.2)))
        res, maps2 = bt.step(maps, frames, last_uv, last_pt, last_level,
                             last_valid, T_pred)
        assert res.Tcw.shape == (B, 4, 4)
        for b in range(B):
            err = se3.log(res.Tcw[b] @ jnp.linalg.inv(T_true[b]))
            assert float(jnp.linalg.norm(err)) < 0.02, b
            assert int(res.n_inliers[b]) > 25
