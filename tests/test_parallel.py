"""Multi-chip (virtual 8-device CPU mesh) sharded-BA tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_slam_tpu.config import SlamConfig
from object_slam_tpu.geometry import camera, se3
from object_slam_tpu.parallel.sharded_ba import (make_sharded_ba, pad_obs_to,
                                                 run_sharded_global_ba)
from object_slam_tpu.solvers.ba import ba_iterate
from tests.test_solvers import build_ba_problem

CFG = SlamConfig()
K = camera.Intrinsics.from_config(CFG.camera)


@pytest.mark.slow
class TestShardedBA:
    def test_matches_single_device(self):
        """Sharding is a layout change: results must match the single-chip
        solver to float tolerance."""
        prob, poses_true, pts_true = build_ba_problem(
            jax.random.PRNGKey(0), n_kf=5, n_pt=200, noise=0.2)
        ref_pose, ref_pts = ba_iterate(K, prob, 5)

        kf_pose, pt_xyz = run_sharded_global_ba(K, prob, n_iters=5)
        np.testing.assert_allclose(np.asarray(kf_pose), np.asarray(ref_pose),
                                   atol=2e-3)
        err = np.linalg.norm(np.asarray(pt_xyz) - np.asarray(ref_pts), axis=-1)
        assert np.median(err) < 2e-3

    def test_converges_on_mesh(self):
        prob, poses_true, _ = build_ba_problem(
            jax.random.PRNGKey(1), n_kf=6, n_pt=300, noise=0.0, perturb=0.02)
        kf_pose, pt_xyz = run_sharded_global_ba(K, prob, n_iters=8)
        e = jax.vmap(lambda a, b: se3.log(a @ jnp.linalg.inv(b)))(
            kf_pose, poses_true)
        assert float(jnp.max(jnp.linalg.norm(e, axis=-1))) < 2e-3

    def test_uses_all_devices(self):
        assert len(jax.devices()) == 8, "conftest should force 8 CPU devices"
