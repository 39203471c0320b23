"""Tests for Sim3 GN refinement, point replacement forwarding, and
distinctive-descriptor re-election."""

import jax
import jax.numpy as jnp
import numpy as np

from object_slam_tpu.config import SlamConfig, CapacityConfig
from object_slam_tpu.geometry import se3, camera as cam_mod
from object_slam_tpu.geometry.camera import Intrinsics
from object_slam_tpu.solvers.sim3_solver import sim3_gn_refine
from object_slam_tpu.slam.map_state import init_map, recompute_point_stats
from object_slam_tpu.slam.map_ops import apply_replacements


def make_intrinsics():
    cfg = SlamConfig()
    return Intrinsics.from_config(cfg.camera)


class TestSim3GN:
    def _problem(self, seed=0, scale=1.3, n=80, outliers=0):
        key = jax.random.PRNGKey(seed)
        pc2 = jax.random.uniform(key, (n, 3),
                                 minval=jnp.array([-1.5, -1.0, 2.0]),
                                 maxval=jnp.array([1.5, 1.0, 6.0]))
        xi = jnp.array([0.1, -0.05, 0.02, 0.03, -0.02, 0.04])
        T_true = se3.exp(xi)
        s_true = jnp.float32(scale)
        pc1 = s_true * (pc2 @ T_true[:3, :3].T) + T_true[:3, 3]
        if outliers:
            k2 = jax.random.PRNGKey(seed + 1)
            bad = jax.random.uniform(k2, (outliers, 3),
                                     minval=jnp.array([-1.5, -1.0, 2.0]),
                                     maxval=jnp.array([1.5, 1.0, 6.0]))
            pc2 = pc2.at[:outliers].set(bad)
        return pc1, pc2, T_true, s_true

    def test_recovers_scale_and_pose(self):
        K = make_intrinsics()
        pc1, pc2, T_true, s_true = self._problem(scale=1.3)
        # perturbed init
        T0 = se3.exp(jnp.array([0.02, 0.01, -0.01, 0.02, 0.0, -0.01])) @ T_true
        T, s, inl, n = sim3_gn_refine(K, pc1, pc2, jnp.ones(80, bool),
                                      T0, 1.1, fix_scale=False)
        assert abs(float(s) - 1.3) < 1e-3
        err = se3.log(T @ jnp.linalg.inv(T_true))
        assert float(jnp.linalg.norm(err)) < 1e-3
        assert int(n) == 80

    def test_fix_scale_keeps_unit(self):
        K = make_intrinsics()
        pc1, pc2, T_true, s_true = self._problem(scale=1.0)
        T0 = se3.exp(jnp.array([0.02, 0.0, 0.0, 0.01, 0.0, 0.0])) @ T_true
        T, s, inl, n = sim3_gn_refine(K, pc1, pc2, jnp.ones(80, bool),
                                      T0, 1.0, fix_scale=True)
        assert abs(float(s) - 1.0) < 1e-6
        err = se3.log(T @ jnp.linalg.inv(T_true))
        assert float(jnp.linalg.norm(err)) < 1e-3

    def test_prunes_outliers(self):
        K = make_intrinsics()
        pc1, pc2, T_true, s_true = self._problem(scale=1.0, outliers=16)
        T, s, inl, n = sim3_gn_refine(K, pc1, pc2, jnp.ones(80, bool),
                                      T_true, 1.0, fix_scale=True)
        inl = np.asarray(inl)
        assert not inl[:16].any()      # corrupted pairs pruned
        assert inl[16:].all()
        err = se3.log(T @ jnp.linalg.inv(T_true))
        assert float(jnp.linalg.norm(err)) < 1e-3


class TestReplacement:
    def test_forwarding_and_counters(self):
        cfg = SlamConfig(caps=CapacityConfig(n_kp=8, max_points=16,
                                             max_keyframes=4))
        m = init_map(cfg.caps, cfg.objects.history_capacity)
        m = m._replace(
            pt_valid=m.pt_valid.at[:3].set(True),
            pt_visible=m.pt_visible.at[:3].set(jnp.array([5, 7, 2])),
            pt_found=m.pt_found.at[:3].set(jnp.array([4, 6, 1])),
            pt_n_obs=m.pt_n_obs.at[:3].set(jnp.array([2, 3, 1])),
            kf_valid=m.kf_valid.at[:2].set(True),
            kf_kp_valid=m.kf_kp_valid.at[:2].set(True),
            kf_kp_pt=m.kf_kp_pt.at[0, 0].set(1).at[0, 1].set(0)
            .at[1, 0].set(1).at[1, 2].set(2))
        # replace point 1 -> point 0
        P = 16
        fwd = jnp.arange(P, dtype=jnp.int32).at[1].set(0)
        replaced = jnp.zeros((P,), bool).at[1].set(True)
        m2 = apply_replacements(m, fwd, replaced)
        kp = np.asarray(m2.kf_kp_pt)
        assert kp[0, 0] == 0 and kp[0, 1] == 0
        assert kp[1, 0] == 0 and kp[1, 2] == 2
        assert not bool(m2.pt_valid[1])
        assert int(m2.pt_visible[0]) == 12     # 5 + 7
        assert int(m2.pt_found[0]) == 10       # 4 + 6
        assert int(m2.pt_visible[2]) == 2      # untouched


class TestDescriptorElection:
    def test_majority_descriptor_wins(self):
        cfg = SlamConfig(caps=CapacityConfig(n_kp=8, max_points=8,
                                             max_keyframes=4))
        m = init_map(cfg.caps, cfg.objects.history_capacity)
        # point 0 observed by 3 KFs; two observations share descriptor A,
        # one is an outlier B — election must pick A
        A_desc = jnp.full((8,), 0xAAAAAAAA, jnp.uint32)
        B_desc = jnp.full((8,), 0x0F0F0F0F, jnp.uint32)
        m = m._replace(
            pt_valid=m.pt_valid.at[0].set(True),
            pt_xyz=m.pt_xyz.at[0].set(jnp.array([0.0, 0.0, 3.0])),
            pt_desc=m.pt_desc.at[0].set(B_desc),
            kf_valid=m.kf_valid.at[:3].set(True),
            kf_kp_valid=m.kf_kp_valid.at[:3].set(True),
            kf_kp_pt=m.kf_kp_pt.at[0, 0].set(0).at[1, 0].set(0)
            .at[2, 0].set(0),
            kf_kp_desc=m.kf_kp_desc.at[0, 0].set(A_desc)
            .at[1, 0].set(A_desc).at[2, 0].set(B_desc))
        m2 = recompute_point_stats(m)
        np.testing.assert_array_equal(np.asarray(m2.pt_desc[0]),
                                      np.asarray(A_desc))
        assert int(m2.pt_n_obs[0]) == 3

    def test_normals_point_from_cameras(self):
        cfg = SlamConfig(caps=CapacityConfig(n_kp=8, max_points=8,
                                             max_keyframes=4))
        m = init_map(cfg.caps, cfg.objects.history_capacity)
        m = m._replace(
            pt_valid=m.pt_valid.at[0].set(True),
            pt_xyz=m.pt_xyz.at[0].set(jnp.array([0.0, 0.0, 3.0])),
            kf_valid=m.kf_valid.at[:1].set(True),
            kf_kp_valid=m.kf_kp_valid.at[:1].set(True),
            kf_kp_pt=m.kf_kp_pt.at[0, 0].set(0))
        m2 = recompute_point_stats(m)
        n = np.asarray(m2.pt_normal[0])
        np.testing.assert_allclose(n, [0.0, 0.0, 1.0], atol=1e-6)
