"""Unit tests for the geometry core: SE3/Sim3 Lie ops, camera, Horn, DLT."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_slam_tpu.geometry import se3, sim3, camera, triangulation, horn
from object_slam_tpu.config import SlamConfig


def rand_pose(key, scale=1.0):
    k1, k2 = jax.random.split(key)
    xi = jnp.concatenate([jax.random.normal(k1, (3,)) * scale,
                          jax.random.normal(k2, (3,)) * 0.5])
    return se3.exp(xi)


class TestSE3:
    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(0)
        xi = jax.random.normal(key, (32, 6)) * 0.7
        T = se3.exp(xi)
        xi2 = se3.log(T)
        np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2),
                                   rtol=1e-4, atol=1e-4)

    def test_exp_small_angle(self):
        xi = jnp.array([1e-9, 2e-9, -1e-9, 1e-10, -2e-10, 1e-10])
        T = se3.exp(xi)
        np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-6)

    def test_inverse_compose(self):
        T = rand_pose(jax.random.PRNGKey(1))
        I = se3.compose(T, se3.inverse(T))
        np.testing.assert_allclose(np.asarray(I), np.eye(4), atol=1e-5)

    def test_rotation_orthonormal(self):
        T = rand_pose(jax.random.PRNGKey(2))
        R = np.asarray(T[:3, :3])
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert abs(np.linalg.det(R) - 1.0) < 1e-5

    def test_apply(self):
        T = rand_pose(jax.random.PRNGKey(3))
        p = jax.random.normal(jax.random.PRNGKey(4), (10, 3))
        q = se3.apply(T, p)
        q_ref = np.asarray(p) @ np.asarray(T[:3, :3]).T + np.asarray(T[:3, 3])
        np.testing.assert_allclose(np.asarray(q), q_ref, atol=1e-5)

    def test_quat_roundtrip(self):
        key = jax.random.PRNGKey(5)
        xi = jax.random.normal(key, (64, 6))
        T = se3.exp(xi)
        q, t = se3.to_quat_trans(T)
        T2 = se3.from_quat_trans(q, t)
        np.testing.assert_allclose(np.asarray(T), np.asarray(T2),
                                   rtol=1e-4, atol=1e-4)


class TestSim3:
    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(jax.random.PRNGKey(0), (16, 7)) * 0.4
        T, s = sim3.exp(xi)
        xi2 = sim3.log(T, s)
        np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2),
                                   rtol=1e-4, atol=1e-4)

    def test_compose_inverse(self):
        xi = jax.random.normal(jax.random.PRNGKey(1), (7,)) * 0.5
        T, s = sim3.exp(xi)
        Ti, si = sim3.inverse(T, s)
        Tc, sc = sim3.compose(T, s, Ti, si)
        np.testing.assert_allclose(np.asarray(Tc), np.eye(4), atol=1e-5)
        assert abs(float(sc) - 1.0) < 1e-5

    def test_apply_matches_manual(self):
        xi = jax.random.normal(jax.random.PRNGKey(2), (7,)) * 0.3
        T, s = sim3.exp(xi)
        p = jax.random.normal(jax.random.PRNGKey(3), (5, 3))
        q = sim3.apply(T, s, p)
        q_ref = float(s) * (np.asarray(p) @ np.asarray(T[:3, :3]).T) + np.asarray(T[:3, 3])
        np.testing.assert_allclose(np.asarray(q), q_ref, atol=1e-5)

    def test_error_zero_for_consistent(self):
        xi = jax.random.normal(jax.random.PRNGKey(4), (7,)) * 0.3
        Ta, sa = sim3.exp(xi)
        e = sim3.error(Ta, sa, Ta, sa)
        np.testing.assert_allclose(np.asarray(e), 0.0, atol=1e-5)


class TestCamera:
    def setup_method(self):
        self.K = camera.Intrinsics.from_config(SlamConfig().camera)

    def test_project_backproject(self):
        uv = jnp.array([[320.0, 240.0], [100.0, 50.0], [600.0, 400.0]])
        z = jnp.array([1.0, 2.5, 0.7])
        pc = camera.backproject(self.K, uv, z)
        uv2 = camera.project(self.K, pc)
        np.testing.assert_allclose(np.asarray(uv), np.asarray(uv2), atol=1e-4)

    def test_undistort_roundtrip(self):
        uv = jnp.array([[320.0, 240.0], [200.0, 150.0], [450.0, 350.0]])
        und = camera.undistort_points(self.K, uv, iters=20)
        # re-distort the normalized undistorted coords -> original pixels
        xn = jnp.stack([(und[:, 0] - self.K.cx) / self.K.fx,
                        (und[:, 1] - self.K.cy) / self.K.fy], -1)
        xd = camera.distort_normalized(self.K.dist, xn)
        uv2 = jnp.stack([xd[:, 0] * self.K.fx + self.K.cx,
                         xd[:, 1] * self.K.fy + self.K.cy], -1)
        np.testing.assert_allclose(np.asarray(uv), np.asarray(uv2), atol=0.1)

    def test_stereo_projection(self):
        pc = jnp.array([[0.5, 0.2, 2.0]])
        uvr = camera.project_stereo(self.K, pc)
        assert float(uvr[0, 2]) < float(uvr[0, 0])  # u_r = u - bf/z < u


class TestHorn:
    def test_exact_alignment_sim3(self):
        key = jax.random.PRNGKey(0)
        p = jax.random.normal(key, (50, 3))
        T_true = rand_pose(jax.random.PRNGKey(1))
        s_true = 1.7
        q = s_true * (p @ T_true[:3, :3].T) + T_true[:3, 3]
        T, s = horn.horn_align(p, q, fix_scale=False)
        q2 = float(s) * (p @ T[:3, :3].T) + T[:3, 3]
        np.testing.assert_allclose(np.asarray(q), np.asarray(q2), atol=1e-3)
        assert abs(float(s) - s_true) < 1e-3

    def test_fix_scale(self):
        p = jax.random.normal(jax.random.PRNGKey(2), (30, 3))
        T_true = rand_pose(jax.random.PRNGKey(3))
        q = se3.apply(T_true, p[None])[0]
        T, s = horn.horn_align(p, q, fix_scale=True)
        assert float(s) == 1.0
        np.testing.assert_allclose(np.asarray(se3.apply(T, p[None])[0]),
                                   np.asarray(q), atol=1e-3)

    def test_weighted_ignores_outliers(self):
        p = jax.random.normal(jax.random.PRNGKey(4), (40, 3))
        T_true = rand_pose(jax.random.PRNGKey(5))
        q = se3.apply(T_true, p[None])[0]
        q = q.at[0].set(jnp.array([100.0, -50.0, 30.0]))  # gross outlier
        w = jnp.ones(40).at[0].set(0.0)
        T, _ = horn.horn_align(p, q, weights=w, fix_scale=True)
        np.testing.assert_allclose(np.asarray(T), np.asarray(T_true), atol=1e-3)

    def test_batched(self):
        p = jax.random.normal(jax.random.PRNGKey(6), (8, 3, 3))
        xi = jax.random.normal(jax.random.PRNGKey(7), (8, 6)) * 0.5
        T_true = se3.exp(xi)
        q = jnp.einsum('bij,bnj->bni', T_true[:, :3, :3], p) + T_true[:, None, :3, 3]
        T, s = horn.horn_align(p, q, fix_scale=True)
        q2 = jnp.einsum('bij,bnj->bni', T[:, :3, :3], p) + T[:, None, :3, 3]
        np.testing.assert_allclose(np.asarray(q), np.asarray(q2), atol=1e-3)


class TestTriangulation:
    def test_two_view_recovers_points(self):
        K = camera.Intrinsics.from_config(SlamConfig().camera)
        key = jax.random.PRNGKey(0)
        pw = jax.random.uniform(key, (100, 3),
                                minval=jnp.array([-1.0, -1.0, 2.0]),
                                maxval=jnp.array([1.0, 1.0, 5.0]))
        T1 = se3.identity()
        T2 = se3.exp(jnp.array([0.3, 0.0, 0.0, 0.0, 0.05, 0.0]))  # baseline
        uv1 = camera.project(K, se3.apply(T1, pw[None])[0])
        uv2 = camera.project(K, se3.apply(T2, pw[None])[0])
        pw_est, ok = triangulation.triangulate_two_view(K, T1, T2, uv1, uv2)
        assert int(jnp.sum(ok)) > 90
        err = jnp.linalg.norm(pw_est - pw, axis=-1)
        assert float(jnp.median(jnp.where(ok, err, jnp.nan))) < 0.01 or \
            float(np.nanmedian(np.asarray(jnp.where(ok, err, jnp.nan)))) < 0.01
