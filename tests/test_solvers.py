"""Tests for pose optimization, BA, pose graph, RANSAC, PnP, Sim3."""

import jax
import jax.numpy as jnp
import numpy as np

from object_slam_tpu.config import SlamConfig
from object_slam_tpu.geometry import se3, camera
from object_slam_tpu.solvers import ransac, epnp, sim3_solver
from object_slam_tpu.solvers.pose_opt import PoseObs, pose_optimize
from object_slam_tpu.solvers.ba import BAProblem, local_ba, global_ba
from object_slam_tpu.solvers.pose_graph import PoseGraphProblem, optimize_pose_graph

CFG = SlamConfig()
K = camera.Intrinsics.from_config(CFG.camera)


def synth_points(key, n, zmin=1.5, zmax=6.0, spread=2.0):
    return jax.random.uniform(
        key, (n, 3),
        minval=jnp.array([-spread, -spread, zmin]),
        maxval=jnp.array([spread, spread, zmax]))


def make_pose(xi):
    return se3.exp(jnp.asarray(xi, jnp.float32))


class TestPoseOptimize:
    def _make_obs(self, key, T_true, n=200, noise=0.5, stereo_frac=0.7,
                  outlier_frac=0.0):
        kp, kn, ko, ks = jax.random.split(key, 4)
        pw = synth_points(kp, n)
        pc = se3.apply(T_true, pw[None])[0]
        uvr = camera.project_stereo(K, pc)
        uv = uvr[:, :2] + noise * jax.random.normal(kn, (n, 2))
        ur = uvr[:, 2] + noise * jax.random.normal(kn, (n,))
        stereo_mask = jax.random.uniform(ks, (n,)) < stereo_frac
        ur = jnp.where(stereo_mask, ur, -1.0)
        if outlier_frac > 0:
            out = jax.random.uniform(ko, (n,)) < outlier_frac
            uv = jnp.where(out[:, None], uv + 40.0, uv)
        return PoseObs(uv=uv, ur=ur, pw=pw,
                       inv_sigma2=jnp.ones(n), valid=jnp.ones(n, bool))

    def test_converges_from_perturbed(self):
        T_true = make_pose([0.1, -0.2, 0.3, 0.05, -0.03, 0.1])
        obs = self._make_obs(jax.random.PRNGKey(0), T_true, noise=0.0)
        T0 = se3.retract(T_true, jnp.array([0.05, -0.04, 0.06, 0.02, 0.01, -0.02]))
        T, inl, n = pose_optimize(K, T0, obs)
        err = se3.log(se3.compose(T, se3.inverse(T_true)))
        assert float(jnp.linalg.norm(err)) < 1e-3
        assert int(n) > 190

    def test_robust_to_outliers(self):
        T_true = make_pose([0.0, 0.1, -0.1, 0.03, 0.02, -0.05])
        obs = self._make_obs(jax.random.PRNGKey(1), T_true, noise=0.3,
                             outlier_frac=0.25)
        T0 = se3.retract(T_true, jnp.array([0.03, 0.02, -0.05, 0.01, -0.01, 0.02]))
        T, inl, n = pose_optimize(K, T0, obs)
        err = se3.log(se3.compose(T, se3.inverse(T_true)))
        assert float(jnp.linalg.norm(err)) < 0.02
        # the gross outliers must be gated out
        assert int(n) < 200

    def test_jit_compiles(self):
        T_true = make_pose([0.0, 0.0, 0.0, 0.0, 0.0, 0.0])
        obs = self._make_obs(jax.random.PRNGKey(2), T_true, noise=0.1)
        f = jax.jit(lambda T0, o: pose_optimize(K, T0, o))
        T, _, _ = f(se3.identity(), obs)
        assert T.shape == (4, 4)


def build_ba_problem(key, n_kf=6, n_pt=300, noise=0.3, perturb=0.02):
    """Synthetic trajectory looking at a point cloud; noisy obs; perturbed
    initial poses/points. Returns (problem, true poses, true points)."""
    kp, ko = jax.random.split(key)
    pts = synth_points(kp, n_pt, zmin=3.0, zmax=8.0)
    poses_true = []
    for i in range(n_kf):
        xi = jnp.array([0.15 * i, 0.02 * i, 0.0, 0.0, 0.03 * i, 0.0])
        poses_true.append(se3.exp(xi))
    poses_true = jnp.stack(poses_true)

    obs_kf, obs_pt = jnp.meshgrid(jnp.arange(n_kf), jnp.arange(n_pt),
                                  indexing='ij')
    obs_kf = obs_kf.reshape(-1)
    obs_pt = obs_pt.reshape(-1)
    pc = jnp.einsum('kij,pj->kpi', poses_true[:, :3, :3], pts) \
        + poses_true[:, None, :3, 3]
    uvr = camera.project_stereo(K, pc.reshape(-1, 3))
    keynoise = jax.random.normal(ko, uvr.shape) * noise
    uv = uvr[:, :2] + keynoise[:, :2]
    ur = uvr[:, 2] + keynoise[:, 2]
    vis = (camera.in_image(K, uv) & (pc.reshape(-1, 3)[:, 2] > 0.1))

    kpert = jax.random.split(key, n_kf)
    poses0 = jnp.stack([
        se3.retract(poses_true[i],
                    jax.random.normal(kpert[i], (6,)) * perturb)
        for i in range(n_kf)])
    poses0 = poses0.at[0].set(poses_true[0])
    pts0 = pts + jax.random.normal(kp, pts.shape) * perturb * 2

    prob = BAProblem(
        kf_pose=poses0,
        kf_fixed=jnp.zeros(n_kf, bool).at[0].set(True),
        kf_valid=jnp.ones(n_kf, bool),
        pt_xyz=pts0,
        pt_valid=jnp.ones(n_pt, bool),
        obs_kf=obs_kf, obs_pt=obs_pt,
        obs_uv=uv, obs_ur=ur,
        obs_inv_sigma2=jnp.ones(uv.shape[0]),
        obs_valid=vis)
    return prob, poses_true, pts


class TestBA:
    def test_local_ba_reduces_error(self):
        prob, poses_true, pts_true = build_ba_problem(jax.random.PRNGKey(0))
        kf_pose, pt_xyz, keep = local_ba(K, prob)

        def pose_err(poses):
            e = jax.vmap(lambda a, b: se3.log(a @ jnp.linalg.inv(b)))(
                poses, poses_true)
            return float(jnp.mean(jnp.linalg.norm(e, axis=-1)))

        assert pose_err(kf_pose) < pose_err(prob.kf_pose) * 0.5
        assert pose_err(kf_pose) < 5e-3
        assert int(jnp.sum(keep)) > 0.8 * int(jnp.sum(prob.obs_valid))

    def test_global_ba_noise_free_exact(self):
        prob, poses_true, pts_true = build_ba_problem(
            jax.random.PRNGKey(1), noise=0.0, perturb=0.01)
        kf_pose, pt_xyz = global_ba(K, prob, iters=10)
        e = jax.vmap(lambda a, b: se3.log(a @ jnp.linalg.inv(b)))(
            kf_pose, poses_true)
        assert float(jnp.max(jnp.linalg.norm(e, axis=-1))) < 1e-3
        perr = jnp.linalg.norm(pt_xyz - pts_true, axis=-1)
        assert float(jnp.median(perr)) < 5e-3

    def test_fixed_kf_stays(self):
        prob, poses_true, _ = build_ba_problem(jax.random.PRNGKey(2))
        kf_pose, _, _ = local_ba(K, prob)
        np.testing.assert_allclose(np.asarray(kf_pose[0]),
                                   np.asarray(prob.kf_pose[0]), atol=1e-7)


class TestPoseGraph:
    def test_loop_correction(self):
        """Chain of keyframes with odometry drift; a loop edge to the start
        pulls the chain back (the essential-graph scenario)."""
        n = 12
        T_true = [se3.identity()]
        for i in range(1, n):
            T_true.append(se3.exp(jnp.array([0.5, 0, 0, 0, 0.5, 0])) @ T_true[-1])
        T_true = jnp.stack(T_true)
        s_true = jnp.ones(n)

        # noisy odometry chain: integrate perturbed relative transforms
        key = jax.random.PRNGKey(0)
        T_est = [T_true[0]]
        for i in range(1, n):
            rel = T_true[i] @ jnp.linalg.inv(T_true[i - 1])
            drift = se3.exp(jax.random.normal(jax.random.fold_in(key, i), (6,)) * 0.03)
            T_est.append(drift @ rel @ T_est[-1])
        T_est = jnp.stack(T_est)

        # edges: consecutive odometry (measured = TRUE relatives) + loop edge
        ei = jnp.array(list(range(n - 1)) + [0])
        ej = jnp.array(list(range(1, n)) + [n - 1])
        rel_T = jnp.stack([T_true[j] @ jnp.linalg.inv(T_true[i])
                           for i, j in zip(list(ei), list(ej))])
        rel_s = jnp.ones(n)

        prob = PoseGraphProblem(
            T=T_est, s=jnp.ones(n),
            fixed=jnp.zeros(n, bool).at[0].set(True),
            ei=ei, ej=ej, rel_T=rel_T, rel_s=rel_s,
            valid=jnp.ones(n, bool), weight=jnp.ones(n))
        T_opt, s_opt = optimize_pose_graph(prob, n_iters=15)

        def err(T):
            e = jax.vmap(lambda a, b: se3.log(a @ jnp.linalg.inv(b)))(T, T_true)
            return float(jnp.mean(jnp.linalg.norm(e, axis=-1)))

        assert err(T_opt) < err(T_est) * 0.2
        assert err(T_opt) < 1e-2
        np.testing.assert_allclose(np.asarray(s_opt), 1.0, atol=1e-3)


class TestRansac:
    def test_fundamental_inliers(self):
        key = jax.random.PRNGKey(0)
        pw = synth_points(key, 150)
        T1 = se3.identity()
        T2 = se3.exp(jnp.array([0.4, 0.1, 0.0, 0.0, 0.1, 0.02]))
        uv1 = camera.project(K, se3.apply(T1, pw[None])[0])
        uv2 = camera.project(K, se3.apply(T2, pw[None])[0])
        # corrupt 30% of matches
        out = jax.random.uniform(jax.random.PRNGKey(1), (150,)) < 0.3
        uv2c = jnp.where(out[:, None],
                         jax.random.uniform(jax.random.PRNGKey(2), (150, 2),
                                            minval=0.0, maxval=400.0),
                         uv2)
        F, inl, n = ransac.ransac_fundamental(
            jax.random.PRNGKey(3), uv1, uv2c, jnp.ones(150, bool))
        # inliers should be mostly the uncorrupted ones
        good = np.asarray(inl & ~out).sum()
        bad = np.asarray(inl & out).sum()
        assert good > 80
        assert bad < 10

    def test_pnp_ransac(self):
        key = jax.random.PRNGKey(0)
        pw = synth_points(key, 120)
        T_true = se3.exp(jnp.array([0.3, -0.1, 0.2, 0.1, -0.2, 0.15]))
        uv = camera.project(K, se3.apply(T_true, pw[None])[0])
        out = jax.random.uniform(jax.random.PRNGKey(1), (120,)) < 0.3
        uvc = jnp.where(out[:, None], uv + 60.0, uv)
        res = epnp.pnp_ransac(jax.random.PRNGKey(2), K, pw, uvc,
                              jnp.ones(120, bool))
        assert bool(res.ok)
        err = se3.log(res.Tcw @ jnp.linalg.inv(T_true))
        assert float(jnp.linalg.norm(err)) < 0.01

    def test_sim3_ransac(self):
        key = jax.random.PRNGKey(0)
        pc2 = synth_points(key, 80, zmin=2.0, zmax=6.0)
        T12 = se3.exp(jnp.array([0.2, 0.1, -0.1, 0.05, 0.1, -0.05]))
        pc1 = se3.apply(T12, pc2[None])[0]
        out = jax.random.uniform(jax.random.PRNGKey(1), (80,)) < 0.25
        pc1c = jnp.where(out[:, None], pc1 + 3.0, pc1)
        res = sim3_solver.sim3_ransac(jax.random.PRNGKey(2), K, pc1c, pc2,
                                      jnp.ones(80, bool), fix_scale=True)
        assert bool(res.ok)
        err = se3.log(res.T12 @ jnp.linalg.inv(T12))
        assert float(jnp.linalg.norm(err)) < 0.01
