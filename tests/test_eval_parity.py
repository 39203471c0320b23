"""Golden tests: our evaluators vs the reference's TUM benchmark tools.

The reference evaluates every experiment with the TUM scripts
(`ExpResults/TUM/Localization/evaluate_ate.py` Horn SVD alignment + RMSE;
`evaluate_rpe.py` relative-pose deltas; driven from `run_exp_tum.py:21-27`).
These tests re-derive that exact math here, independently and literally
(loop-accumulated correlation matrix, quaternion transform44, ominus error
composition), and require `eval/ate.py` to agree to 1e-9 on randomized
trajectories — so synthetic and future real-data numbers are comparable
with the reference's protocol by construction (VERDICT r4 item 7).
"""

import numpy as np
import pytest

from object_slam_tpu.eval.ate import (
    align_horn_svd,
    associate_timestamps,
    ate_rmse,
    rpe,
)


def _golden_align(model, data):
    """Literal re-derivation of evaluate_ate.py:47-79 (Horn closed form).

    model, data: [3, N]. Column-loop outer-product accumulation, SVD of
    W^T, det-based reflection fix — exactly the reference's order of
    operations, kept deliberately naive.
    """
    model = np.asarray(model, np.float64)
    data = np.asarray(data, np.float64)
    model_zc = model - model.mean(1, keepdims=True)
    data_zc = data - data.mean(1, keepdims=True)
    W = np.zeros((3, 3))
    for col in range(model.shape[1]):
        W += np.outer(model_zc[:, col], data_zc[:, col])
    U, _, Vh = np.linalg.svd(W.T)
    S = np.identity(3)
    if np.linalg.det(U) * np.linalg.det(Vh) < 0:
        S[2, 2] = -1
    rot = U @ S @ Vh
    trans = data.mean(1, keepdims=True) - rot @ model.mean(1, keepdims=True)
    aligned = rot @ model + trans
    err = np.sqrt(np.sum((aligned - data) ** 2, axis=0))
    return rot, trans, err


def _golden_transform44(t, q):
    """evaluate_rpe.py:46-75 quaternion (x,y,z,w) -> 4x4, same algebra."""
    q = np.array(q, np.float64, copy=True)
    nq = float(q @ q)
    if nq < np.finfo(float).eps * 4.0:
        m = np.eye(4)
        m[:3, 3] = t
        return m
    q *= np.sqrt(2.0 / nq)
    q = np.outer(q, q)
    return np.array([
        [1.0 - q[1, 1] - q[2, 2], q[0, 1] - q[2, 3], q[0, 2] + q[1, 3], t[0]],
        [q[0, 1] + q[2, 3], 1.0 - q[0, 0] - q[2, 2], q[1, 2] - q[0, 3], t[1]],
        [q[0, 2] - q[1, 3], q[1, 2] + q[0, 3], 1.0 - q[0, 0] - q[1, 1], t[2]],
        [0.0, 0.0, 0.0, 1.0],
    ])


def _golden_rpe_pairs(traj_gt, traj_est, delta):
    """evaluate_rpe.py fixed-delta frame mode: for each start index i the
    error transform is ominus(ominus(est_i, est_{i+d}), ominus(gt_i, gt_{i+d}))
    with ominus(a, b) = inv(a) @ b; report trans norm + rotation angle."""
    terr, rerr = [], []
    for i in range(len(traj_est) - delta):
        de = np.linalg.inv(traj_est[i]) @ traj_est[i + delta]
        dg = np.linalg.inv(traj_gt[i]) @ traj_gt[i + delta]
        e = np.linalg.inv(de) @ dg
        terr.append(np.linalg.norm(e[:3, 3]))
        ang = np.arccos(min(1, max(-1, (np.trace(e[:3, :3]) - 1) / 2)))
        rerr.append(np.degrees(ang))
    return np.array(terr), np.array(rerr)


def _random_traj(rng, n, step=0.05, rot_step=0.1):
    """Smooth random SE(3) trajectory as [N,4,4] + quaternions."""
    poses = [np.eye(4)]
    for _ in range(n - 1):
        ax = rng.standard_normal(3)
        ax /= np.linalg.norm(ax)
        th = rng.uniform(0, rot_step)
        K = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]])
        dR = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K
        d = np.eye(4)
        d[:3, :3] = dR
        d[:3, 3] = rng.standard_normal(3) * step
        poses.append(poses[-1] @ d)
    return np.stack(poses)


class TestATEGolden:
    def test_align_matches_reference_math(self):
        rng = np.random.default_rng(0)
        for trial in range(5):
            n = int(rng.integers(4, 120))
            model = rng.standard_normal((3, n)) * 2.0
            # data = R model + t + noise (guarantees a nontrivial optimum)
            R_true, _ = np.linalg.qr(rng.standard_normal((3, 3)))
            if np.linalg.det(R_true) < 0:
                R_true[:, 0] *= -1
            data = R_true @ model + rng.standard_normal((3, 1)) + \
                rng.standard_normal((3, n)) * 0.01
            Rg, tg, eg = _golden_align(model, data)
            Ro, to, eo = align_horn_svd(model, data)
            np.testing.assert_allclose(Ro, Rg, atol=1e-9)
            np.testing.assert_allclose(to, tg, atol=1e-9)
            np.testing.assert_allclose(eo, eg, atol=1e-9)

    def test_align_reflection_branch(self):
        # Degenerate planar cloud mirrored: det(U)*det(Vh) < 0 must engage
        # the S[2,2] = -1 fix identically in both implementations.
        rng = np.random.default_rng(1)
        model = rng.standard_normal((3, 40))
        model[2] *= 1e-6
        data = model.copy()
        data[0] *= -1  # reflection
        Rg, tg, eg = _golden_align(model, data)
        Ro, to, eo = align_horn_svd(model, data)
        np.testing.assert_allclose(Ro, Rg, atol=1e-9)
        np.testing.assert_allclose(eo, eg, atol=1e-9)
        assert abs(np.linalg.det(Ro) - 1.0) < 1e-9  # proper rotation, no mirror

    def test_ate_rmse_matches_reference_formula(self):
        rng = np.random.default_rng(2)
        gt = rng.standard_normal((60, 3))
        est = gt + rng.standard_normal((60, 3)) * 0.03
        _, _, eg = _golden_align(est.T, gt.T)
        # evaluate_ate.py:183: sqrt(dot(err, err) / len(err))
        golden = np.sqrt(np.dot(eg, eg) / len(eg))
        assert ate_rmse(est, gt) == pytest.approx(golden, abs=1e-12)


class TestRPEGolden:
    def test_rpe_matches_reference_error_transform(self):
        """Ours composes inv(dg) @ de; the reference inv(de) @ dg. The error
        magnitudes are identical (|R^T v| = |v|, angle(A) = angle(A^-1)) —
        assert that numerically rather than by argument."""
        rng = np.random.default_rng(3)
        gt = _random_traj(rng, 50)
        est = _random_traj(rng, 50)
        for delta in (1, 5):
            tg, rg = _golden_rpe_pairs(gt, est, delta)
            ours = rpe(est, gt, delta=delta)
            assert ours["trans_rmse"] == pytest.approx(
                np.sqrt(np.mean(tg ** 2)), abs=1e-9)
            assert ours["rot_rmse_deg"] == pytest.approx(
                np.sqrt(np.mean(rg ** 2)), abs=1e-9)
            assert ours["trans_median"] == pytest.approx(
                np.median(tg), abs=1e-9)

    def test_transform44_roundtrip(self):
        """Quaternion-file ingestion parity: trajectories written as
        (t, q_xyzw) rows and rebuilt via the reference's transform44 must
        reproduce the matrices our pipeline emits."""
        rng = np.random.default_rng(4)
        traj = _random_traj(rng, 20)
        for T in traj:
            R = T[:3, :3]
            # matrix -> quaternion (Shepperd), then reference transform44 back
            tr = np.trace(R)
            if tr > 0:
                s = np.sqrt(tr + 1.0) * 2
                q = np.array([(R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s,
                              (R[1, 0] - R[0, 1]) / s, 0.25 * s])
            else:
                i = int(np.argmax(np.diag(R)))
                j, k = (i + 1) % 3, (i + 2) % 3
                s = np.sqrt(R[i, i] - R[j, j] - R[k, k] + 1.0) * 2
                q = np.zeros(4)
                q[i] = 0.25 * s
                q[j] = (R[j, i] + R[i, j]) / s
                q[k] = (R[k, i] + R[i, k]) / s
                q[3] = (R[k, j] - R[j, k]) / s
            T2 = _golden_transform44(T[:3, 3], q)
            np.testing.assert_allclose(T2, T, atol=1e-9)


class TestAssociationGolden:
    def test_associate_nearest_within_window(self):
        """associate.py semantics: match stamps within max_difference,
        nearest-first, each target used once."""
        ts_a = [0.0, 1.0, 2.0, 3.0]
        ts_b = [0.015, 1.5, 2.001, 2.9, 3.25]
        pairs = associate_timestamps(ts_a, ts_b, max_dt=0.02)
        assert (0, 0) in pairs and (2, 2) in pairs
        assert all(abs(ts_a[i] - ts_b[j]) <= 0.02 for i, j in pairs)
        # 1.5 is 0.5 away from both 1.0 and 2.0 -> matched to neither
        assert not any(j == 1 for _, j in pairs)
