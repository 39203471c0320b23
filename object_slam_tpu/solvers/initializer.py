"""Monocular map initialization: two-view relative pose + triangulation.

Parity with `Initializer` (`Initializer.cc`): the reference RANSACs a
homography and a fundamental matrix in two threads (`:44-122`), picks a
model by score ratio (`:108-121`), and recovers R, t + triangulated points
with cheirality/parallax checks (`:470-733`).

TPU redesign: both models score as batched hypothesize-and-verify
(solvers/ransac.py); the winning model's motion candidates (4 from the
essential-matrix decomposition, 8 from the Faugeras homography
decomposition) are ALL triangulated densely and a cheirality vote picks
the winner — no sequential candidate loop. Pure-rotation cases fail the
parallax gate inside the vote and are rejected, as in the reference.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from object_slam_tpu.geometry import se3
from object_slam_tpu.geometry.camera import Intrinsics
from object_slam_tpu.geometry.triangulation import triangulate_two_view
from object_slam_tpu.solvers import ransac


def homography_4pt(p1, p2):
    """Batched 4-point DLT homography: [..., 4, 2] x2 -> [..., 3, 3]."""
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    zero = jnp.zeros_like(x1)
    one = jnp.ones_like(x1)
    rA = jnp.stack([x1, y1, one, zero, zero, zero,
                    -x2 * x1, -x2 * y1, -x2], -1)
    rB = jnp.stack([zero, zero, zero, x1, y1, one,
                    -y2 * x1, -y2 * y1, -y2], -1)
    A = jnp.concatenate([rA, rB], axis=-2)       # [..., 8, 9]
    AtA = jnp.swapaxes(A, -1, -2) @ A
    _, v = jnp.linalg.eigh(AtA)
    h = v[..., :, 0]
    H = h.reshape(h.shape[:-1] + (3, 3))
    return H / jnp.where(jnp.abs(H[..., 2:3, 2:3]) < 1e-9, 1.0,
                         H[..., 2:3, 2:3])


def homography_transfer_chi2(H, p1, p2):
    """Symmetric transfer error [T, N] (Initializer::CheckHomography)."""
    ones = jnp.ones(p1.shape[:-1] + (1,), p1.dtype)
    h1 = jnp.concatenate([p1, ones], -1)
    h2 = jnp.concatenate([p2, ones], -1)
    Hp1 = jnp.einsum('tij,nj->tni', H, h1)
    p1in2 = Hp1[..., :2] / jnp.maximum(jnp.abs(Hp1[..., 2:]), 1e-9) * \
        jnp.sign(Hp1[..., 2:])
    Hinv = jnp.linalg.inv(H)
    Hp2 = jnp.einsum('tij,nj->tni', Hinv, h2)
    p2in1 = Hp2[..., :2] / jnp.maximum(jnp.abs(Hp2[..., 2:]), 1e-9) * \
        jnp.sign(Hp2[..., 2:])
    d12 = jnp.sum((p1in2 - p2[None]) ** 2, -1)
    d21 = jnp.sum((p2in1 - p1[None]) ** 2, -1)
    return d12 + d21


def decompose_homography(H, Km):
    """Faugeras SVD decomposition of a homography into 8 candidate
    (R, t) motions (Initializer::ReconstructH, `Initializer.cc:470-571`
    behavior). Returns ([8, 3, 3], [8, 3])."""
    Kinv = jnp.linalg.inv(Km)
    A = Kinv @ H @ Km
    U, d, Vt = jnp.linalg.svd(A)
    s_det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = d[0], d[1], d[2]

    denom = jnp.maximum(d1 * d1 - d3 * d3, 1e-12)
    aux1 = jnp.sqrt(jnp.maximum(d1 * d1 - d2 * d2, 0.0) / denom)
    aux3 = jnp.sqrt(jnp.maximum(d2 * d2 - d3 * d3, 0.0) / denom)
    x1s = jnp.array([aux1, aux1, -aux1, -aux1])
    x3s = jnp.array([aux3, -aux3, aux3, -aux3])

    Rs, ts = [], []
    # case d' = d2 (sin/cos theta)
    st = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) *
                              (d2 * d2 - d3 * d3), 0.0)) / \
        jnp.maximum((d1 + d3) * d2, 1e-12)
    ct = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    for i in range(4):
        eps1 = jnp.sign(x1s[i] + 1e-30)
        eps3 = jnp.sign(x3s[i] + 1e-30)
        stheta = eps1 * eps3 * st
        Rp = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
        Rp = Rp.at[0, 0].set(ct).at[0, 2].set(-stheta)
        Rp = Rp.at[2, 0].set(stheta).at[2, 2].set(ct)
        tp = (d1 - d3) * jnp.array([x1s[i], 0.0, -x3s[i]])
        Rs.append(s_det * U @ Rp @ Vt)
        ts.append((U @ tp))
    # case d' = -d2 (sin/cos phi)
    sp = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) *
                              (d2 * d2 - d3 * d3), 0.0)) / \
        jnp.maximum((d1 - d3) * d2, 1e-12)
    cp = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    for i in range(4):
        eps1 = jnp.sign(x1s[i] + 1e-30)
        eps3 = jnp.sign(x3s[i] + 1e-30)
        sphi = eps1 * eps3 * sp
        Rp = jnp.array([[1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, -1.0]])
        Rp = Rp.at[0, 0].set(cp).at[0, 2].set(sphi)
        Rp = Rp.at[2, 0].set(sphi).at[2, 2].set(-cp)
        tp = (d1 + d3) * jnp.array([x1s[i], 0.0, x3s[i]])
        Rs.append(s_det * U @ Rp @ Vt)
        ts.append(U @ tp)
    Rs = jnp.stack(Rs)
    ts = jnp.stack(ts)
    tn = jnp.linalg.norm(ts, axis=-1, keepdims=True)
    ts = ts / jnp.maximum(tn, 1e-9)
    return Rs, ts


def decompose_essential(E):
    """E -> 4 candidate (R, t) pairs, [4, 3, 3] and [4, 3]."""
    U, S, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-9)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


class MonoInit(NamedTuple):
    ok: jnp.ndarray
    T21: jnp.ndarray          # [4, 4] pose of frame2 wrt frame1 (Tcw with
                              # frame1 as world)
    pw: jnp.ndarray           # [N, 3] triangulated points (frame1 frame)
    good: jnp.ndarray         # [N] triangulation validity


def initialize_mono(key, K: Intrinsics, uv1, uv2, valid,
                    n_trials: int = 200, sigma: float = 1.0,
                    min_inliers: int = 50,
                    h_ratio_reject: float = 0.45) -> MonoInit:
    """uv1/uv2 [N, 2] matched undistorted keypoints of the two frames."""
    k1, k2 = jax.random.split(key)
    N = uv1.shape[0]

    # --- F model
    idxF = ransac.sample_minimal_sets(k1, N, valid, n_trials, 8)
    F = ransac.eight_point_fundamental(uv1[idxF], uv2[idxF])
    dF = ransac.sampson_epipolar_chi2(F, uv1, uv2)
    thF = 3.841 * sigma * sigma * 2
    inlF = (dF < thF) & valid[None]
    # reference scoring: sum of (th - chi2) over inliers (Initializer.cc:390)
    scoreF = jnp.sum(jnp.where(inlF, thF - dF, 0.0), axis=1)
    bestF = jnp.argmax(scoreF)

    # --- H model
    idxH = ransac.sample_minimal_sets(k2, N, valid, n_trials, 4)
    H = homography_4pt(uv1[idxH], uv2[idxH])
    dH = homography_transfer_chi2(H, uv1, uv2)
    thH = 5.991 * sigma * sigma * 2
    inlH = (dH < thH) & valid[None]
    scoreH = jnp.sum(jnp.where(inlH, thH - dH, 0.0), axis=1)

    SH = jnp.max(scoreH)
    bestH = jnp.argmax(scoreH)
    SF = scoreF[bestF]
    ratio = SH / jnp.maximum(SH + SF, 1e-9)
    use_H = ratio > h_ratio_reject        # model selection (Initializer.cc:108)

    # --- candidate motions: E decomposition (4) + H decomposition (8);
    # the model-selection flag masks which family may win. Evaluating both
    # densely costs one extra batched triangulation — cheaper than
    # branching under jit.
    Km = jnp.array([[K.fx, 0, K.cx], [0, K.fy, K.cy], [0, 0, 1.0]])
    E = Km.T @ F[bestF] @ Km
    Rs_e, ts_e = decompose_essential(E)
    Rs_h, ts_h = decompose_homography(H[bestH], Km)
    Rs = jnp.concatenate([Rs_e, Rs_h])          # [12, 3, 3]
    ts = jnp.concatenate([ts_e, ts_h])
    model_ok = jnp.concatenate([
        jnp.full((4,), ~use_H), jnp.full((8,), use_H)])
    inl = jnp.where(use_H, inlH[bestH], inlF[bestF])

    def count_cheirality(R, t):
        T1 = jnp.eye(4)
        T2 = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(t)
        pw, ok = triangulate_two_view(K, T1, T2, uv1, uv2,
                                      reproj_chi2=thF)
        ok = ok & inl
        return jnp.sum(ok.astype(jnp.int32)), pw, ok

    counts, pws, oks = [], [], []
    for i in range(12):
        c, pw, ok = count_cheirality(Rs[i], ts[i])
        counts.append(c)
        pws.append(pw)
        oks.append(ok)
    counts = jnp.stack(counts) * model_ok.astype(jnp.int32)
    best = jnp.argmax(counts)
    n_good = counts[best]
    # winner must dominate (Initializer.cc:560-600: best clearly > second)
    second = jnp.sort(counts)[-2]
    decisive = n_good.astype(jnp.float32) > second.astype(jnp.float32) * 1.2

    T21 = jnp.eye(4).at[:3, :3].set(Rs[best]).at[:3, 3].set(ts[best])
    pw = jnp.stack(pws)[best]
    good = jnp.stack(oks)[best]
    ok_all = (n_good >= min_inliers) & decisive
    return MonoInit(ok=ok_all, T21=T21, pw=pw, good=good & ok_all)
