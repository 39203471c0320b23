"""Bundle adjustment: Schur-complement Gauss-Newton over observation slabs.

Capability parity with `Optimizer::LocalBundleAdjustment` (`Optimizer.cc:
453-779`, 5 iters -> outlier prune -> 10 iters) and `GlobalBundleAdjustemnt`
(`Optimizer.cc:41-237`, 10 iters, marginalized point blocks). TPU redesign:

  * The problem is a flat observation slab (obs_kf, obs_pt, uv, ur,
    inv_sigma2, valid) over dense pose [K, 4, 4] and point [P, 3] slabs —
    no graphs, no per-edge objects.
  * Point blocks are eliminated in closed form (batched 3x3 inverses — the
    analogue of g2o's marginalized `VertexSBAPointXYZ`).
  * The reduced camera system S dx_c = b~ is solved matrix-free with
    preconditioned CG: each matvec is two segment-sum sweeps over the
    observation slab (gather/scatter — VPU-bound, scales to any K).
  * Fixed keyframes are handled by masking their tangent updates (the
    analogue of `setFixed(true)` at `Optimizer.cc:540-553`).

The same routine powers local BA, global BA, and (sharded over a mesh, see
parallel/sharded_ba.py) multi-chip BA where the segment sums become
psum-reduced partial sums.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from object_slam_tpu.geometry import se3
from object_slam_tpu.geometry.camera import Intrinsics
from object_slam_tpu.solvers.pose_opt import huber_weight


class BAProblem(NamedTuple):
    """Flat BA problem over static slabs.

    kf_pose: [K, 4, 4] world->camera.
    kf_fixed: [K] bool — poses held constant (but still project).
    kf_valid: [K] bool.
    pt_xyz: [P, 3] world points.
    pt_valid: [P] bool.
    obs_kf, obs_pt: [O] int32 indices into the slabs.
    obs_uv: [O, 2]; obs_ur: [O] (< 0 -> mono); obs_inv_sigma2: [O];
    obs_valid: [O] bool.
    """

    kf_pose: jnp.ndarray
    kf_fixed: jnp.ndarray
    kf_valid: jnp.ndarray
    pt_xyz: jnp.ndarray
    pt_valid: jnp.ndarray
    obs_kf: jnp.ndarray
    obs_pt: jnp.ndarray
    obs_uv: jnp.ndarray
    obs_ur: jnp.ndarray
    obs_inv_sigma2: jnp.ndarray
    obs_valid: jnp.ndarray


def _residual_jacobians(K: Intrinsics, prob: BAProblem, kf_pose, pt_xyz,
                        block_n: int | None = None):
    """Per-obs residuals r [O,3], pose Jacobian Jc [O,3,6], point Jacobian
    Jp [O,3,3], stereo mask, camera-frame depth.

    block_n: when the observation slab is [Kk, block_n] row-major, the
    per-observation pose is a BROADCAST over each KF's block instead of a
    gather. This matters enormously: XLA's TPU backend lowers the
    `kf_pose[obs_kf]` gather of [3,3]/[1,3] slices as a SERIAL while-loop
    of 82k dynamic-slices — profiled at ~240 ms per LM iteration, ~95%
    of the whole local-BA time at KITTI caps. The blocked broadcast is a
    plain einsum."""
    if block_n is not None:
        Kk = kf_pose.shape[0]
        pw_b = pt_xyz[prob.obs_pt].reshape(Kk, block_n, 3)
        R_b = kf_pose[:, :3, :3]
        pc = (jnp.einsum('kij,knj->kni', R_b, pw_b)
              + kf_pose[:, None, :3, 3]).reshape(-1, 3)
    else:
        T = kf_pose[prob.obs_kf]      # [O, 4, 4]
        pw = pt_xyz[prob.obs_pt]      # [O, 3]
        pc = jnp.einsum('oij,oj->oi', T[..., :3, :3], pw) + T[..., :3, 3]
    x, y = pc[..., 0], pc[..., 1]
    z = jnp.maximum(pc[..., 2], 1e-6)
    iz = 1.0 / z
    iz2 = iz * iz

    u = K.fx * x * iz + K.cx
    v = K.fy * y * iz + K.cy
    ur = u - K.bf * iz
    stereo = prob.obs_ur >= 0.0
    r = jnp.stack([prob.obs_uv[..., 0] - u,
                   prob.obs_uv[..., 1] - v,
                   jnp.where(stereo, prob.obs_ur - ur, 0.0)], axis=-1)

    du = jnp.stack([K.fx * iz, jnp.zeros_like(z), -K.fx * x * iz2], -1)
    dv = jnp.stack([jnp.zeros_like(z), K.fy * iz, -K.fy * y * iz2], -1)
    dur = du + jnp.stack([jnp.zeros_like(z), jnp.zeros_like(z), K.bf * iz2], -1)
    dproj = jnp.stack([du, dv, jnp.where(stereo[..., None], dur, 0.0)], -2)  # [O,3,3]

    dpc_dxi = jnp.concatenate([
        jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), pc.shape[:-1] + (3, 3)),
        -se3.hat(pc)], axis=-1)       # [O, 3, 6]
    Jc = -(dproj @ dpc_dxi)           # [O, 3, 6]
    if block_n is not None:
        Jp = -jnp.einsum('knij,kjl->knil',
                         dproj.reshape(Kk, block_n, 3, 3),
                         R_b).reshape(-1, 3, 3)
    else:
        Jp = -(dproj @ T[..., :3, :3])  # d pc/d pw = R -> [O, 3, 3]
    return r, Jc, Jp, stereo, pc[..., 2]


def _weights(prob, r, stereo, z, chi2_mono, chi2_stereo, robust=True):
    e2 = jnp.where(stereo, jnp.sum(r * r, -1), r[..., 0] ** 2 + r[..., 1] ** 2)
    chi2 = e2 * prob.obs_inv_sigma2
    delta2 = jnp.where(stereo, chi2_stereo, chi2_mono)
    w = huber_weight(chi2, delta2) if robust else jnp.ones_like(chi2)
    w = w * prob.obs_inv_sigma2
    live = (prob.obs_valid & (z > 0)
            & prob.kf_valid[prob.obs_kf] & prob.pt_valid[prob.obs_pt])
    return jnp.where(live, w, 0.0), chi2


def _spd_inv3(H):
    """Batched 3x3 SPD inverse via adjugate (faster than linalg.inv on TPU)."""
    a, b, c = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    d, e, f = H[..., 1, 1], H[..., 1, 2], H[..., 2, 2]
    A = d * f - e * e
    B = c * e - b * f
    C = b * e - c * d
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    inv = jnp.stack([
        jnp.stack([A, B, C], -1),
        jnp.stack([B, a * f - c * c, c * b - a * e], -1),
        jnp.stack([C, c * b - a * e, a * d - b * b], -1),
    ], -2) / det[..., None, None]
    return inv


def _robust_cost(K: Intrinsics, prob: BAProblem, kf_pose, pt_xyz,
                 chi2_mono, chi2_stereo, psum, block_n=None):
    """Total Huber cost over live observations (the LM acceptance metric).
    Points behind a camera carry a large penalty instead of silently
    leaving the live set — otherwise a step that pushes points to z<0
    reads as a cost decrease."""
    r, _, _, stereo, z = _residual_jacobians(K, prob, kf_pose, pt_xyz,
                                             block_n=block_n)
    e2 = jnp.where(stereo, jnp.sum(r * r, -1),
                   r[..., 0] ** 2 + r[..., 1] ** 2)
    chi2 = e2 * prob.obs_inv_sigma2
    d2 = jnp.where(stereo, chi2_stereo, chi2_mono)
    rho = jnp.where(chi2 <= d2, chi2, 2.0 * jnp.sqrt(d2 * chi2) - d2)
    rho = rho + jnp.where(z <= 0, 1e4, 0.0)
    live = (prob.obs_valid & prob.kf_valid[prob.obs_kf]
            & prob.pt_valid[prob.obs_pt])
    return psum(jnp.sum(jnp.where(live, rho, 0.0)))


def ba_iterate(K: Intrinsics, prob: BAProblem, n_iters: int,
               chi2_mono: float = 5.991, chi2_stereo: float = 7.815,
               damping: float = 1e-4, cg_iters: int = 24,
               robust: bool = True,
               comm_axis: str | None = None,
               block_n: int | None = None,
               pt_obs_slot=None):
    """Run n_iters Levenberg-Marquardt/Schur iterations; returns
    (kf_pose, pt_xyz).

    True LM, not fixed-damping GN: Marquardt scaling (lambda * diag(H))
    plus step acceptance — a candidate that RAISES the robust cost is
    rejected and lambda grows. Fixed-damping GN diverged from
    near-optimal states (measured: chi2 med 0.14 -> 4.7 over 5 iters at
    K=5, 0.28 m pose motion), and the post-BA chi2 prune then erased
    most of the map — g2o's LM step control was the load-bearing part
    of the reference schedule (Optimizer.cc:660-707).

    comm_axis: if set, observation slabs are sharded over that mesh axis and
    all obs-reductions are psum'd (multi-chip BA). Pose/point slabs are
    replicated; dense per-point/per-kf math is redundant but tiny next to the
    obs sweeps.

    TPU reduction structure (the round-4 local-BA speedup — the scatter
    form of both segment sums cost 4.85 s per local BA at KITTI caps):
      block_n: observations are laid out as [Kk, block_n] row-major
        blocks (obs_kf == repeat(arange(Kk), block_n)) — every per-KF
        reduction becomes a reshape + axis-sum, no scatter.
      pt_obs_slot: [P, M] int32 table of observation indices per point
        (-1 empty; build_local_ba_problem constructs it from the
        keypoint->point bindings) — every per-point reduction becomes a
        gather + axis-sum, no scatter. Incompatible with comm_axis (the
        table indexes the unsharded slab).
    """
    Kk = prob.kf_pose.shape[0]
    assert pt_obs_slot is None or comm_axis is None

    def psum(x):
        return jax.lax.psum(x, comm_axis) if comm_axis is not None else x

    def seg_kf(vals):
        if block_n is not None:
            return psum(jnp.sum(
                vals.reshape((Kk, block_n) + vals.shape[1:]), axis=1))
        return psum(jax.ops.segment_sum(vals, prob.obs_kf, num_segments=Kk))

    O = prob.obs_kf.shape[0]

    def seg_pt(vals):
        if pt_obs_slot is not None:
            ok = pt_obs_slot >= 0
            g = vals[jnp.clip(pt_obs_slot, 0, O - 1)]        # [P, M, ...]
            mask = ok.reshape(ok.shape + (1,) * (vals.ndim - 1))
            return jnp.sum(jnp.where(mask, g, 0), axis=1)
        return psum(jax.ops.segment_sum(vals, prob.obs_pt,
                                        num_segments=prob.pt_xyz.shape[0]))

    def per_obs_kf(vals):
        """vals [Kk, ...] -> per-observation [O, ...]. Blocked layout:
        broadcast (free); otherwise a gather — which XLA can serialize
        into a dynamic-slice loop for multi-dim rows (see
        _residual_jacobians), so blocked callers must never hit it."""
        if block_n is not None:
            return jnp.broadcast_to(
                vals[:, None], (Kk, block_n) + vals.shape[1:]
            ).reshape((-1,) + vals.shape[1:])
        return vals[prob.obs_kf]

    free_kf = (~prob.kf_fixed) & prob.kf_valid

    def one_iter(_, carry):
        kf_pose, pt_xyz, lam, cost = carry
        r, Jc, Jp, stereo, z = _residual_jacobians(K, prob, kf_pose, pt_xyz,
                                                   block_n=block_n)
        w, _ = _weights(prob, r, stereo, z, chi2_mono, chi2_stereo, robust)

        Jcw = Jc * w[:, None, None]
        Jpw = Jp * w[:, None, None]

        # Blocks
        Hcc = seg_kf(jnp.einsum('oik,oil->okl', Jcw, Jc))          # [K,6,6]
        Hpp = seg_pt(jnp.einsum('oik,oil->okl', Jpw, Jp))          # [P,3,3]
        Wcp = jnp.einsum('oik,oil->okl', Jcw, Jp)                  # [O,6,3] per-obs
        bc = -seg_kf(jnp.einsum('oik,oi->ok', Jcw, r))             # [K,6]
        bp = -seg_pt(jnp.einsum('oik,oi->ok', Jpw, r))             # [P,3]

        # Marquardt damping: lambda scales the diagonal of H itself (the
        # Hessian entries are O(fx^2) — an absolute lambda*I is invisible
        # at any usable magnitude), plus a tiny absolute floor.
        eye6 = jnp.eye(6, dtype=Hcc.dtype)
        eye3 = jnp.eye(3, dtype=Hpp.dtype)
        Hcc = Hcc + lam * (Hcc * eye6) + 1e-6 * eye6
        Hpp = Hpp + lam * (Hpp * eye3) + 1e-6 * eye3
        Hpp_inv = _spd_inv3(Hpp)

        # Schur RHS: b~ = bc - Wcp Hpp^-1 bp (per obs, scattered to kf)
        y0 = jnp.einsum('pkl,pl->pk', Hpp_inv, bp)                 # [P,3]
        bt = bc - seg_kf(jnp.einsum('okl,ol->ok', Wcp, y0[prob.obs_pt]))
        bt = jnp.where(free_kf[:, None], bt, 0.0)

        def S_matvec(xc):
            """xc [K,6] -> S xc, restricted to free keyframes."""
            xc = jnp.where(free_kf[:, None], xc, 0.0)
            out = jnp.einsum('kij,kj->ki', Hcc, xc)
            # t_p = sum_obs Jp^T W Jc x[kf] = sum Wcp^T x
            tp = seg_pt(jnp.einsum('okl,ok->ol', Wcp, per_obs_kf(xc)))
            yp = jnp.einsum('pkl,pl->pk', Hpp_inv, tp)
            out = out - seg_kf(jnp.einsum('okl,ol->ok', Wcp, yp[prob.obs_pt]))
            return jnp.where(free_kf[:, None], out, 0.0)

        # Block-Jacobi preconditioner from Hcc diagonal blocks
        Hcc_inv = jnp.linalg.inv(
            Hcc + (~free_kf)[:, None, None] * jnp.eye(6, dtype=Hcc.dtype))

        def precond(v):
            return jnp.where(free_kf[:, None],
                             jnp.einsum('kij,kj->ki', Hcc_inv, v), 0.0)

        # CG with a relative-residual exit: the block-Jacobi-preconditioned
        # 6K-dim reduced system typically converges in ~8 iterations, and
        # each matvec costs two O-sized sweeps — running a fixed 24 wasted
        # most of the remaining local-BA time once the serialized gathers
        # were gone (profiled: the CG fori_loops were 640 of 930 ms).
        def cg_cond(state):
            i, _, rk, _, rz = state
            return (i < cg_iters) & (jnp.sum(rk * rk) > 1e-4 * b_norm2)

        def cg_body(state):
            i, xk, rk, pk, rz = state
            Ap = S_matvec(pk)
            denom = jnp.sum(pk * Ap)
            alpha = rz / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
            xk = xk + alpha * pk
            rk = rk - alpha * Ap
            zk = precond(rk)
            rz_new = jnp.sum(rk * zk)
            beta = rz_new / jnp.where(jnp.abs(rz) < 1e-12, 1e-12, rz)
            pk = zk + beta * pk
            return i + 1, xk, rk, pk, rz_new

        x0 = jnp.zeros_like(bt)
        z0i = precond(bt)
        b_norm2 = jnp.sum(bt * bt)
        _, dxc, _, _, _ = jax.lax.while_loop(
            cg_cond, cg_body,
            (jnp.int32(0), x0, bt, z0i, jnp.sum(bt * z0i)))

        # Back-substitute points: dxp = Hpp^-1 (bp - Wcp^T dxc)
        tp = seg_pt(jnp.einsum('okl,ok->ol', Wcp, per_obs_kf(dxc)))
        dxp = jnp.einsum('pkl,pl->pk', Hpp_inv, bp - tp)
        dxp = jnp.where(prob.pt_valid[:, None], dxp, 0.0)

        # Trust region on point steps: a point constrained by two nearly
        # parallel rays has a near-singular Hpp and an unbounded step
        # along the ray — measured runaway to 100+ m on live maps. Cap
        # each step at 25% of the point's distance to its mean observer
        # (scale-free; healthy updates are orders of magnitude smaller).
        obs_w = jnp.where(w > 0, 1.0, 0.0)
        n_obs_pt = seg_pt(obs_w)
        cam_per_kf = -jnp.einsum('kji,kj->ki', kf_pose[:, :3, :3],
                                 kf_pose[:, :3, 3])            # [K, 3]
        cams = per_obs_kf(cam_per_kf)
        mean_cam = seg_pt(cams * obs_w[:, None]) \
            / jnp.maximum(n_obs_pt[:, None], 1.0)
        d_pt = jnp.linalg.norm(pt_xyz - mean_cam, axis=-1)
        step = jnp.linalg.norm(dxp, axis=-1)
        cap = 0.25 * d_pt + 1e-3
        dxp = dxp * (jnp.minimum(step, cap)
                     / jnp.maximum(step, 1e-12))[:, None]

        # same trust region for poses: an under-constrained window KF
        # (few live observations after weighting) can take an unbounded
        # CG step and drag every point it back-substitutes with it
        cstep = jnp.linalg.norm(dxc, axis=-1)
        dxc = dxc * (jnp.minimum(cstep, 0.5)
                     / jnp.maximum(cstep, 1e-12))[:, None]

        cand_pose = jnp.where(free_kf[:, None, None],
                              se3.retract(kf_pose, dxc), kf_pose)
        cand_pt = pt_xyz + dxp

        # LM step control: accept only cost-decreasing candidates
        cand_cost = _robust_cost(K, prob, cand_pose, cand_pt,
                                 chi2_mono, chi2_stereo, psum,
                                 block_n=block_n)
        accept = cand_cost < cost
        kf_pose = jnp.where(accept, cand_pose, kf_pose)
        pt_xyz = jnp.where(accept, cand_pt, pt_xyz)
        cost = jnp.where(accept, cand_cost, cost)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 8.0),
                       1e-6, 1e3)
        return kf_pose, pt_xyz, lam, cost

    cost0 = _robust_cost(K, prob, prob.kf_pose, prob.pt_xyz,
                         chi2_mono, chi2_stereo, psum, block_n=block_n)

    # while_loop with convergence exit, not fori_loop: each LM iteration
    # costs ~40 O-sized HBM sweeps, and a near-optimal map (the common
    # steady-state case — local BA runs at every keyframe) converges in
    # 2-4 iterations; the remaining iterations were pure waste. Exit when
    # an accepted step decreases the cost by < 0.01% (or lambda blew up —
    # no acceptable step exists).
    def cond(carry):
        i, _, _, lam, _, converged = carry
        return (i < n_iters) & ~converged

    def body(carry):
        i, kf_pose, pt_xyz, lam, cost, _ = carry
        kf_pose, pt_xyz, lam, new_cost = one_iter(
            i, (kf_pose, pt_xyz, lam, cost))
        accepted = new_cost < cost          # rejected steps keep cost
        tiny = new_cost > cost * (1.0 - 1e-4)
        converged = (accepted & tiny) | (lam >= 1e3)
        return i + 1, kf_pose, pt_xyz, lam, new_cost, converged

    _, kf_pose, pt_xyz, _, _, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), prob.kf_pose, prob.pt_xyz,
         jnp.asarray(damping, prob.pt_xyz.dtype), cost0, jnp.bool_(False)))
    return kf_pose, pt_xyz


def ba_chi2(K: Intrinsics, prob: BAProblem, kf_pose, pt_xyz, block_n=None):
    """Per-observation chi2 + depth at current estimate (for pruning)."""
    r, _, _, stereo, z = _residual_jacobians(K, prob, kf_pose, pt_xyz,
                                             block_n=block_n)
    e2 = jnp.where(stereo, jnp.sum(r * r, -1), r[..., 0] ** 2 + r[..., 1] ** 2)
    return e2 * prob.obs_inv_sigma2, z, stereo


def local_ba(K: Intrinsics, prob: BAProblem,
             iters1: int = 5, iters2: int = 10,
             chi2_mono: float = 5.991, chi2_stereo: float = 7.815,
             comm_axis: str | None = None,
             block_n: int | None = None,
             pt_obs_slot=None):
    """The reference local-BA schedule: optimize(5), prune outlier obs
    (chi2 > gate or negative depth, Optimizer.cc:668-689), optimize(10).

    Returns (kf_pose, pt_xyz, obs_valid) — pruned observation mask.
    """
    kf_pose, pt_xyz = ba_iterate(K, prob, iters1, chi2_mono, chi2_stereo,
                                 comm_axis=comm_axis, block_n=block_n,
                                 pt_obs_slot=pt_obs_slot)
    chi2, z, stereo = ba_chi2(K, prob._replace(), kf_pose, pt_xyz,
                              block_n=block_n)
    gate = jnp.where(stereo, chi2_stereo, chi2_mono)
    keep = prob.obs_valid & (chi2 <= gate) & (z > 0)
    prob2 = prob._replace(kf_pose=kf_pose, pt_xyz=pt_xyz, obs_valid=keep)
    kf_pose, pt_xyz = ba_iterate(K, prob2, iters2, chi2_mono, chi2_stereo,
                                 comm_axis=comm_axis, block_n=block_n,
                                 pt_obs_slot=pt_obs_slot)
    # final prune mask for the caller to erase observations
    chi2, z, stereo = ba_chi2(K, prob2, kf_pose, pt_xyz, block_n=block_n)
    keep2 = keep & (chi2 <= gate) & (z > 0)
    return kf_pose, pt_xyz, keep2


def global_ba(K: Intrinsics, prob: BAProblem, iters: int = 10,
              comm_axis: str | None = None, block_n: int | None = None):
    """GlobalBundleAdjustemnt equivalent (Optimizer.cc:41-237): robust Huber
    edges, first KF fixed (caller sets kf_fixed[0])."""
    return ba_iterate(K, prob, iters, comm_axis=comm_axis, block_n=block_n)
