"""7-DoF Sim(3) pose-graph optimization (essential graph).

Capability parity with `Optimizer::OptimizeEssentialGraph`
(`Optimizer.cc:781-1044`): after a loop closure, optimize all keyframe Sim3
poses over spanning-tree + loop + strong-covisibility edges, then correct
map points by the per-KF pose delta. TPU redesign: vertices are a dense
[K, 7]-tangent problem; per-edge 7x14 Jacobians come from vmapped forward-mode
autodiff of the Sim3 relative-error map; the normal equations assemble by
scatter-add into a dense [7K, 7K] system (K <= a few hundred keyframes —
dense Cholesky on the MXU beats sparse bookkeeping at this size).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from object_slam_tpu.geometry import sim3


class PoseGraphProblem(NamedTuple):
    """T: [K, 4, 4]; s: [K]; fixed: [K] bool (loop KF held).
    Edges: ei, ej [E] int32; rel_T [E, 4, 4]; rel_s [E] — measured S_ji
    (vertex i -> vertex j); valid [E] bool; weight [E]."""

    T: jnp.ndarray
    s: jnp.ndarray
    fixed: jnp.ndarray
    ei: jnp.ndarray
    ej: jnp.ndarray
    rel_T: jnp.ndarray
    rel_s: jnp.ndarray
    valid: jnp.ndarray
    weight: jnp.ndarray


def _edge_error(xi_i, xi_j, Ti, si, Tj, sj, rel_T, rel_s):
    """e = log( S_ji_meas^-1 o (exp(xi_j) S_jw) o (exp(xi_i) S_iw)^-1 )."""
    dTi, dsi = sim3.exp(xi_i)
    dTj, dsj = sim3.exp(xi_j)
    Si_T, Si_s = sim3.compose(dTi, dsi, Ti, si)
    Sj_T, Sj_s = sim3.compose(dTj, dsj, Tj, sj)
    inv_i = sim3.inverse(Si_T, Si_s)
    Sji_T, Sji_s = sim3.compose(Sj_T, Sj_s, *inv_i)
    mi_T, mi_s = sim3.inverse(rel_T, rel_s)
    E_T, E_s = sim3.compose(mi_T, mi_s, Sji_T, Sji_s)
    return sim3.log(E_T, E_s)


def optimize_pose_graph(prob: PoseGraphProblem, n_iters: int = 20,
                        damping: float = 1e-6):
    """Gauss-Newton over the Sim3 graph. Returns (T [K,4,4], s [K])."""
    Kk = prob.T.shape[0]
    zero = jnp.zeros((7,), prob.T.dtype)

    err_fn = jax.vmap(_edge_error, in_axes=(None, None, 0, 0, 0, 0, 0, 0))
    jac_i = jax.vmap(jax.jacfwd(_edge_error, argnums=0),
                     in_axes=(None, None, 0, 0, 0, 0, 0, 0))
    jac_j = jax.vmap(jax.jacfwd(_edge_error, argnums=1),
                     in_axes=(None, None, 0, 0, 0, 0, 0, 0))

    free = ~prob.fixed

    def one_iter(_, carry):
        T, s = carry
        Ti, si = T[prob.ei], s[prob.ei]
        Tj, sj = T[prob.ej], s[prob.ej]
        e = err_fn(zero, zero, Ti, si, Tj, sj, prob.rel_T, prob.rel_s)   # [E,7]
        Ji = jac_i(zero, zero, Ti, si, Tj, sj, prob.rel_T, prob.rel_s)   # [E,7,7]
        Jj = jac_j(zero, zero, Ti, si, Tj, sj, prob.rel_T, prob.rel_s)

        w = jnp.where(prob.valid, prob.weight, 0.0)[:, None, None]
        Jiw, Jjw = Ji * w, Jj * w

        # Assemble dense [7K, 7K] normal equations by scatter-add of blocks.
        H = jnp.zeros((Kk, 7, Kk, 7), T.dtype)
        Hii = jnp.einsum('eik,eil->ekl', Jiw, Ji)
        Hjj = jnp.einsum('eik,eil->ekl', Jjw, Jj)
        Hij = jnp.einsum('eik,eil->ekl', Jiw, Jj)
        H = H.at[prob.ei, :, prob.ei, :].add(Hii)
        H = H.at[prob.ej, :, prob.ej, :].add(Hjj)
        H = H.at[prob.ei, :, prob.ej, :].add(Hij)
        H = H.at[prob.ej, :, prob.ei, :].add(jnp.swapaxes(Hij, -1, -2))

        b = jnp.zeros((Kk, 7), T.dtype)
        b = b.at[prob.ei].add(-jnp.einsum('eik,ei->ek', Jiw, e))
        b = b.at[prob.ej].add(-jnp.einsum('eik,ei->ek', Jjw, e))

        # Fix vertices: zero their rows/cols, identity diagonal.
        m = free.astype(T.dtype)
        H = H * m[:, None, None, None] * m[None, None, :, None]
        Hd = H.reshape(Kk * 7, Kk * 7)
        fixdiag = jnp.repeat(1.0 - m, 7)
        Hd = Hd + jnp.diag(fixdiag) + damping * jnp.eye(Kk * 7, dtype=T.dtype)
        bd = (b * m[:, None]).reshape(Kk * 7)

        dx = jnp.linalg.solve(Hd, bd).reshape(Kk, 7)
        dx = jnp.where(free[:, None], dx, 0.0)
        T2, s2 = sim3.retract(T, s, dx)
        return T2, s2

    return jax.lax.fori_loop(0, n_iters, one_iter, (prob.T, prob.s))


def correct_points(pt_xyz, pt_ref_kf, T_old, s_old, T_new, s_new):
    """Move map points by their reference keyframe's pose correction:
    p' = S_new^-1( S_old( p ) ) per point (LoopClosing.cc:694-715 analogue)."""
    To, so = T_old[pt_ref_kf], s_old[pt_ref_kf]
    Tn, sn = T_new[pt_ref_kf], s_new[pt_ref_kf]
    pc = sim3.apply(To, so, pt_xyz[:, None, :])[:, 0]
    Tni, sni = sim3.inverse(Tn, sn)
    return sim3.apply(Tni, sni, pc[:, None, :])[:, 0]
