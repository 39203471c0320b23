"""Sim(3) operations for loop closing and 7-DoF pose-graph optimization.

The reference uses g2o's `Sim3` type (`Converter.cc`, `Optimizer.cc:781-1044`,
`Sim3Solver.cc`). Representation here: a pair `(T [..., 4, 4], s [...])` where
the similarity acts as  p' = s * R p + t.  Tangent space is 7-dim:
[rho(3), phi(3), sigma(1)] with s = exp(sigma).
"""

from __future__ import annotations

import jax.numpy as jnp

from object_slam_tpu.geometry import se3


def identity(batch_shape=(), dtype=jnp.float32):
    return se3.identity(batch_shape, dtype), jnp.ones(batch_shape, dtype)


def apply(T, s, p):
    """p' = s R p + t, points [..., N, 3]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return s[..., None, None] * (p @ jnp.swapaxes(R, -1, -2)) + t[..., None, :]


def compose(Ta, sa, Tb, sb):
    """(Ta,sa) o (Tb,sb): first apply b then a."""
    Ra, ta = Ta[..., :3, :3], Ta[..., :3, 3]
    Rb, tb = Tb[..., :3, :3], Tb[..., :3, 3]
    R = Ra @ Rb
    t = sa[..., None] * (Ra @ tb[..., None])[..., 0] + ta
    T = jnp.zeros_like(Ta)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T, sa * sb


def inverse(T, s):
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    si = 1.0 / s
    Ti = jnp.zeros_like(T)
    Ti = Ti.at[..., :3, :3].set(Rt)
    Ti = Ti.at[..., :3, 3].set(-si[..., None] * (Rt @ t[..., None])[..., 0])
    Ti = Ti.at[..., 3, 3].set(1.0)
    return Ti, si


def exp(xi):
    """7-dim tangent [rho, phi, sigma] -> (T, s).

    Uses the SE3 exp for (rho, phi) and scales separately — adequate for the
    small GN update steps taken by the pose-graph optimizer (the exact Sim3
    W-matrix correction is second order in ||xi||).
    """
    T = se3.exp(xi[..., :6])
    s = jnp.exp(xi[..., 6])
    return T, s


def log(T, s):
    xi6 = se3.log(T)
    return jnp.concatenate([xi6, jnp.log(s)[..., None]], axis=-1)


def retract(T, s, xi):
    dT, ds = exp(xi)
    Tn, sn = compose(dT, ds, T, s)
    # keep R on SO(3) across composed float32 updates (see se3.orthonormalize)
    return se3.orthonormalize(Tn), sn


def error(Ta, sa, Tb, sb):
    """log((Ta,sa) o (Tb,sb)^-1), the 7-dim relative error used by pose-graph GN."""
    Tbi, sbi = inverse(Tb, sb)
    Te, se_ = compose(Ta, sa, Tbi, sbi)
    return log(Te, se_)
