"""Discretization adapters + quaternion error-state projection.

Mirrors the semantics of the reference adapters (midpoint/RK2 and forward
Euler with chain-rule Jacobians, ``legged_ctrl/src/utils/AltroUtils.cpp:9-125``,
and the error-state projection ``E = blkdiag(I₃, G(q), I₃, I₃)`` used by
``discrete_error_dynamics`` at ``AltroUtils.cpp:128-221``) as composable jnp
functions over (dynamics, jacobian) callables of signature
``f(x, u, params) -> ẋ`` / ``fj(x, u, params) -> [∂ẋ/∂x | ∂ẋ/∂u]``.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from quaternion_mpc_tpu.ops import lie


def midpoint_step(f: Callable, x, u, params, h):
    """Explicit midpoint (RK2): xₖ₊₁ = x + h·f(x + h/2·f(x,u), u)."""
    xm = x + 0.5 * h * f(x, u, params)
    return x + h * f(xm, u, params)


def euler_step(f: Callable, x, u, params, h):
    return x + h * f(x, u, params)


def midpoint_jacobian(f: Callable, fj: Callable, x, u, params, h):
    """Chain-rule discrete Jacobian of the midpoint step, [(n,n) | (n,m)].

    Matches the reference exactly (AltroUtils.cpp:78-110): the continuous
    Jacobian is evaluated at x and at the midpoint, then composed as
    A_d = I + h·A_m·(I + h/2·A),  B_d = h·(A_m·h/2·B + B_m).
    """
    n = x.shape[-1]
    J = fj(x, u, params)
    A, B = J[:, :n], J[:, n:]
    xm = x + 0.5 * h * f(x, u, params)
    Jm = fj(xm, u, params)
    Am, Bm = Jm[:, :n], Jm[:, n:]
    eye = jnp.eye(n, dtype=x.dtype)
    Ad = eye + h * (Am @ (eye + 0.5 * h * A))
    Bd = h * (0.5 * h * (Am @ B) + Bm)
    return jnp.concatenate([Ad, Bd], axis=1)


def euler_jacobian(f: Callable, fj: Callable, x, u, params, h):
    del f
    n = x.shape[-1]
    J = fj(x, u, params)
    eye = jnp.eye(n, dtype=x.dtype)
    return jnp.concatenate([eye + h * J[:, :n], h * J[:, n:]], axis=1)


def autodiff_jacobian(f: Callable) -> Callable:
    """Continuous Jacobian via jacfwd, for models without analytic Jacobians."""

    def fj(x, u, params):
        Jx = jax.jacfwd(lambda xx: f(xx, u, params))(x)
        Ju = jax.jacfwd(lambda uu: f(x, uu, params))(u)
        return jnp.concatenate([Jx, Ju], axis=1)

    return fj


# ---------------------------------------------------------------------------
# Quaternion error-state machinery
# ---------------------------------------------------------------------------


def error_projection(x: jnp.ndarray, quat_idx: Optional[int], ne: int) -> jnp.ndarray:
    """E(x): (nx, ne) projection onto the error state.

    For a state with one quaternion at ``quat_idx`` the block is the attitude
    Jacobian G(q); all other coordinates project identically
    (AltroUtils.cpp:153-162). With ``quat_idx=None`` this is the identity.
    """
    nx = x.shape[-1]
    if quat_idx is None:
        return jnp.eye(nx, dtype=x.dtype)
    q = x[quat_idx : quat_idx + 4]
    E = jnp.zeros((nx, ne), dtype=x.dtype)
    E = E.at[:quat_idx, :quat_idx].set(jnp.eye(quat_idx, dtype=x.dtype))
    E = E.at[quat_idx : quat_idx + 4, quat_idx : quat_idx + 3].set(lie.quat_G(q))
    rest = nx - quat_idx - 4
    if rest > 0:
        E = E.at[quat_idx + 4 :, quat_idx + 3 :].set(jnp.eye(rest, dtype=x.dtype))
    return E


def state_diff(x: jnp.ndarray, x_ref: jnp.ndarray, quat_idx: Optional[int]) -> jnp.ndarray:
    """Error-state difference x ⊖ x_ref ∈ R^ne (Cayley chart on the quaternion)."""
    if quat_idx is None:
        return x - x_ref
    phi = lie.quat_error(x[quat_idx : quat_idx + 4], x_ref[quat_idx : quat_idx + 4])
    return jnp.concatenate([x[:quat_idx] - x_ref[:quat_idx], phi, x[quat_idx + 4 :] - x_ref[quat_idx + 4 :]])


def state_retract(x_ref: jnp.ndarray, e: jnp.ndarray, quat_idx: Optional[int]) -> jnp.ndarray:
    """Inverse of `state_diff`: x_ref ⊞ e."""
    if quat_idx is None:
        return x_ref + e
    q = lie.quat_mult(x_ref[quat_idx : quat_idx + 4], lie.cayley_map(e[quat_idx : quat_idx + 3]))
    return jnp.concatenate(
        [x_ref[:quat_idx] + e[:quat_idx], q, x_ref[quat_idx + 4 :] + e[quat_idx + 3 :]]
    )
