"""Batched rigid-body plant: the framework-internal replacement for Gazebo
(SURVEY.md §7.6). Unlike the MPC *model* (which mirrors the reference's
deliberate simplifications), the plant integrates the full SRB in the world
frame — gyroscopic term included, gravity rotated by the true attitude — so
closed-loop tests exercise model mismatch like the real sim does.

State (world frame): x = [p(3), q(4), v(3), ω_body(3)].
Contact forces are commanded per foot in the body frame (what the torque
layer realizes via τ = −Jᵀf) and applied at the body-frame foot points.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from quaternion_mpc_tpu.ops import lie

GRAVITY = 9.81


class PlantParams(NamedTuple):
    mass: jnp.ndarray
    inertia: jnp.ndarray       # (3,3) true body inertia
    com_offset: jnp.ndarray    # (3,)
    com_mass: jnp.ndarray
    foot_pos_body: jnp.ndarray  # (n_feet, 3) attachment points (standing mode)


class PlantState(NamedTuple):
    pos: jnp.ndarray    # (3,) world
    quat: jnp.ndarray   # (4,)
    vel: jnp.ndarray    # (3,) world
    omega: jnp.ndarray  # (3,) body


class ExtWrench(NamedTuple):
    """External disturbance wrench on the torso — the counterpart of the
    reference's push tool (``unitree_controller/src/external_force.cpp``),
    which publishes an operator wrench onto the trunk. Force in the WORLD
    frame (a push is world-directed regardless of attitude), torque about
    the CoM in the BODY frame."""

    force_world: jnp.ndarray  # (3,) N
    torque_body: jnp.ndarray  # (3,) N·m


def zero_wrench(dtype=jnp.float32) -> ExtWrench:
    return ExtWrench(
        force_world=jnp.zeros((3,), dtype=dtype),
        torque_body=jnp.zeros((3,), dtype=dtype),
    )


def init_state(height: float = 0.3, dtype=jnp.float32) -> PlantState:
    return PlantState(
        pos=jnp.array([0.0, 0.0, height], dtype=dtype),
        quat=jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype),
        vel=jnp.zeros((3,), dtype=dtype),
        omega=jnp.zeros((3,), dtype=dtype),
    )


def _inv3(A):
    """Closed-form 3x3 inverse (adjugate/det): under vmap this stays pure
    elementwise VPU work, while `jnp.linalg.solve` lowers to a batched
    pivoting LU that dominates the fleet closed-loop step."""
    a, b, c = A[0, 0], A[0, 1], A[0, 2]
    d, e, f = A[1, 0], A[1, 1], A[1, 2]
    g, h, i = A[2, 0], A[2, 1], A[2, 2]
    A11, A12, A13 = e * i - f * h, c * h - b * i, b * f - c * e
    A21, A22, A23 = f * g - d * i, a * i - c * g, c * d - a * f
    A31, A32, A33 = d * h - e * g, b * g - a * h, a * e - b * d
    det = a * A11 + b * A21 + c * A31
    adj = jnp.stack([
        jnp.stack([A11, A12, A13]),
        jnp.stack([A21, A22, A23]),
        jnp.stack([A31, A32, A33]),
    ])
    return adj / det


def dynamics(s: PlantState, f_body: jnp.ndarray, p: PlantParams,
             ext: ExtWrench | None = None):
    """Continuous derivatives given per-foot body-frame forces (n_feet, 3).

    ``ext``: optional external disturbance wrench (push injection)."""
    rot = lie.quat_to_rotmat(s.quat)
    g_world = jnp.array([0.0, 0.0, -GRAVITY], dtype=s.pos.dtype)

    total_f_world = rot @ jnp.sum(f_body, axis=0)
    moment = jnp.sum(jnp.cross(p.foot_pos_body, f_body), axis=0)
    moment = moment + jnp.cross(p.com_offset, p.com_mass * (rot.T @ g_world))
    # full rotational dynamics (plant keeps the gyroscopic term the MPC drops)
    moment = moment - jnp.cross(s.omega, p.inertia @ s.omega)
    if ext is not None:
        total_f_world = total_f_world + ext.force_world
        moment = moment + ext.torque_body

    return PlantState(
        pos=s.vel,
        quat=0.5 * (lie.quat_G(s.quat) @ s.omega),
        vel=total_f_world / p.mass + g_world,
        omega=_inv3(p.inertia) @ moment,
    )


def step(s: PlantState, f_body: jnp.ndarray, p: PlantParams, dt,
         ext: ExtWrench | None = None) -> PlantState:
    """Semi-implicit RK2 (midpoint) step + quaternion renormalization."""
    k1 = dynamics(s, f_body, p, ext)
    mid = PlantState(*(a + 0.5 * dt * b for a, b in zip(s, k1)))
    k2 = dynamics(mid, f_body, p, ext)
    out = PlantState(*(a + dt * b for a, b in zip(s, k2)))
    return out._replace(quat=lie.quat_normalize(out.quat))
