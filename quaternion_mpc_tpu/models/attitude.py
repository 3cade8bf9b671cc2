"""Airborne attitude-control model: the ``falling_cat`` branch config.

The reference repo's ``falling_cat`` branch (README.md:20-25) reuses the same
quaternion-MPC solver core for contact-free attitude control with large
quaternion errors. The branch itself is not in the mounted snapshot, so this
model is built from the branch description + the shared solver core: reduced
state x = [q(4), ω(3)] (quat_idx=0, error dim 6), input u = body torque (3,)
realized by leg inertia, dynamics

    q̇ = ½ G(q) ω,   ω̇ = I⁻¹ (u − ω × Iω)

with box torque limits as the linear input inequality. This is also the
solver's large-error stress test: the Cayley-chart error-state handles
initial attitudes ~180° from the goal without singularities (the point of
the paper, README.md:5-17).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from quaternion_mpc_tpu.ops import lie


class AttitudeParams(NamedTuple):
    inertia: jnp.ndarray  # (3, 3)


def go1_attitude_params(dtype=None) -> AttitudeParams:
    inertia = (12.84 / 5.204) * np.diag([0.0168128557, 0.063009565, 0.0716547275])
    return AttitudeParams(inertia=jnp.asarray(inertia, dtype=dtype))


def attitude_dynamics(x: jnp.ndarray, u: jnp.ndarray, p: AttitudeParams) -> jnp.ndarray:
    """x = [q, ω] (7,), u = body torque (3,). Full gyroscopic term retained
    (airborne, no contact forces to dominate it)."""
    q = x[0:4]
    omega = x[4:7]
    q_dot = 0.5 * (lie.quat_G(q) @ omega)
    omega_dot = jnp.linalg.solve(p.inertia, u - jnp.cross(omega, p.inertia @ omega))
    return jnp.concatenate([q_dot, omega_dot])


def torque_box(tau_max: float, dtype=None):
    """|τ_i| ≤ τ_max as Cu·u + cb ≤ 0 rows."""
    Cu = jnp.concatenate([jnp.eye(3, dtype=dtype), -jnp.eye(3, dtype=dtype)], axis=0)
    cb = jnp.full((6,), -tau_max, dtype=dtype)
    return Cu, cb
