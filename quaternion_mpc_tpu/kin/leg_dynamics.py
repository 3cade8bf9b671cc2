"""Per-leg rigid-body dynamics: joint-space and task-space inverse dynamics.

Role parity with the reference's MATLAB-codegen ``Go1Dynamics``
(``legged_ctrl/src/utils/Go1Dynamics.cpp`` — 2.4k lines of generated C
computing per-leg task-space inverse dynamics τ(q, v, a); wired at
``BaseInterface.cpp:371-391``). Instead of transcribing generated code, the
dynamics are DERIVED at trace time from the leg's Lagrangian with JAX
autodiff:

    M(q)   = ∂²T/∂q̇²            (kinetic energy T is quadratic in q̇)
    c(q,q̇) = (∂(∇_q̇T)/∂q)·q̇ − ∇_qT + ∇_qV      (Coriolis/centrifugal + gravity)
    τ      = M(q)·q̈ + c(q, q̇)

so correctness reduces to the energy functions, which are verifiable against
the closed-form FK (`kin.leg.fk`) and ∇V (gravity torque) independently.

Chain (matches `kin.leg` conventions): hip roll about x at (ox, oy, 0),
thigh pitch about y offset (0, d, 0), calf pitch about y offset (0, 0, -lt),
foot at (0, 0, -lc). Link mass/CoM/inertia from the Go1 URDF
(``robots/go1_description/xacro/const.xacro:88-150``); right legs mirror
the CoM y-offsets.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from quaternion_mpc_tpu.kin import leg as leg_mod

GRAVITY = 9.81

# Go1 link parameters (const.xacro:88-150), left-leg CoM convention
_HIP = dict(
    mass=0.591,
    com=(-0.005657, -0.008752, -0.000102),
    inertia=(
        (3.34008405e-4, -1.0826066e-5, 1.290732e-6),
        (-1.0826066e-5, 6.19101213e-4, 1.643194e-6),
        (1.290732e-6, 1.643194e-6, 4.0057614e-4),
    ),
)
_THIGH = dict(
    mass=0.92,
    com=(-0.003342, -0.018054, -0.033451),
    inertia=(
        (4.431760472e-3, 5.7496807e-5, -2.18457134e-4),
        (5.7496807e-5, 4.485671726e-3, 5.72001265e-4),
        (-2.18457134e-4, 5.72001265e-4, 7.40309489e-4),
    ),
)
_CALF = dict(
    mass=0.135862 + 0.06,  # calf + foot (foot_mass, const.xacro:157)
    com=(0.006197, 0.001408, -0.116695),
    inertia=(
        (1.088793059e-3, -2.55679e-7, 7.117814e-6),
        (-2.55679e-7, 1.100428748e-3, 2.077264e-6),
        (7.117814e-6, 2.077264e-6, 2.4787446e-5),
    ),
)


class LegLinkParams(NamedTuple):
    """Per-link rigid-body parameters of one 3-DoF leg (a pytree)."""

    mass: jnp.ndarray     # (3,)
    com: jnp.ndarray      # (3, 3) CoM in link frame
    inertia: jnp.ndarray  # (3, 3, 3) about the CoM, link frame


def go1_leg_params(mirror_y: bool = False, dtype=jnp.float32) -> LegLinkParams:
    """Go1 link params; mirror_y=True for right (FR/RR) legs."""
    sy = -1.0 if mirror_y else 1.0
    mir = np.diag([1.0, sy, 1.0])
    links = [_HIP, _THIGH, _CALF]
    return LegLinkParams(
        mass=jnp.asarray([l["mass"] for l in links], dtype),
        com=jnp.asarray([mir @ np.asarray(l["com"]) for l in links], dtype),
        inertia=jnp.asarray(
            [mir @ np.asarray(l["inertia"]) @ mir for l in links], dtype
        ),
    )


def _rx(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[1.0, 0.0, 0.0], [0.0, c, -s], [0.0, s, c]], dtype=a.dtype)


def _ry(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]], dtype=a.dtype)


def _link_frames(q, rho_fix):
    """Rotation + CoM-anchor origin of each link, body frame."""
    ox, oy, d, lt, lc = (rho_fix[i] for i in range(5))
    R1 = _rx(q[0])
    R2 = R1 @ _ry(q[1])
    R3 = R2 @ _ry(q[2])
    o1 = jnp.stack([ox, oy, jnp.zeros_like(ox)])
    o2 = o1 + R1 @ jnp.stack([jnp.zeros_like(d), d, jnp.zeros_like(d)])
    o3 = o2 + R2 @ jnp.stack([jnp.zeros_like(lt), jnp.zeros_like(lt), -lt])
    return (R1, R2, R3), (o1, o2, o3)


def _com_positions(q, rho_fix, params: LegLinkParams):
    Rs, os_ = _link_frames(q, rho_fix)
    return jnp.stack([o + R @ params.com[i] for i, (R, o) in enumerate(zip(Rs, os_))])


def foot_position(q, rho_fix):
    """FK through the dynamics chain (must equal `kin.leg.fk`)."""
    (R1, R2, R3), (o1, o2, o3) = _link_frames(q, rho_fix)
    lc = rho_fix[4]
    return o3 + R3 @ jnp.stack([jnp.zeros_like(lc), jnp.zeros_like(lc), -lc])


def potential_energy(q, rho_fix, params: LegLinkParams, g_body) -> jnp.ndarray:
    coms = _com_positions(q, rho_fix, params)
    return -jnp.sum(params.mass * (coms @ g_body))


def kinetic_energy(q, dq, rho_fix, params: LegLinkParams) -> jnp.ndarray:
    # CoM velocities via jvp of positions along dq
    _, v_coms = jax.jvp(lambda qq: _com_positions(qq, rho_fix, params), (q,), (dq,))
    # angular velocities (body frame): joint axes x, y', y''
    R1 = _rx(q[0])
    R2 = R1 @ _ry(q[1])
    ex = jnp.array([1.0, 0.0, 0.0], dtype=q.dtype)
    ey = jnp.array([0.0, 1.0, 0.0], dtype=q.dtype)
    w1 = dq[0] * ex
    w2 = w1 + dq[1] * (R1 @ ey)
    w3 = w2 + dq[2] * (R2 @ ey)
    Rs, _ = _link_frames(q, rho_fix)
    T = 0.5 * jnp.sum(params.mass * jnp.sum(v_coms * v_coms, axis=-1))
    for i, (w, R) in enumerate(zip((w1, w2, w3), Rs)):
        I_body = R @ params.inertia[i] @ R.T
        T = T + 0.5 * w @ (I_body @ w)
    return T


def mass_matrix(q, rho_fix, params: LegLinkParams) -> jnp.ndarray:
    """Joint-space inertia M(q) (3, 3), SPD."""
    return jax.hessian(lambda dq: kinetic_energy(q, dq, rho_fix, params))(
        jnp.zeros_like(q)
    )


def bias_forces(q, dq, rho_fix, params: LegLinkParams, g_body) -> jnp.ndarray:
    """Coriolis/centrifugal + gravity torque c(q, q̇) (3,)."""
    p_dqT = jax.grad(kinetic_energy, argnums=1)
    # d/dt ∇_q̇T at q̈ = 0: directional derivative of ∇_q̇T wrt q along q̇
    _, dt_term = jax.jvp(lambda qq: p_dqT(qq, dq, rho_fix, params), (q,), (dq,))
    dT_dq = jax.grad(kinetic_energy, argnums=0)(q, dq, rho_fix, params)
    dV_dq = jax.grad(potential_energy)(q, rho_fix, params, g_body)
    return dt_term - dT_dq + dV_dq


def inverse_dynamics(q, dq, qdd, rho_fix, params: LegLinkParams, g_body=None):
    """Joint torques τ = M(q)·q̈ + c(q, q̇) for one leg. Shapes (3,) each."""
    if g_body is None:
        g_body = jnp.array([0.0, 0.0, -GRAVITY], dtype=q.dtype)
    return mass_matrix(q, rho_fix, params) @ qdd + bias_forces(
        q, dq, rho_fix, params, g_body
    )


def task_space_inverse_dynamics(
    q, dq, a_task, rho_fix, params: LegLinkParams, g_body=None
):
    """τ for a desired FOOT acceleration a_task (3,), the Go1Dynamics
    call shape (``BaseInterface.cpp:371-391``): q̈ = J⁻¹(a − J̇q̇), then
    joint-space inverse dynamics."""
    J = leg_mod.jac(q, rho_fix)
    # J̇·q̇ via jvp of the foot VELOCITY map along q̇
    _, jdot_dq = jax.jvp(
        lambda qq: leg_mod.jac(qq, rho_fix) @ dq, (q,), (dq,)
    )
    qdd = jnp.linalg.solve(J, a_task - jdot_dq)
    return inverse_dynamics(q, dq, qdd, rho_fix, params, g_body)


def gravity_compensation(q, rho_fix, params: LegLinkParams, g_body=None):
    """Static gravity torque ∇_qV (swing-leg feedforward)."""
    if g_body is None:
        g_body = jnp.array([0.0, 0.0, -GRAVITY], dtype=q.dtype)
    return jax.grad(potential_energy)(q, rho_fix, params, g_body)
