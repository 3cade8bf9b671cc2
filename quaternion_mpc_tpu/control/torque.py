"""Low-level torque mapping: the reference's 4 kHz "whole-body" layer
(``BaseInterface::tau_ctrl_update``, ``BaseInterface.cpp:344-408``) as one
pure batched function:

- swing legs: IK joint targets + J⁻¹ velocity targets, PD + zero feedforward;
- stance legs: τ = −Jᵀ f with the optimized GRF (body frame);
- NaN guards replaced by workspace-clamped IK (kin.leg.ik never NaNs).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from quaternion_mpc_tpu.control.types import ControlOutput, RobotFeedback
from quaternion_mpc_tpu.kin import leg
from quaternion_mpc_tpu.ops import lie


# Go1 per-joint actuator velocity limits [hip, thigh, calf] rad/s
# (go1.urdf limit attrs: effort/velocity per joint type).
JOINT_VEL_LIMIT = (30.1, 30.1, 20.06)


class JointTargets(NamedTuple):
    q: jnp.ndarray    # (n_legs, 3)
    dq: jnp.ndarray   # (n_legs, 3)
    tau: jnp.ndarray  # (n_legs, 3)


def tau_ctrl_update(
    fbk: RobotFeedback,
    out: ControlOutput,
    rho_fix: jnp.ndarray,
    contacts: jnp.ndarray,
) -> JointTargets:
    n_legs = fbk.foot_pos_body.shape[-2]
    rot = lie.quat_to_rotmat(fbk.torso_quat)
    q = fbk.joint_pos.reshape(n_legs, 3)
    dq = fbk.joint_vel.reshape(n_legs, 3)

    # swing: world target → body, IK with hip branch nearest the measured q
    # (BaseInterface.cpp:349-355 calls inv_kin with cur_q)
    foot_target_body = (out.foot_pos_target_world - fbk.torso_pos_world) @ rot
    q_tgt = leg.ik_near(foot_target_body, rho_fix, q)

    foot_vel_body = (out.foot_vel_target_world - fbk.torso_lin_vel_world) @ rot
    J = leg.jac(q, rho_fix)
    dq_tgt = jnp.linalg.solve(J, foot_vel_body[..., None])[..., 0]
    # Go1 per-joint actuator velocity limits (go1.urdf limit attrs: hip and
    # thigh 30.1 rad/s, calf 20.06 rad/s): near a kinematic singularity — or
    # with the swing foot physically blocked by an obstacle (stair riser
    # face) — J⁻¹ demands divergent joint speeds the real firmware could
    # never track; an unclamped Kd term then pumps the impact into a
    # joint-velocity runaway (measured 95 rad/s on stairs). Same clamp the
    # pinned-feet sensor model applies.
    vlim = jnp.asarray(JOINT_VEL_LIMIT, dtype=dq_tgt.dtype)
    dq_tgt = jnp.clip(dq_tgt, -vlim, vlim)

    # stance: τ = −Jᵀ f (body-frame GRF), swing: τ = 0 (:367-371)
    tau_stance = -jnp.einsum("ljk,lj->lk", J, out.grf_body)
    in_contact = contacts[..., None] > 0.5
    tau = jnp.where(in_contact, tau_stance, jnp.zeros_like(tau_stance))
    q_cmd = jnp.where(in_contact, q, q_tgt)
    dq_cmd = jnp.where(in_contact, dq, dq_tgt)
    return JointTargets(q=q_cmd, dq=dq_cmd, tau=tau)


def pd_torque(targets: JointTargets, q, dq, kp, kd):
    """Explicit PD + feedforward, the Gazebo send path (GazeboInterface.cpp:116-124)."""
    return kp * (targets.q - q) + kd * (targets.dq - dq) + targets.tau


def tau_ctrl_update_with_id(
    fbk: RobotFeedback,
    out: ControlOutput,
    rho_fix: jnp.ndarray,
    contacts: jnp.ndarray,
    leg_params=None,
    foot_acc_target_world=None,
) -> JointTargets:
    """`tau_ctrl_update` + inverse-dynamics swing feedforward.

    The reference wires per-leg task-space inverse dynamics into the swing
    branch but ships it commented out (``BaseInterface.cpp:371-391``,
    Go1Dynamics). Here it is a working option: desired foot acceleration ->
    τ_ff = task_space_inverse_dynamics per swing leg (kin.leg_dynamics),
    added to the PD targets.
    """
    import jax

    from quaternion_mpc_tpu.kin import leg_dynamics as ld

    base = tau_ctrl_update(fbk, out, rho_fix, contacts)
    if leg_params is None or foot_acc_target_world is None:
        return base
    n_legs = fbk.foot_pos_body.shape[-2]
    rot = lie.quat_to_rotmat(fbk.torso_quat)
    q = fbk.joint_pos.reshape(n_legs, 3)
    dq = fbk.joint_vel.reshape(n_legs, 3)
    acc_body = foot_acc_target_world @ rot  # rows Rᵀ a_w
    g_body = rot.T @ jnp.array([0.0, 0.0, -ld.GRAVITY], dtype=q.dtype)

    def one(qi_, dqi, ai, rho_i, params_i):
        return ld.task_space_inverse_dynamics(qi_, dqi, ai, rho_i, params_i, g_body)

    tau_ff = jax.vmap(one)(q, dq, acc_body, rho_fix, leg_params)
    in_contact = contacts[..., None] > 0.5
    return base._replace(tau=jnp.where(in_contact, base.tau, tau_ff))


def go1_leg_params_all(dtype=jnp.float32):
    """Per-leg LegLinkParams stacked FL, FR, RL, RR (right legs mirrored)."""
    import jax

    from quaternion_mpc_tpu.kin import leg_dynamics as ld

    legs = [
        ld.go1_leg_params(mirror_y=False, dtype=dtype),  # FL
        ld.go1_leg_params(mirror_y=True, dtype=dtype),   # FR
        ld.go1_leg_params(mirror_y=False, dtype=dtype),  # RL
        ld.go1_leg_params(mirror_y=True, dtype=dtype),   # RR
    ]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *legs)
