"""Shared controller-facing pytrees.

The reference routes everything through the mutex-guarded ``LeggedState``
blackboard (``include/LeggedState.h:246-261``); here the same information is
split into immutable pytrees that flow through pure functions: `RobotFeedback`
(≈ LeggedFeedback, :20-77) and `Command` (≈ the controller-relevant slice of
LeggedCtrl/LeggedJoyCmd, :79-158).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class RobotFeedback(NamedTuple):
    torso_pos_world: jnp.ndarray      # (3,)
    torso_quat: jnp.ndarray           # (4,) [w,x,y,z]
    torso_lin_vel_world: jnp.ndarray  # (3,)
    torso_ang_vel_body: jnp.ndarray   # (3,)
    foot_pos_body: jnp.ndarray        # (n_feet, 3)
    foot_contact: jnp.ndarray         # (n_feet,) 0/1 contact flags
    joint_pos: jnp.ndarray            # (n_feet*3,)
    joint_vel: jnp.ndarray            # (n_feet*3,)


class Command(NamedTuple):
    """Desired state for one MPC tick (post goal-update, filtered)."""

    pos_body_d: jnp.ndarray      # (3,) desired torso pos in body frame
    lin_vel_body_d: jnp.ndarray  # (3,) desired linear velocity, body frame
    quat_d: jnp.ndarray          # (4,) desired attitude
    ang_vel_body_d: jnp.ndarray  # (3,) desired body rates
    contacts: jnp.ndarray        # (n_feet,) planned contact flags (0/1)


class ControlOutput(NamedTuple):
    """What the low-level torque layer consumes (≈ LeggedCtrl.optimized_*)."""

    grf_body: jnp.ndarray        # (n_feet, 3) optimized contact forces, body frame
    grf_world: jnp.ndarray       # (n_feet, 3)
    foot_pos_target_world: jnp.ndarray  # (n_feet, 3) swing targets
    foot_vel_target_world: jnp.ndarray
    mpc_cost: jnp.ndarray
    mpc_iterations: jnp.ndarray
