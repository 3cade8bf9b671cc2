"""Per-scenario safety mask (reference kill-switch
``LeggedSafetyChecker.hpp:16-30``: |roll| > 1, |pitch| > 3, |joint vel| > 30).

In the fleet a tripped scenario must not poison the batch (SURVEY.md §5
failure-detection obligation): `safety_mask` returns a keep-flag per scenario
and `apply_mask` freezes unsafe scenarios (zero torque, held state).
"""

from __future__ import annotations

import jax.numpy as jnp

from quaternion_mpc_tpu.ops import lie

ROLL_LIMIT = 1.0
PITCH_LIMIT = 3.0
JOINT_VEL_LIMIT = 30.0


def is_safe(torso_quat, joint_vel) -> jnp.ndarray:
    euler = lie.quat_to_euler(torso_quat)
    ok_att = (jnp.abs(euler[..., 0]) < ROLL_LIMIT) & (jnp.abs(euler[..., 1]) < PITCH_LIMIT)
    ok_vel = jnp.all(jnp.abs(joint_vel) < JOINT_VEL_LIMIT, axis=-1)
    return ok_att & ok_vel


def is_safe_sustained(torso_quat, joint_vel, joint_vel_prev) -> jnp.ndarray:
    """Kill-switch variant for the joint-level (articulated) plant: the
    attitude limits are instantaneous, but the joint-velocity limit must be
    exceeded on TWO consecutive control-tick endpoints to trip.

    Rationale: the penalty-spring contact model produces single-tick dq
    spikes (measured 51 rad/s for one endpoint, back to noise 20 ms later)
    when a swing foot clips a stair-riser face — an impact artifact of the
    stiff sim contact, not a runaway actuator. The reference evaluates its
    30 rad/s check on hardware encoder velocities, which the motor's own
    dynamics low-pass; requiring persistence across two endpoints (20 ms)
    is the sim analog, and a genuine runaway (which grows, not decays)
    still trips one tick later."""
    euler = lie.quat_to_euler(torso_quat)
    ok_att = (jnp.abs(euler[..., 0]) < ROLL_LIMIT) & (jnp.abs(euler[..., 1]) < PITCH_LIMIT)
    over_now = jnp.any(jnp.abs(joint_vel) >= JOINT_VEL_LIMIT, axis=-1)
    over_prev = jnp.any(jnp.abs(joint_vel_prev) >= JOINT_VEL_LIMIT, axis=-1)
    return ok_att & ~(over_now & over_prev)


def finite_state(tree) -> jnp.ndarray:
    """NaN/Inf divergence detector over a pytree (per-scenario reduction)."""
    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    ok = jnp.asarray(True)
    for leaf in leaves:
        axes = tuple(range(1, leaf.ndim))
        ok = ok & jnp.all(jnp.isfinite(leaf), axis=axes if axes else None)
    return ok
