"""Raibert foothold heuristic (reference: ``BaseInterface.cpp:266-288``):

    Δ = √(h/g)·(v − v_d) + (T_stance/2)·v_d,  clamped to ±(0.5, 0.3) m,

applied in the yaw-aligned frame to the default foothold pattern.
"""

from __future__ import annotations

import jax.numpy as jnp

from quaternion_mpc_tpu.ops import lie

GRAVITY = 9.81
FOOT_DELTA_X_LIMIT = 0.5   # LeggedParams.h:21
FOOT_DELTA_Y_LIMIT = 0.3   # LeggedParams.h:22


def foothold_targets(
    torso_pos_world: jnp.ndarray,
    torso_quat: jnp.ndarray,
    torso_lin_vel_world: jnp.ndarray,
    lin_vel_d_rel: jnp.ndarray,
    default_foot_pos_rel: jnp.ndarray,  # (n_feet, 3)
    gait_freq,
):
    """Returns (foot_pos_target_world, foot_pos_target_abs), both (n_feet, 3)."""
    yaw = lie.quat_to_euler(torso_quat)[..., 2]
    rot_z = lie.rotz(yaw)

    vel_rel = jnp.einsum("...ji,...j->...i", rot_z, torso_lin_vel_world)  # Rzᵀ v
    k = jnp.sqrt(jnp.abs(torso_pos_world[..., 2]) / GRAVITY)
    t_half_stance = 0.5 / gait_freq

    delta = k[..., None] * (vel_rel[..., :2] - lin_vel_d_rel[..., :2]) + (
        t_half_stance * lin_vel_d_rel[..., :2]
    )
    limits = jnp.asarray([FOOT_DELTA_X_LIMIT, FOOT_DELTA_Y_LIMIT], dtype=delta.dtype)
    delta = jnp.clip(delta, -limits, limits)
    delta_abs = jnp.einsum(
        "...ij,...j->...i",
        rot_z,
        jnp.concatenate([delta, jnp.zeros_like(delta[..., :1])], axis=-1),
    )

    target_abs = jnp.einsum("...ij,...fj->...fi", rot_z, default_foot_pos_rel)
    target_abs = target_abs + delta_abs[..., None, :]
    target_world = target_abs + torso_pos_world[..., None, :]
    return target_world, target_abs
