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


def finite_state(tree) -> jnp.ndarray:
    """NaN/Inf divergence detector over a pytree (per-scenario reduction)."""
    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    ok = jnp.asarray(True)
    for leaf in leaves:
        axes = tuple(range(1, leaf.ndim))
        ok = ok & jnp.all(jnp.isfinite(leaf), axis=axes if axes else None)
    return ok
