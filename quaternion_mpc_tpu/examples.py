"""Canonical example scenario builders (host-side, numpy).

Used by the benchmark, the CLI, and the driver entry point. Built entirely
in numpy: on this TPU backend a device->host pull permanently degrades
dispatch latency, so example construction must not create-then-pull jax
arrays (see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import numpy as np

# Go1 default stance feet, body frame (TestAltroQuatMpc.cpp:41-44)
GO1_STANCE_FEET = np.array(
    [
        [0.2104, 0.13, -0.325],
        [0.2104, -0.13, -0.325],
        [-0.1658, 0.13, -0.325],
        [-0.1658, -0.13, -0.325],
    ]
)


def np_euler_to_quat(rpy: np.ndarray) -> np.ndarray:
    """Host-side ZYX euler -> [w,x,y,z] quaternion (pure numpy)."""
    r, p, y = rpy[..., 0] / 2, rpy[..., 1] / 2, rpy[..., 2] / 2
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    return np.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )


def standing_batch(batch: int, horizon: int, dtype, seed: int = 0):
    """A batch of perturbed Go1 standing scenarios for the quat-MPC step:
    (RobotFeedback, Command, QuatMpcWeights) pytrees, batch-leading."""
    import jax
    import jax.numpy as jnp

    from quaternion_mpc_tpu.control import quat_mpc
    from quaternion_mpc_tpu.control.types import Command, RobotFeedback
    from quaternion_mpc_tpu.utils import config as cfg_mod

    rng = np.random.default_rng(seed)
    wts = quat_mpc.weights_from_config(cfg_mod.gazebo_go1_quat_mpc(), dtype=dtype)

    foot = GO1_STANCE_FEET.astype(dtype)
    rpy = 0.05 * rng.standard_normal((batch, 3)).astype(dtype)
    quat = np_euler_to_quat(rpy)
    fbk = RobotFeedback(
        torso_pos_world=np.tile(np.array([0, 0, 0.3], dtype=dtype), (batch, 1)),
        torso_quat=quat.astype(dtype),
        torso_lin_vel_world=0.05 * rng.standard_normal((batch, 3)).astype(dtype),
        torso_ang_vel_body=0.05 * rng.standard_normal((batch, 3)).astype(dtype),
        foot_pos_body=np.tile(foot, (batch, 1, 1)),
        foot_contact=np.ones((batch, 4), dtype=dtype),
        joint_pos=np.zeros((batch, 12), dtype=dtype),
        joint_vel=np.zeros((batch, 12), dtype=dtype),
    )
    ident = np.tile(np.array([1, 0, 0, 0], dtype=dtype), (batch, 1))
    cmd = Command(
        pos_body_d=np.zeros((batch, 3), dtype=dtype),
        lin_vel_body_d=np.zeros((batch, 3), dtype=dtype),
        quat_d=ident,
        ang_vel_body_d=np.zeros((batch, 3), dtype=dtype),
        contacts=np.ones((batch, 4), dtype=dtype),
    )
    wts_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (batch,) + a.shape), wts)
    return fbk, cmd, wts_b
