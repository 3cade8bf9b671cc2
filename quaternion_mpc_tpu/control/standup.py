"""Stand-up / pose-reset helpers (the `unitree_controller` sim tools layer).

Role parity with the reference's pose helpers used before every run
(``README.md:81-86``):
- `unitree_servo` — stand-up state machine: linear joint-space interpolation
  from the current pose to the standing pose over a fixed duration
  (``unitree_controller/src/body.cpp:40-73``: target
  q = [0, 0.84, -1.68] per leg, 2 s ramp, PD servo per joint);
- `unitree_move_kinetic` — teleport the plant to a reset pose
  (``src/move_publisher.cpp`` analog: here a pure function on PlantState).

Everything is jittable; the ramp is a pure function of the phase so a fleet
of scenarios can stand up in lockstep under `vmap`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from quaternion_mpc_tpu.sim import plant as plant_mod

# standing joint targets, (hip, thigh, calf) x FL, FR, RL, RR
# (body.cpp:42-43; the reference lists them in unitree leg order — values are
# symmetric so controller order is identical)
STAND_POSE = (0.0, 0.84, -1.68) * 4
# default stand PD gains (GazeboInterface.cpp:85-111 default-pose mode)
STAND_KP = 180.0
STAND_KD = 8.0


class StandupState(NamedTuple):
    q_start: jnp.ndarray  # (12,) joints at ramp start
    phase: jnp.ndarray    # scalar in [0, 1]


def init_standup(q_now: jnp.ndarray) -> StandupState:
    return StandupState(q_start=q_now, phase=jnp.zeros((), q_now.dtype))


def standup_targets(
    state: StandupState, dt, duration: float = 2.0
) -> tuple[StandupState, jnp.ndarray, jnp.ndarray]:
    """One servo tick: returns (state, q_target (12,), done flag).

    Linear interpolation current→stand over `duration` seconds
    (body.cpp:62-73 percent ramp), clamped at the target.
    """
    phase = jnp.minimum(state.phase + dt / duration, 1.0)
    target = jnp.asarray(STAND_POSE, state.q_start.dtype)
    q_tgt = state.q_start * (1.0 - phase) + target * phase
    return state._replace(phase=phase), q_tgt, phase >= 1.0


def servo_torques(q_tgt, q, dq, kp: float = STAND_KP, kd: float = STAND_KD):
    """Per-joint PD servo torque (unitree_legged_control joint_controller
    PD+τ law with zero feedforward)."""
    return kp * (q_tgt - q) - kd * dq


def reset_pose(
    ps: plant_mod.PlantState,
    pos=None,
    quat=None,
    zero_rates: bool = True,
) -> plant_mod.PlantState:
    """Teleport the plant (unitree_move_kinetic role): override pose and
    optionally zero the velocities, leaving everything else untouched."""
    out = ps
    if pos is not None:
        out = out._replace(pos=jnp.asarray(pos, ps.pos.dtype))
    if quat is not None:
        q = jnp.asarray(quat, ps.quat.dtype)
        out = out._replace(quat=q / jnp.linalg.norm(q))
    if zero_rates:
        out = out._replace(
            vel=jnp.zeros_like(ps.vel), omega=jnp.zeros_like(ps.omega)
        )
    return out
