"""The fused control step: goal → (gait) → MPC solve → force application →
plant, as ONE pure function ``step(carry, cmd) -> (carry, metrics)``.

This collapses the reference's three mutex-coupled SCHED_FIFO threads
(``Main.cpp:88-207``: MPC @200 Hz, low-level @4 kHz, feedback @1 kHz) into a
single compiled step; the rate hierarchy becomes substep counts
(``LeggedParams.h:4-6``). `jax.vmap` over scenarios gives the fleet axis;
`parallel.mesh.fleet_map` shards it over chips.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from quaternion_mpc_tpu.control import goals, quat_mpc, safety
from quaternion_mpc_tpu.control.types import Command, RobotFeedback
from quaternion_mpc_tpu.ops import lie
from quaternion_mpc_tpu.sim import plant
from quaternion_mpc_tpu.solver import SolverOptions


class ScenarioCarry(NamedTuple):
    plant: plant.PlantState
    goal: goals.GoalState
    alive: jnp.ndarray  # bool — scenario not tripped/diverged


class StepMetrics(NamedTuple):
    mpc_cost: jnp.ndarray
    height_err: jnp.ndarray
    att_err: jnp.ndarray
    alive: jnp.ndarray


class ScenarioParams(NamedTuple):
    """Per-scenario randomizable parameters (a pytree → domain randomization)."""

    wts: quat_mpc.QuatMpcWeights
    plant_params: plant.PlantParams
    target_height: jnp.ndarray


def feedback_from_plant(ps: plant.PlantState, foot_pos_body) -> RobotFeedback:
    """Ground-truth feedback (kf_type=0 path, GazeboInterface.cpp:136-149)."""
    n_feet = foot_pos_body.shape[-2]
    dtype = ps.pos.dtype
    return RobotFeedback(
        torso_pos_world=ps.pos,
        torso_quat=ps.quat,
        torso_lin_vel_world=ps.vel,
        torso_ang_vel_body=ps.omega,
        foot_pos_body=foot_pos_body,
        foot_contact=jnp.ones((n_feet,), dtype=dtype),
        joint_pos=jnp.zeros((n_feet * 3,), dtype=dtype),
        joint_vel=jnp.zeros((n_feet * 3,), dtype=dtype),
    )


def make_standing_step(
    horizon: int = 10,
    opts: SolverOptions = SolverOptions(al_iterations=2, ilqr_iterations=5),
    plant_substeps: int = 2,
):
    """Standing-balance closed loop (SURVEY.md §7 minimum slice): all-stance,
    forces applied directly at the feet; per-scenario safety/divergence
    masking so a failed rollout can't poison the fleet.
    """
    grf_update = quat_mpc.make_controller(horizon, opts)

    def control_step(carry: ScenarioCarry, sp: ScenarioParams, joy: goals.JoyCommand):
        fbk = feedback_from_plant(carry.plant, sp.plant_params.foot_pos_body)
        contacts = jnp.ones_like(fbk.foot_contact)
        goal, cmd = goals.goal_update(carry.goal, fbk, joy, contacts)
        cmd = cmd._replace(
            pos_body_d=cmd.pos_body_d.at[2].set(
                sp.target_height - carry.plant.pos[2]
            )
        )

        out, _sol = grf_update(fbk, cmd, sp.wts)

        dt_sub = sp.wts.h / plant_substeps
        new_plant = carry.plant
        for _ in range(plant_substeps):
            new_plant = plant.step(new_plant, out.grf_body, sp.plant_params, dt_sub)

        ok = safety.is_safe(new_plant.quat, fbk.joint_vel)
        ok = ok & safety.finite_state(new_plant)
        alive = carry.alive & ok
        # frozen scenarios hold their last healthy state
        kept_plant = jax.tree.map(
            lambda new, old: jnp.where(alive, new, old), new_plant, carry.plant
        )

        height_err = jnp.abs(kept_plant.pos[2] - sp.target_height)
        att_err = 1.0 - jnp.abs(jnp.sum(kept_plant.quat * cmd.quat_d))
        metrics = StepMetrics(
            mpc_cost=out.mpc_cost,
            height_err=height_err,
            att_err=att_err,
            alive=alive.astype(kept_plant.pos.dtype),
        )
        return ScenarioCarry(plant=kept_plant, goal=goal, alive=alive), metrics

    return control_step


def init_scenario(
    wts: quat_mpc.QuatMpcWeights,
    foot_pos_body,
    height: float = 0.3,
    dtype=jnp.float32,
):
    ps = plant.init_state(height=height, dtype=dtype)
    pp = plant.PlantParams(
        mass=wts.mass,
        inertia=wts.inertia,
        com_offset=wts.com_offset,
        com_mass=wts.trunk_mass,
        foot_pos_body=jnp.asarray(foot_pos_body, dtype=dtype),
    )
    fbk = feedback_from_plant(ps, pp.foot_pos_body)
    carry = ScenarioCarry(
        plant=ps,
        goal=goals.init_goal_state(fbk),
        alive=jnp.asarray(True),
    )
    sp = ScenarioParams(wts=wts, plant_params=pp, target_height=jnp.asarray(height, dtype))
    return carry, sp


def neutral_joy(dtype=jnp.float32) -> goals.JoyCommand:
    z = jnp.zeros((), dtype=dtype)
    return goals.JoyCommand(
        velx=z, vely=z, body_height=jnp.asarray(0.3, dtype),
        roll_rate=z, pitch_rate=z, yaw_rate=z,
        sin_ang_vel=jnp.asarray(False),
    )
