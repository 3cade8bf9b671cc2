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
    zero_initial_omega: bool = False,
):
    """Standing-balance closed loop (SURVEY.md §7 minimum slice): all-stance,
    forces applied directly at the feet; per-scenario safety/divergence
    masking so a failed rollout can't poison the fleet.

    Like `make_walking_step`, the closed loop defaults to the corrected
    controller (ω feedback on, see note there); pass True to reproduce the
    reference's QuatMpc.cpp:242 behavior.
    """
    grf_update = quat_mpc.make_controller(horizon, opts, zero_initial_omega)

    def control_step(carry: ScenarioCarry, sp: ScenarioParams, joy: goals.JoyCommand):
        fbk = feedback_from_plant(carry.plant, sp.plant_params.foot_pos_body)
        contacts = jnp.ones_like(fbk.foot_contact)
        goal, cmd = goals.goal_update(carry.goal, fbk, joy, contacts, dt=sp.wts.h)
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


class WalkingCarry(NamedTuple):
    plant: plant.PlantState
    goal: goals.GoalState
    gait: "object"            # schedule.GaitState
    feet_world: jnp.ndarray   # (n_feet, 3) simulated foot positions
    alive: jnp.ndarray


class WalkingMetrics(NamedTuple):
    mpc_cost: jnp.ndarray
    vel_err: jnp.ndarray
    height_err: jnp.ndarray
    alive: jnp.ndarray


def make_walking_step(
    horizon: int = 10,
    opts: SolverOptions = SolverOptions(al_iterations=2, ilqr_iterations=4),
    gait_freq: float = 2.2,
    pattern=None,
    zero_initial_omega: bool = False,
):
    """Trot-walking closed loop: gait FSM → Raibert footholds → quat-MPC →
    force application at the current stance feet.

    Sim model (SURVEY.md §7.6 intermediate tier): torso SRB + massless feet;
    stance feet are pinned to the ground and realize the commanded GRF
    (ideal low-level force tracking), swing feet follow the quintic FSM
    targets with zero force. Joint angles are recovered via analytic IK each
    tick so the kinematics layer runs in the loop.
    """
    from quaternion_mpc_tpu.gait import raibert as raibert_mod
    from quaternion_mpc_tpu.gait import schedule as sched_mod
    from quaternion_mpc_tpu.kin import leg as leg_mod

    if pattern is None:
        pattern = sched_mod.trot_pattern()
    # the closed loop defaults to the CORRECTED controller (ω feedback on):
    # with the reference's ω=0 init quirk (QuatMpc.cpp:242) the idealized
    # force-tracking plant has no other source of attitude damping and the
    # trot tips over after ~2 s; the real reference survives via joint-level
    # impedance the SRB plant doesn't model.
    grf_update = quat_mpc.make_controller(horizon, opts, zero_initial_omega)

    def control_step(carry: WalkingCarry, sp: ScenarioParams, joy: goals.JoyCommand):
        ps = carry.plant
        dtype = ps.pos.dtype
        rot = lie.quat_to_rotmat(ps.quat)
        foot_pos_body = (carry.feet_world - ps.pos) @ rot  # Rᵀ(p_f − p) rows
        rho_fix = leg_mod.go1_rho_fix(dtype)
        joint_pos = leg_mod.ik(foot_pos_body, rho_fix)

        contacts_now = sched_mod.contact_flags(carry.gait, pattern).astype(dtype)
        fbk = RobotFeedback(
            torso_pos_world=ps.pos,
            torso_quat=ps.quat,
            torso_lin_vel_world=ps.vel,
            torso_ang_vel_body=ps.omega,
            foot_pos_body=foot_pos_body,
            foot_contact=contacts_now,
            joint_pos=joint_pos.reshape(-1),
            joint_vel=jnp.zeros_like(joint_pos).reshape(-1),
        )

        # Raibert foothold targets (BaseInterface.cpp:266-288)
        vel_d_rel = jnp.stack([joy.velx, joy.vely, jnp.zeros_like(joy.velx)])
        default_rel = jnp.asarray(
            [[0.20, 0.14, -0.3], [0.20, -0.14, -0.3], [-0.20, 0.14, -0.3], [-0.20, -0.14, -0.3]],
            dtype=dtype,
        )
        target_world, _ = raibert_mod.foothold_targets(
            ps.pos, ps.quat, ps.vel, vel_d_rel, default_rel, gait_freq
        )
        target_world = target_world.at[:, 2].set(0.0)  # feet land on the ground

        gait = sched_mod.gait_update(
            carry.gait,
            pattern,
            sp.wts.h,
            jnp.asarray(gait_freq, dtype),
            carry.feet_world,
            target_world,
            contacts_now > 0.5,
        )
        plan_contacts = sched_mod.contact_flags(gait, pattern).astype(dtype)

        goal, cmd = goals.goal_update(carry.goal, fbk, joy, plan_contacts, dt=sp.wts.h)
        cmd = cmd._replace(
            pos_body_d=cmd.pos_body_d.at[2].set(sp.target_height - ps.pos[2])
        )
        out, _sol = grf_update(fbk, cmd, sp.wts)

        # apply stance forces at the *current* feet; move swing feet to targets
        f_body = out.grf_body * plan_contacts[:, None]
        pp = sp.plant_params._replace(foot_pos_body=foot_pos_body)
        new_plant = plant.step(ps, f_body, pp, sp.wts.h)
        feet_world = jnp.where(
            plan_contacts[:, None] > 0.5, carry.feet_world, gait.target_pos
        )

        ok = safety.is_safe(new_plant.quat, fbk.joint_vel)
        ok = ok & safety.finite_state(new_plant) & (new_plant.pos[2] > 0.05)
        alive = carry.alive & ok
        kept_plant = jax.tree.map(
            lambda new, old: jnp.where(alive, new, old), new_plant, ps
        )

        yaw = lie.quat_to_euler(kept_plant.quat)[2]
        vel_rel = lie.rotz(yaw).T @ kept_plant.vel
        metrics = WalkingMetrics(
            mpc_cost=out.mpc_cost,
            vel_err=jnp.abs(vel_rel[0] - joy.velx),
            height_err=jnp.abs(kept_plant.pos[2] - sp.target_height),
            alive=alive.astype(dtype),
        )
        return (
            WalkingCarry(
                plant=kept_plant, goal=goal, gait=gait, feet_world=feet_world, alive=alive
            ),
            metrics,
        )

    return control_step


def init_walking_scenario(
    wts: quat_mpc.QuatMpcWeights,
    height: float = 0.3,
    dtype=jnp.float32,
):
    from quaternion_mpc_tpu.gait import schedule as sched_mod

    ps = plant.init_state(height=height, dtype=dtype)
    default_rel = jnp.asarray(
        [[0.20, 0.14, -0.3], [0.20, -0.14, -0.3], [-0.20, 0.14, -0.3], [-0.20, -0.14, -0.3]],
        dtype=dtype,
    )
    feet_world = default_rel + ps.pos
    feet_world = feet_world.at[:, 2].set(0.0)
    pp = plant.PlantParams(
        mass=wts.mass,
        inertia=wts.inertia,
        com_offset=wts.com_offset,
        com_mass=wts.trunk_mass,
        foot_pos_body=default_rel,
    )
    fbk = feedback_from_plant(ps, default_rel)
    carry = WalkingCarry(
        plant=ps,
        goal=goals.init_goal_state(fbk),
        gait=sched_mod.init_gait_state(feet_world, sched_mod.trot_pattern()),
        feet_world=feet_world,
        alive=jnp.asarray(True),
    )
    sp = ScenarioParams(wts=wts, plant_params=pp, target_height=jnp.asarray(height, dtype))
    return carry, sp


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


class EstimatedCarry(NamedTuple):
    plant: plant.PlantState
    goal: goals.GoalState
    kf: "object"            # est.kf.KFState
    feet_world: jnp.ndarray  # (n_feet, 3) ground-pinned stance feet
    alive: jnp.ndarray


def make_estimated_standing_step(
    horizon: int = 10,
    opts: SolverOptions = SolverOptions(al_iterations=2, ilqr_iterations=5),
    plant_substeps: int = 2,
):
    """Standing balance closed over the ESTIMATED state (kf_type=1 path,
    ``BaseInterface.cpp:293-342`` + BasicKF): the controller sees torso
    position/velocity from the contact-aided linear KF driven by synthetic
    IMU (specific force from the commanded GRFs) and leg kinematics, with
    attitude taken from the IMU as in the reference. Ground truth stays in
    the plant only."""
    from quaternion_mpc_tpu.est import kf as kf_mod
    from quaternion_mpc_tpu.ops import lie as lie_mod

    grf_update = quat_mpc.make_controller(horizon, opts)

    def control_step(carry: EstimatedCarry, sp: ScenarioParams, joy: goals.JoyCommand):
        ps = carry.plant
        rot = lie_mod.quat_to_rotmat(ps.quat)
        # feet are pinned to the ground: leg kinematics reflect the TRUE
        # body pose, which is exactly what gives the KF height information
        foot_body = (carry.feet_world - ps.pos) @ rot
        # estimated feedback: KF position/velocity, IMU attitude/rates
        est_pos = carry.kf.x[0:3]
        est_vel = carry.kf.x[3:6]
        fbk = RobotFeedback(
            torso_pos_world=est_pos,
            torso_quat=ps.quat,
            torso_lin_vel_world=est_vel,
            torso_ang_vel_body=ps.omega,
            foot_pos_body=foot_body,
            foot_contact=jnp.ones((foot_body.shape[0],), dtype=ps.pos.dtype),
            joint_pos=jnp.zeros((12,), dtype=ps.pos.dtype),
            joint_vel=jnp.zeros((12,), dtype=ps.pos.dtype),
        )
        contacts = jnp.ones_like(fbk.foot_contact)
        goal, cmd = goals.goal_update(carry.goal, fbk, joy, contacts, dt=sp.wts.h)
        cmd = cmd._replace(
            pos_body_d=cmd.pos_body_d.at[2].set(sp.target_height - est_pos[2])
        )
        out, _sol = grf_update(fbk, cmd, sp.wts)

        dt_sub = sp.wts.h / plant_substeps
        pp = sp.plant_params._replace(foot_pos_body=foot_body)
        new_plant = ps
        for _ in range(plant_substeps):
            new_plant = plant.step(new_plant, out.grf_body, pp, dt_sub)

        # KF tick: IMU specific force = Σf_body / m (a_w = R·Σf/m + g)
        acc_body = jnp.sum(out.grf_body, axis=0) / sp.plant_params.mass
        rot_new = lie_mod.quat_to_rotmat(new_plant.quat)
        foot_body_new = (carry.feet_world - new_plant.pos) @ rot_new
        # leg odometry: feet fixed in world => J·dq = d/dt(Rᵀ(p_f − p))
        #             = −ω × foot_body − Rᵀ·v
        foot_vel_rel = jnp.broadcast_to(
            -(rot_new.T @ new_plant.vel), foot_body_new.shape
        ) - jnp.cross(
            jnp.broadcast_to(new_plant.omega, foot_body_new.shape), foot_body_new
        )
        kf_in = kf_mod.KFInputs(
            torso_rot_mat=rot_new,
            torso_lin_acc_body=acc_body,
            torso_ang_vel_body=new_plant.omega,
            foot_pos_body=foot_body_new,
            foot_lin_vel_rel=foot_vel_rel,
            contacts=contacts,
        )
        kf_state, _, _ = kf_mod.update(carry.kf, kf_in, sp.wts.h)

        ok = safety.is_safe(new_plant.quat, fbk.joint_vel)
        ok = ok & safety.finite_state(new_plant)
        alive = carry.alive & ok
        kept_plant = jax.tree.map(
            lambda new, old: jnp.where(alive, new, old), new_plant, ps
        )
        metrics = StepMetrics(
            mpc_cost=out.mpc_cost,
            height_err=jnp.abs(kept_plant.pos[2] - sp.target_height),
            att_err=1.0 - jnp.abs(jnp.sum(kept_plant.quat * cmd.quat_d)),
            alive=alive.astype(kept_plant.pos.dtype),
        )
        return (
            EstimatedCarry(
                plant=kept_plant, goal=goal, kf=kf_state,
                feet_world=carry.feet_world, alive=alive,
            ),
            metrics,
        )

    return control_step


def init_estimated_scenario(
    wts: quat_mpc.QuatMpcWeights,
    foot_pos_body,
    height: float = 0.3,
    dtype=jnp.float32,
):
    """Like `init_scenario` but with a BasicKF carry; the KF starts at the
    reference's canonical init (p=(0,0,0.09), BasicKF.cpp:59-71) and must
    converge to the true state during the run."""
    from quaternion_mpc_tpu.est import kf as kf_mod
    from quaternion_mpc_tpu.ops import lie as lie_mod

    base, sp = init_scenario(wts, foot_pos_body, height, dtype)
    rot = lie_mod.quat_to_rotmat(base.plant.quat)
    kf0 = kf_mod.init_state(rot, sp.plant_params.foot_pos_body, dtype=dtype)
    # ground-pinned feet: the KF's foot-height measurement assumes the
    # ground plane is z = 0, so stance feet must start there
    feet_world = base.plant.pos + jnp.asarray(foot_pos_body, dtype)
    feet_world = feet_world.at[:, 2].set(0.0)
    carry = EstimatedCarry(
        plant=base.plant, goal=base.goal, kf=kf0,
        feet_world=feet_world, alive=base.alive,
    )
    return carry, sp


def make_fleet_standing_step(
    horizon: int = 10,
    opts: SolverOptions = SolverOptions(al_iterations=2, ilqr_iterations=5),
    plant_substeps: int = 2,
    zero_initial_omega: bool = False,
):
    """Fleet-native standing step: batch-LEADING (carry, sp, joy) pytrees,
    but the MPC solve runs through the batch-last fleet solver (the ~8x
    faster TPU layout) instead of vmapping the per-scenario solver. The
    goal/plant/safety stages stay vmapped per-scenario functions, so the
    behavior matches `vmap(make_standing_step(...))` exactly up to solver
    fp ordering (same corrected zero_initial_omega=False default)."""
    fleet_grf = quat_mpc.make_fleet_controller(
        horizon, opts, zero_initial_omega=zero_initial_omega, return_body=True
    )

    def pre(carry: ScenarioCarry, sp: ScenarioParams, joy: goals.JoyCommand):
        fbk = feedback_from_plant(carry.plant, sp.plant_params.foot_pos_body)
        contacts = jnp.ones_like(fbk.foot_contact)
        goal, cmd = goals.goal_update(carry.goal, fbk, joy, contacts, dt=sp.wts.h)
        cmd = cmd._replace(
            pos_body_d=cmd.pos_body_d.at[2].set(sp.target_height - carry.plant.pos[2])
        )
        return fbk, cmd, goal

    def post(carry: ScenarioCarry, sp: ScenarioParams, goal, quat_d, grf_body, cost):
        dt_sub = sp.wts.h / plant_substeps
        new_plant = carry.plant
        for _ in range(plant_substeps):
            new_plant = plant.step(new_plant, grf_body, sp.plant_params, dt_sub)
        ok = safety.is_safe(new_plant.quat, jnp.zeros((12,), new_plant.pos.dtype))
        ok = ok & safety.finite_state(new_plant)
        alive = carry.alive & ok
        kept_plant = jax.tree.map(
            lambda new, old: jnp.where(alive, new, old), new_plant, carry.plant
        )
        metrics = StepMetrics(
            mpc_cost=cost,
            height_err=jnp.abs(kept_plant.pos[2] - sp.target_height),
            att_err=1.0 - jnp.abs(jnp.sum(kept_plant.quat * quat_d)),
            alive=alive.astype(kept_plant.pos.dtype),
        )
        return ScenarioCarry(plant=kept_plant, goal=goal, alive=alive), metrics

    def fleet_step(carry, sp, joy):
        fbk, cmd, goal = jax.vmap(pre)(carry, sp, joy)
        _, grf_body, cost = fleet_grf(fbk, cmd, sp.wts)
        return jax.vmap(post)(carry, sp, goal, cmd.quat_d, grf_body, cost)

    return fleet_step


def make_fleet_walking_step(
    horizon: int = 10,
    opts: SolverOptions = SolverOptions(al_iterations=2, ilqr_iterations=4),
    gait_freq: float = 2.2,
    pattern=None,
):
    """Fleet-native trot step: gait/kinematics/Raibert stages vmapped, the
    MPC solve through the batch-last fleet solver (see
    `make_fleet_standing_step`). Batch-leading (carry, sp, joy) pytrees."""
    from quaternion_mpc_tpu.gait import raibert as raibert_mod
    from quaternion_mpc_tpu.gait import schedule as sched_mod
    from quaternion_mpc_tpu.kin import leg as leg_mod

    if pattern is None:
        pattern = sched_mod.trot_pattern()
    fleet_grf = quat_mpc.make_fleet_controller(
        horizon, opts, zero_initial_omega=False, return_body=True
    )

    def pre(carry: WalkingCarry, sp: ScenarioParams, joy: goals.JoyCommand):
        ps = carry.plant
        dtype = ps.pos.dtype
        rot = lie.quat_to_rotmat(ps.quat)
        foot_pos_body = (carry.feet_world - ps.pos) @ rot
        rho_fix = leg_mod.go1_rho_fix(dtype)
        joint_pos = leg_mod.ik(foot_pos_body, rho_fix)
        contacts_now = sched_mod.contact_flags(carry.gait, pattern).astype(dtype)
        fbk = RobotFeedback(
            torso_pos_world=ps.pos,
            torso_quat=ps.quat,
            torso_lin_vel_world=ps.vel,
            torso_ang_vel_body=ps.omega,
            foot_pos_body=foot_pos_body,
            foot_contact=contacts_now,
            joint_pos=joint_pos.reshape(-1),
            joint_vel=jnp.zeros_like(joint_pos).reshape(-1),
        )
        vel_d_rel = jnp.stack([joy.velx, joy.vely, jnp.zeros_like(joy.velx)])
        default_rel = jnp.asarray(
            [[0.20, 0.14, -0.3], [0.20, -0.14, -0.3],
             [-0.20, 0.14, -0.3], [-0.20, -0.14, -0.3]], dtype=dtype)
        target_world, _ = raibert_mod.foothold_targets(
            ps.pos, ps.quat, ps.vel, vel_d_rel, default_rel, gait_freq
        )
        target_world = target_world.at[:, 2].set(0.0)
        gait = sched_mod.gait_update(
            carry.gait, pattern, sp.wts.h, jnp.asarray(gait_freq, dtype),
            carry.feet_world, target_world, contacts_now > 0.5,
        )
        plan_contacts = sched_mod.contact_flags(gait, pattern).astype(dtype)
        goal, cmd = goals.goal_update(carry.goal, fbk, joy, plan_contacts, dt=sp.wts.h)
        cmd = cmd._replace(
            pos_body_d=cmd.pos_body_d.at[2].set(sp.target_height - ps.pos[2])
        )
        return fbk, cmd, goal, gait, plan_contacts, foot_pos_body

    def post(carry, sp, joy, goal, gait, plan_contacts, foot_pos_body, grf_body, cost):
        ps = carry.plant
        dtype = ps.pos.dtype
        f_body = grf_body * plan_contacts[:, None]
        pp = sp.plant_params._replace(foot_pos_body=foot_pos_body)
        new_plant = plant.step(ps, f_body, pp, sp.wts.h)
        feet_world = jnp.where(
            plan_contacts[:, None] > 0.5, carry.feet_world, gait.target_pos
        )
        ok = safety.is_safe(new_plant.quat, jnp.zeros((12,), dtype))
        ok = ok & safety.finite_state(new_plant) & (new_plant.pos[2] > 0.05)
        alive = carry.alive & ok
        kept_plant = jax.tree.map(
            lambda new, old: jnp.where(alive, new, old), new_plant, ps
        )
        yaw = lie.quat_to_euler(kept_plant.quat)[2]
        vel_rel = lie.rotz(yaw).T @ kept_plant.vel
        metrics = WalkingMetrics(
            mpc_cost=cost,
            vel_err=jnp.abs(vel_rel[0] - joy.velx),
            height_err=jnp.abs(kept_plant.pos[2] - sp.target_height),
            alive=alive.astype(dtype),
        )
        return (
            WalkingCarry(plant=kept_plant, goal=goal, gait=gait,
                         feet_world=feet_world, alive=alive),
            metrics,
        )

    def fleet_step(carry, sp, joy):
        fbk, cmd, goal, gait, plan_contacts, foot_pos_body = jax.vmap(pre)(
            carry, sp, joy
        )
        _, grf_body, cost = fleet_grf(fbk, cmd, sp.wts)
        return jax.vmap(post)(
            carry, sp, joy, goal, gait, plan_contacts, foot_pos_body, grf_body, cost
        )

    return fleet_step
