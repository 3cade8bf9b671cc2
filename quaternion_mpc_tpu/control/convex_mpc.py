"""Euler convex-MPC baseline controller (reference: ``src/mpc/ConvexMpc.cpp``).

World-frame Euler SRB with yaw-ramped references (:95-114), plain LQR cost
(:147-151), world-frame friction pyramid with analytic constant Jacobian
(:15-33), and body-frame extraction of the first input (:188-192).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from quaternion_mpc_tpu.control.quat_mpc import GRAVITY, cone_matrix
from quaternion_mpc_tpu.control.types import Command, ControlOutput, RobotFeedback
from quaternion_mpc_tpu.models.srb import SrbParams, euler_srb_dynamics, euler_srb_jacobian
from quaternion_mpc_tpu.ops import lie
from quaternion_mpc_tpu.solver import (
    CostSpec,
    ModelSpec,
    SolverOptions,
    TrajOptProblem,
    make_solver,
)
from quaternion_mpc_tpu.utils import config as cfg_mod


class ConvexMpcWeights(NamedTuple):
    Qd: jnp.ndarray          # (12,) [rpy, p, ω, v] order
    Rd: jnp.ndarray          # (12,)
    mu: jnp.ndarray
    fz_max: jnp.ndarray
    mass: jnp.ndarray
    inertia: jnp.ndarray     # (3,3) trunk inertia (world model rotates by yaw)
    h: jnp.ndarray


def weights_from_config(cfg: cfg_mod.FrameworkConfig, dtype=jnp.float32) -> ConvexMpcWeights:
    m, r = cfg.mpc, cfg.robot
    return ConvexMpcWeights(
        Qd=jnp.asarray(m.q_weights[:12], dtype=dtype),
        Rd=jnp.asarray(m.r_weights, dtype=dtype),
        mu=jnp.asarray(m.mu, dtype=dtype),
        fz_max=jnp.asarray(m.fz_max, dtype=dtype),
        mass=jnp.asarray(r.mass, dtype=dtype),
        inertia=jnp.asarray(np.diag(r.trunk_inertia), dtype=dtype),
        h=jnp.asarray(m.update_period_ms / 1000.0, dtype=dtype),
    )


MODEL_SPEC = ModelSpec(
    nx=12, nu=12, f=euler_srb_dynamics, fj=euler_srb_jacobian, quat_idx=None
)


def build_problem(
    fbk: RobotFeedback,
    cmd: Command,
    wts: ConvexMpcWeights,
    horizon: int,
) -> TrajOptProblem:
    """x = [rpy, p_world, ω_world, v_world] (ConvexMpc.cpp:95-114, 156-167)."""
    dtype = fbk.torso_quat.dtype
    n_feet = fbk.foot_pos_body.shape[-2]
    rot = lie.quat_to_rotmat(fbk.torso_quat)
    euler = lie.quat_to_euler(fbk.torso_quat)

    num_contacts = jnp.maximum(jnp.sum(cmd.contacts), 1.0)
    fz_share = cmd.contacts * wts.mass * GRAVITY / num_contacts
    u_ref_k = jnp.concatenate(
        [jnp.zeros((n_feet, 2), dtype=dtype), fz_share[:, None]], axis=-1
    ).reshape(-1)
    u_ref = jnp.tile(u_ref_k, (horizon + 1, 1))

    steps = jnp.arange(horizon + 1, dtype=dtype)
    yaw_ref = euler[2] + cmd.ang_vel_body_d[2] * wts.h * steps
    zeros = jnp.zeros_like(yaw_ref)
    # desired world position/velocity from the body-frame command
    rot_z = lie.rotz(euler[2])
    vel_d_world = rot_z @ cmd.lin_vel_body_d
    pos_d_world = fbk.torso_pos_world + rot @ cmd.pos_body_d
    x_ref = jnp.stack(
        [
            zeros,
            zeros,
            yaw_ref,
            jnp.full_like(yaw_ref, pos_d_world[0]),
            jnp.full_like(yaw_ref, pos_d_world[1]),
            jnp.full_like(yaw_ref, pos_d_world[2]),
            zeros,
            zeros,
            jnp.full_like(yaw_ref, cmd.ang_vel_body_d[2]),
            jnp.full_like(yaw_ref, vel_d_world[0]),
            jnp.full_like(yaw_ref, vel_d_world[1]),
            zeros,
        ],
        axis=-1,
    )

    # feet in the "absolute CoM" frame: R · foot_pos_body (BaseInterface.cpp:223)
    foot_pos_abs = fbk.foot_pos_body @ rot.T
    params = SrbParams(
        foot_pos=foot_pos_abs,
        inertia=wts.inertia,
        mass=wts.mass,
        com_offset=jnp.zeros((3,), dtype=dtype),
        com_mass=jnp.zeros((), dtype=dtype),
        rot_body_to_world=rot,
    )

    C = cone_matrix(wts.mu, dtype)  # world frame (no rotation, ConvexMpc.cpp:130-140)
    Cu = jnp.kron(jnp.eye(n_feet, dtype=dtype), C)
    cb = jnp.zeros((6 * n_feet,), dtype=dtype)
    cb = cb.at[4::6].set(-wts.fz_max * cmd.contacts)

    omega_world = rot @ fbk.torso_ang_vel_body
    x0 = jnp.concatenate(
        [euler, fbk.torso_pos_world, omega_world, fbk.torso_lin_vel_world]
    )
    return TrajOptProblem(
        x0=x0,
        cost=CostSpec(
            Qd=wts.Qd, Rd=wts.Rd, w=jnp.zeros((), dtype), x_ref=x_ref, u_ref=u_ref
        ),
        Cu=Cu,
        cb=cb,
        h=wts.h,
        params=params,
        us_init=u_ref[:horizon],
    )


def make_controller(
    horizon: int,
    opts: SolverOptions = SolverOptions(al_iterations=1, ilqr_iterations=5),
):
    """iterations_max=5 online (ConvexMpc.cpp:37)."""
    solver = make_solver(MODEL_SPEC, opts)

    def grf_update(fbk: RobotFeedback, cmd: Command, wts: ConvexMpcWeights):
        prob = build_problem(fbk, cmd, wts, horizon)
        sol = solver(prob)
        rot = lie.quat_to_rotmat(fbk.torso_quat)
        grf_world = sol.us[0].reshape(-1, 3)
        out = ControlOutput(
            grf_body=grf_world @ rot,  # Rᵀ·u per leg (ConvexMpc.cpp:190-192)
            grf_world=grf_world,
            foot_pos_target_world=jnp.zeros_like(fbk.foot_pos_body),
            foot_vel_target_world=jnp.zeros_like(fbk.foot_pos_body),
            mpc_cost=sol.stats.cost,
            mpc_iterations=sol.stats.iterations,
        )
        return out, sol

    return grf_update


# LeggedMpc::terrain_update parity — the reference ConvexMpc's hook is a
# no-op (ConvexMpc.cpp:225-227); the functional estimator is shared with the
# quaternion controller (kin.terrain).
from quaternion_mpc_tpu.kin.terrain import (  # noqa: E402,F401
    TerrainState,
    init_terrain_state,
    terrain_update,
)
