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

    # per-knot contact gating as in quat_mpc.build_problem: cmd.contacts is
    # (n_feet,) shared or (N+1, n_feet) time-varying
    contacts_k = jnp.broadcast_to(cmd.contacts, (horizon + 1, n_feet))
    num_contacts = jnp.maximum(jnp.sum(contacts_k, axis=-1, keepdims=True), 1.0)
    fz_share = contacts_k * wts.mass * GRAVITY / num_contacts
    u_ref = jnp.concatenate(
        [jnp.zeros((horizon + 1, n_feet, 2), dtype=dtype), fz_share[..., None]],
        axis=-1,
    ).reshape(horizon + 1, -1)

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
    if cmd.contacts.ndim == 1:
        cb = jnp.zeros((6 * n_feet,), dtype=dtype)
        cb = cb.at[4::6].set(-wts.fz_max * cmd.contacts)
    else:
        cb = jnp.zeros((horizon + 1, 6 * n_feet), dtype=dtype)
        cb = cb.at[:, 4::6].set(-wts.fz_max * contacts_k)

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


# ---------------------------------------------------------------------------
# Fleet-native (batch-last) path — mirrors quat_mpc.make_fleet_controller
# ---------------------------------------------------------------------------


def build_fleet_problem(fbk, cmd, wts, horizon: int):
    """Batch-first (fbk, cmd, wts) pytrees -> batch-last FleetProblem."""
    import jax

    from quaternion_mpc_tpu.models import srb as srb_mod
    from quaternion_mpc_tpu.solver.fleet import FleetProblem

    prob_bf = jax.vmap(lambda f, c, w: build_problem(f, c, w, horizon))(
        fbk, cmd, wts
    )
    bl = lambda a: jnp.moveaxis(a, 0, -1)
    return FleetProblem(
        x0=bl(prob_bf.x0),
        x_ref=jnp.moveaxis(prob_bf.cost.x_ref, 0, -1),
        u_ref=jnp.moveaxis(prob_bf.cost.u_ref, 0, -1),
        Qd=bl(prob_bf.cost.Qd),
        Rd=bl(prob_bf.cost.Rd),
        w=prob_bf.cost.w,
        Cu=bl(prob_bf.Cu),
        cb=bl(prob_bf.cb),
        h=prob_bf.h,
        params=srb_mod.params_to_fleet(prob_bf.params, batch_axis=True),
        us_init=jnp.moveaxis(prob_bf.us_init, 0, -1),
    )


FLEET_MODEL_SPEC = None


def _fleet_spec():
    global FLEET_MODEL_SPEC
    if FLEET_MODEL_SPEC is None:
        from quaternion_mpc_tpu.models.srb import (
            euler_srb_dynamics_fleet,
            euler_srb_jacobian_fleet,
        )
        from quaternion_mpc_tpu.solver.fleet import FleetModelSpec

        FLEET_MODEL_SPEC = FleetModelSpec(
            nx=12,
            nu=12,
            f=euler_srb_dynamics_fleet,
            fj=euler_srb_jacobian_fleet,
            quat_idx=None,
            integrator="midpoint",
        )
    return FLEET_MODEL_SPEC


def make_fleet_controller(
    horizon: int,
    opts: SolverOptions = SolverOptions(al_iterations=1, ilqr_iterations=5),
    return_body: bool = False,
    return_sol: bool = False,
):
    """Batch-last convex grf_update over a whole fleet: batch-FIRST
    (fbk, cmd, wts) pytrees in, (grf_world (B, n_feet, 3)[, grf_body], cost)
    out — same surface as quat_mpc.make_fleet_controller (including the
    optional batch-first ``us_init``/``lam_init`` warm starts and
    return_sol) so the runtime steps can route on the `controller` key."""
    from quaternion_mpc_tpu.solver.fleet import make_fleet_solver

    solver = make_fleet_solver(_fleet_spec(), opts)

    def grf_update(fbk, cmd, wts, us_init=None, lam_init=None):
        prob = build_fleet_problem(fbk, cmd, wts, horizon)
        if us_init is not None:
            prob = prob._replace(us_init=jnp.moveaxis(us_init, 0, -1))
        if lam_init is not None:
            prob = prob._replace(lam_init=jnp.moveaxis(lam_init, 0, -1))
        sol = solver(prob)
        u0 = jnp.moveaxis(sol.us[0], -1, 0)  # (B, 12) world frame
        grf_world = u0.reshape(u0.shape[0], -1, 3)
        rot = lie.quat_to_rotmat(fbk.torso_quat)  # (B, 3, 3)
        grf_body = jnp.einsum("bij,bfi->bfj", rot, grf_world)  # Rᵀ·u rows
        out = (grf_world, grf_body, sol.cost) if return_body else (grf_world, sol.cost)
        if return_sol:
            return out + (sol,)
        return out

    return grf_update


# LeggedMpc::terrain_update parity — the reference ConvexMpc's hook is a
# no-op (ConvexMpc.cpp:225-227); the functional estimator is shared with the
# quaternion controller (kin.terrain).
from quaternion_mpc_tpu.kin.terrain import (  # noqa: E402,F401
    TerrainState,
    init_terrain_state,
    terrain_update,
)
