"""Joint-level actuated plant: torso SRB + four 3-DoF legs driven by joint
torques, feet interacting with the terrain through a penetration
spring-damper contact model.

This is the tier where the low-level control stack actually earns its keep —
the closed loop applies MPC GRFs only through the torque layer
(``control/torque.py``: swing IK targets + PD, stance τ = −Jᵀf — the
reference's 4 kHz path, ``BaseInterface.cpp:344-408`` +
``unitree_legged_control/src/joint_controller.cpp:15-229``), and ground
reaction forces emerge from contact physics instead of being realized
ideally. Role parity with Gazebo + the ros_control effort plugin
(``unitree_gazebo/``), built batched/jittable so a fleet of articulated
robots integrates on-device.

Model tier (documented approximations):
- torso: full SRB (gyroscopic term kept) forced by the contact forces at
  the world-frame foot points;
- legs: each a 3-DoF Lagrangian chain (`kin.leg_dynamics`: autodiff mass
  matrix + bias forces, Go1 URDF link parameters) integrated in the torso
  frame; base-motion inertial coupling into the leg chains is neglected
  (legs ≈ 12% of total mass) but leg gravity follows the true attitude and
  contact forces enter the joints through Jᵀ;
- contact: compliant ground — normal spring-damper on terrain penetration
  (one-sided), tangential viscous friction clamped to the Coulomb cone μ·fn.
  Same role as Gazebo's ODE contact (kp/kd surface params).

Integration: semi-implicit Euler at a fixed substep (default 4 kHz, the
reference's low-level rate, ``LeggedParams.h:5``) inside a `lax.scan`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from quaternion_mpc_tpu.control.torque import JointTargets, pd_torque
from quaternion_mpc_tpu.kin import leg as leg_mod
from quaternion_mpc_tpu.kin import leg_dynamics as ld
from quaternion_mpc_tpu.ops import lie
from quaternion_mpc_tpu.sim import plant as plant_mod
from quaternion_mpc_tpu.sim import terrain as terrain_mod


class ArticulatedParams(NamedTuple):
    torso: plant_mod.PlantParams       # foot_pos_body field unused here
    rho_fix: jnp.ndarray               # (4, 5) per-leg kinematic params
    leg_params: ld.LegLinkParams       # stacked (4, ...) link params
    terrain: terrain_mod.TerrainParams
    contact_kp: jnp.ndarray            # normal spring [N/m]
    contact_kd: jnp.ndarray            # normal damper [N·s/m]
    contact_kt: jnp.ndarray            # tangential (slip) damper [N·s/m]
    contact_kt_spring: jnp.ndarray     # tangential anchor spring [N/m]
    mu: jnp.ndarray                    # Coulomb friction coefficient
    kp_joint: jnp.ndarray              # (3,) or (4,3) PD gains (send law)
    kd_joint: jnp.ndarray
    tau_max: jnp.ndarray               # actuator torque limit [N·m]


class ArticulatedState(NamedTuple):
    torso: plant_mod.PlantState
    q: jnp.ndarray       # (4, 3) joint angles
    dq: jnp.ndarray      # (4, 3) joint velocities
    anchor: jnp.ndarray  # (4, 3) world-frame stick-friction anchors


def default_params(
    wts_mass, wts_inertia, com_offset, com_mass,
    terrain: terrain_mod.TerrainParams,
    dtype=jnp.float32,
) -> ArticulatedParams:
    """Go1 articulated plant. Contact stiffness sized for ~2 mm static
    penetration (kp = 30 kN/m vs ~63 N/foot standing); joint PD from the
    reference's Gazebo swing gains (kp_foot scale, LeggedState.cpp defaults);
    τ limit 33.5 N·m (Go1 joint spec, go1.urdf effort limits)."""
    return ArticulatedParams(
        torso=plant_mod.PlantParams(
            mass=jnp.asarray(wts_mass, dtype),
            inertia=jnp.asarray(wts_inertia, dtype),
            com_offset=jnp.asarray(com_offset, dtype),
            com_mass=jnp.asarray(com_mass, dtype),
            foot_pos_body=jnp.zeros((4, 3), dtype),
        ),
        rho_fix=leg_mod.go1_rho_fix(dtype),
        leg_params=_go1_leg_params_all(dtype),
        terrain=terrain,
        contact_kp=jnp.asarray(30000.0, dtype),
        contact_kd=jnp.asarray(500.0, dtype),
        contact_kt=jnp.asarray(500.0, dtype),
        contact_kt_spring=jnp.asarray(15000.0, dtype),
        mu=jnp.asarray(0.7, dtype),
        kp_joint=jnp.asarray([80.0, 80.0, 90.0], dtype),
        kd_joint=jnp.asarray([2.0, 2.0, 2.5], dtype),
        tau_max=jnp.asarray(33.5, dtype),
    )


def _go1_leg_params_all(dtype):
    legs = [
        ld.go1_leg_params(mirror_y=False, dtype=dtype),  # FL
        ld.go1_leg_params(mirror_y=True, dtype=dtype),   # FR
        ld.go1_leg_params(mirror_y=False, dtype=dtype),  # RL
        ld.go1_leg_params(mirror_y=True, dtype=dtype),   # RR
    ]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *legs)


def init_state(
    height: float = 0.3,
    foot_pos_body=None,
    rho_fix=None,
    dtype=jnp.float32,
) -> ArticulatedState:
    """Start standing: joints at the IK of the default stance."""
    if rho_fix is None:
        rho_fix = leg_mod.go1_rho_fix(dtype)
    if foot_pos_body is None:
        foot_pos_body = jnp.asarray(
            [[0.20, 0.14, -height], [0.20, -0.14, -height],
             [-0.20, 0.14, -height], [-0.20, -0.14, -height]], dtype)
    q = leg_mod.ik(jnp.asarray(foot_pos_body, dtype), rho_fix)
    torso = plant_mod.init_state(height=height, dtype=dtype)
    # stick anchors start at the initial world foot points
    anchor = jnp.asarray(foot_pos_body, dtype) + torso.pos
    return ArticulatedState(
        torso=torso,
        q=q,
        dq=jnp.zeros_like(q),
        anchor=anchor,
    )


def foot_kinematics(s: ArticulatedState, p: ArticulatedParams):
    """World-frame foot positions and velocities from the joint state.

    foot_world = p_torso + R·fk(q);  v_foot = v + R(ω × fk(q) + J·dq).
    Returns (foot_body (4,3), foot_world (4,3), foot_vel_world (4,3), J (4,3,3)).
    """
    rot = lie.quat_to_rotmat(s.torso.quat)
    foot_body = leg_mod.fk(s.q, p.rho_fix)
    J = leg_mod.jac(s.q, p.rho_fix)
    foot_world = s.torso.pos + foot_body @ rot.T
    v_rel_body = jnp.cross(
        jnp.broadcast_to(s.torso.omega, foot_body.shape), foot_body
    ) + jnp.einsum("lij,lj->li", J, s.dq)
    foot_vel_world = s.torso.vel + v_rel_body @ rot.T
    return foot_body, foot_world, foot_vel_world, J


def contact_forces(foot_world, foot_vel_world, p: ArticulatedParams,
                   anchor=None):
    """World-frame ground reaction per foot (4, 3): one-sided normal
    spring-damper on penetration + stick-slip tangential friction. Normal
    from the terrain field (slope-aware).

    Tangential model (the role of ODE's contact constraint in Gazebo):
    a STICKING foot stores an anchor point; the friction force is an
    anchor-spring + damper, clamped to the Coulomb cone μ·fn. When the
    clamp engages the foot SLIPS and the anchor is dragged along so the
    spring holds exactly the cone-limit force. A purely viscous model
    (no anchor) cannot produce static friction: any contact chatter then
    rectifies into a steady glide, which is exactly the standing-drift
    failure this model exists to prevent.

    With ``anchor=None`` falls back to viscous-only (legacy callers that
    carry no anchor state). Otherwise returns ``(f_world, new_anchor)``.
    """
    # box-SDF contact geometry: riser faces push horizontally (see
    # terrain.contact_geometry — the naive height-field read turns a
    # riser graze into a rise-deep vertical force bomb)
    n, pen = terrain_mod.contact_geometry(p.terrain, foot_world)
    v_n = jnp.sum(foot_vel_world * n, axis=-1)                  # (4,)
    fn = p.contact_kp * pen - p.contact_kd * v_n
    fn = jnp.where(pen > 0.0, jnp.maximum(fn, 0.0), 0.0)        # one-sided
    v_t = foot_vel_world - v_n[:, None] * n
    if anchor is None:
        ft = -p.contact_kt * v_t
        ft_norm = jnp.linalg.norm(ft, axis=-1, keepdims=True)
        scale = jnp.minimum(
            1.0, p.mu * fn[:, None] / jnp.maximum(ft_norm, 1e-9)
        )
        return fn[:, None] * n + ft * scale

    # tangential displacement from the anchor, projected off the normal
    disp = foot_world - anchor
    disp_t = disp - jnp.sum(disp * n, axis=-1, keepdims=True) * n
    ft_raw = -p.contact_kt_spring * disp_t - p.contact_kt * v_t
    ft_norm = jnp.linalg.norm(ft_raw, axis=-1, keepdims=True)
    ft_max = p.mu * fn[:, None]
    scale = jnp.minimum(1.0, ft_max / jnp.maximum(ft_norm, 1e-9))
    ft = ft_raw * scale
    in_contact = (pen > 0.0)[:, None]
    slipping = in_contact & (ft_norm > ft_max)
    # slip: drag the anchor so the spring alone would hold the clamped force
    anchor_slip = foot_world + ft / p.contact_kt_spring
    new_anchor = jnp.where(
        in_contact, jnp.where(slipping, anchor_slip, anchor), foot_world
    )
    return fn[:, None] * n + ft * in_contact, new_anchor


def substep(s: ArticulatedState, targets: JointTargets, p: ArticulatedParams, dt,
            ext=None):
    """One physics substep under the explicit PD+τff send law (the Gazebo
    joint controller evaluated at sim rate against zero-order-hold targets,
    ``GazeboInterface.cpp:116-124``).

    ``ext``: optional `plant.ExtWrench` disturbance on the torso (push
    injection, counterpart of ``unitree_controller/src/external_force.cpp``)."""
    rot = lie.quat_to_rotmat(s.torso.quat)
    foot_body, foot_world, foot_vel_world, J = foot_kinematics(s, p)
    f_world, anchor = contact_forces(
        foot_world, foot_vel_world, p, s.anchor
    )                                                           # (4, 3)
    f_body = f_world @ rot                                      # rows Rᵀ f

    # actuator torque: explicit PD + feedforward, clamped (PowerProtect analog)
    tau = pd_torque(targets, s.q, s.dq, p.kp_joint, p.kd_joint)
    tau = jnp.clip(tau, -p.tau_max, p.tau_max)

    # leg chains: M(q)·q̈ = τ − c(q, q̇) + Jᵀ f_body (leg gravity via true attitude)
    g_body = rot.T @ jnp.array([0.0, 0.0, -plant_mod.GRAVITY], dtype=s.q.dtype)

    def leg_acc(qi, dqi, taui, fi, Ji, rho_i, params_i):
        M = ld.mass_matrix(qi, rho_i, params_i)
        c = ld.bias_forces(qi, dqi, rho_i, params_i, g_body)
        rhs = taui - c + Ji.T @ fi
        return jnp.linalg.solve(M, rhs)

    ddq = jax.vmap(leg_acc)(
        s.q, s.dq, tau, f_body, J, p.rho_fix, p.leg_params
    )

    # torso SRB forced by the contact forces at the foot points
    tp = p.torso._replace(foot_pos_body=foot_body)
    deriv = plant_mod.dynamics(s.torso, f_body, tp, ext)

    # semi-implicit Euler: velocities first, then positions with new velocities
    dq_new = s.dq + dt * ddq
    vel_new = s.torso.vel + dt * deriv.vel
    omega_new = s.torso.omega + dt * deriv.omega
    q_new = s.q + dt * dq_new
    pos_new = s.torso.pos + dt * vel_new
    quat_new = lie.quat_normalize(
        s.torso.quat + dt * 0.5 * (lie.quat_G(s.torso.quat) @ omega_new)
    )
    return ArticulatedState(
        torso=plant_mod.PlantState(
            pos=pos_new, quat=quat_new, vel=vel_new, omega=omega_new
        ),
        q=q_new,
        dq=dq_new,
        anchor=anchor,
    )


def step(
    s: ArticulatedState,
    targets: JointTargets,
    p: ArticulatedParams,
    dt_ctrl,
    n_sub: int = 80,
    ext=None,
) -> ArticulatedState:
    """Integrate one control period (default: 80 × 0.125 ms per 10 ms MPC
    tick) with zero-order-hold joint targets; PD is re-evaluated against
    the live joint state every substep, exactly like the ros_control
    effort plugin (the reference's 4 kHz is its CONTROL rate; Gazebo's
    internal physics integrates finer).

    The 0.125 ms substep is a stability requirement, not a luxury: the
    contact spring acting through the low-inertia leg chains creates a
    ~500 rad/s overdamped mode, and at 0.25 ms the semi-implicit Euler
    turns a static stand into a hopping limit cycle whose rectified
    friction drifts the robot at ~5 cm/s (measured); at 0.125 ms the same
    stand settles to exact static equilibrium (Σfz = m·g, dq = 0)."""
    dt = dt_ctrl / n_sub

    def body(state, _):
        return substep(state, targets, p, dt, ext), None

    out, _ = jax.lax.scan(body, s, None, length=n_sub)
    return out
