"""Goal update: joystick command → filtered desired state (pure, explicit state).

Mirrors ``QuatMpc::goal_update`` (``QuatMpc.cpp:68-107``) and the desired-
quaternion integration in ``grf_update`` (:127-146): 100-sample moving-average
filters on body-frame velocity/position commands, desired-position integration
at the 5 ms outer-loop period, and q_d ← normalize(q_d + ½G(q_d)ω_d·dt).
Includes the sinusoidal attitude test mode (:140-146).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from quaternion_mpc_tpu.control.types import Command, RobotFeedback
from quaternion_mpc_tpu.ops import lie
from quaternion_mpc_tpu.utils import filters

OUTER_DT = 5.0 / 1000.0  # goal integration period (QuatMpc.cpp:97,132)
FILTER_WINDOW = 100       # MovingWindowFilter(100) (QuatMpc.cpp:10-11)


class JoyCommand(NamedTuple):
    velx: jnp.ndarray
    vely: jnp.ndarray
    body_height: jnp.ndarray
    roll_rate: jnp.ndarray
    pitch_rate: jnp.ndarray
    yaw_rate: jnp.ndarray
    sin_ang_vel: jnp.ndarray  # bool — sinusoidal attitude test mode


# ---------------------------------------------------------------------------
# Joystick mode state machine (BaseInterface.cpp:71-192)
# ---------------------------------------------------------------------------


class JoySample(NamedTuple):
    """One raw joystick sample (the joy_callback axis/button map,
    BaseInterface.cpp:71-133). Buttons are momentary press flags (bool);
    axes are pre-scaled command values."""

    velx: jnp.ndarray        # right stick up/down × velx_scale
    vely: jnp.ndarray        # right stick horiz × vely_scale
    velz: jnp.ndarray        # left stick up/down × height_vel (body height rate)
    roll_rate: jnp.ndarray   # cross left/right × roll_rate_scale
    pitch_rate: jnp.ndarray  # cross up/down × pitch_rate_scale
    yaw_rate: jnp.ndarray    # left stick horiz × yaw_rate_scale
    mode_switch: jnp.ndarray      # A — toggle walking/stand (bool)
    default_pos: jnp.ndarray      # B — toggle default-pose servo (bool)
    zero_torque: jnp.ndarray      # X — drop default-pose servo (bool)
    sin_ang_vel: jnp.ndarray      # Y — sinusoidal attitude test (bool)
    exit: jnp.ndarray             # LB — kill switch (bool)


def neutral_joy_sample(dtype=jnp.float32) -> JoySample:
    z = jnp.zeros((), dtype)
    f = jnp.asarray(False)
    return JoySample(velx=z, vely=z, velz=z, roll_rate=z, pitch_rate=z,
                     yaw_rate=z, mode_switch=f, default_pos=f,
                     zero_torque=f, sin_ang_vel=f, exit=f)


class ModeState(NamedTuple):
    """Explicit joystick/mode machine state (LeggedJoyCmd fields that the
    reference mutates in joy_callback/joy_update, BaseInterface.cpp:135-192)."""

    ctrl_state: jnp.ndarray       # int32 0 stand / 1 walk (A toggles)
    prev_ctrl_state: jnp.ndarray
    set_default_pos: jnp.ndarray  # bool (B toggles, X clears)
    body_height: jnp.ndarray      # integrated height target, clamped
    exit: jnp.ndarray             # latched kill


def init_mode_state(body_height: float = 0.3, dtype=jnp.float32) -> ModeState:
    return ModeState(
        ctrl_state=jnp.zeros((), jnp.int32),
        prev_ctrl_state=jnp.zeros((), jnp.int32),
        set_default_pos=jnp.asarray(False),
        body_height=jnp.asarray(body_height, dtype),
        exit=jnp.asarray(False),
    )


# joystick height clamp (LeggedState.cpp joystick_{min,max}_height defaults)
JOY_MIN_HEIGHT = 0.1
JOY_MAX_HEIGHT = 0.35


def joy_mode_update(
    state: ModeState, joy: JoySample, dt=OUTER_DT
) -> tuple[ModeState, JoyCommand, jnp.ndarray]:
    """One joy_update tick (BaseInterface.cpp:135-192): integrate the body
    height target, toggle ctrl_state on the A edge, default-pose on B,
    and derive movement_mode (0 stand / 1 walk).

    Returns (new_state, JoyCommand for goal_update, movement_mode int32).
    Edge semantics match the reference: a press is consumed the tick it is
    processed (the *_request flags live for exactly one joy_update)."""
    dtype = state.body_height.dtype
    exit_ = state.exit | joy.exit

    body_height = jnp.clip(
        state.body_height + joy.velz * dt, JOY_MIN_HEIGHT, JOY_MAX_HEIGHT
    )
    ctrl_state = jnp.where(
        joy.mode_switch, (state.ctrl_state + 1) % 2, state.ctrl_state
    )
    set_default = jnp.where(
        joy.default_pos, ~state.set_default_pos, state.set_default_pos
    )
    set_default = jnp.where(joy.zero_torque, jnp.asarray(False), set_default)

    movement_mode = jnp.where(
        ctrl_state == 1, jnp.asarray(1, jnp.int32), jnp.asarray(0, jnp.int32)
    )
    cmd = JoyCommand(
        velx=joy.velx.astype(dtype),
        vely=joy.vely.astype(dtype),
        body_height=body_height,
        roll_rate=joy.roll_rate.astype(dtype),
        pitch_rate=joy.pitch_rate.astype(dtype),
        yaw_rate=joy.yaw_rate.astype(dtype),
        sin_ang_vel=joy.sin_ang_vel,
    )
    new_state = ModeState(
        ctrl_state=ctrl_state,
        prev_ctrl_state=state.ctrl_state,
        set_default_pos=set_default,
        body_height=body_height,
        exit=exit_,
    )
    return new_state, cmd, movement_mode


class GoalState(NamedTuple):
    torso_pos_d_world: jnp.ndarray  # (3,)
    quat_d: jnp.ndarray             # (4,)
    vel_filter: filters.WindowState  # body-frame velocity command filter (3 ch)
    pos_filter: filters.WindowState  # body-frame position error filter (3 ch)
    attitude_count: jnp.ndarray     # sin test counter


def init_goal_state(fbk: RobotFeedback, window: int = FILTER_WINDOW) -> GoalState:
    dtype = fbk.torso_quat.dtype
    ident = jnp.zeros((4,), dtype=dtype).at[0].set(1.0)
    return GoalState(
        torso_pos_d_world=fbk.torso_pos_world,
        quat_d=ident,
        vel_filter=filters.window_init(window, (3,), dtype),
        pos_filter=filters.window_init(window, (3,), dtype),
        attitude_count=jnp.zeros((), dtype=dtype),
    )


def goal_update(
    state: GoalState,
    fbk: RobotFeedback,
    joy: JoyCommand,
    contacts: jnp.ndarray,
    dt=OUTER_DT,
) -> Tuple[GoalState, Command]:
    """One goal-update tick. ``dt`` is the caller's loop period — the
    reference hard-codes 5 ms because its MPC thread runs at 5 ms
    (QuatMpc.cpp:97,132); a fused runtime stepping at the solver period must
    pass its own dt or the integrated position/attitude targets lag."""
    dtype = fbk.torso_quat.dtype
    rot = lie.quat_to_rotmat(fbk.torso_quat)
    yaw = lie.quat_to_euler(fbk.torso_quat)[2]
    rot_z = lie.rotz(yaw)

    # velocity goal: joystick in yaw frame → world → body, filtered (:80-89)
    vel_d_rel = jnp.stack([joy.velx, joy.vely, jnp.zeros_like(joy.velx)])
    vel_d_world = rot_z @ vel_d_rel
    vel_d_body = rot.T @ vel_d_world
    vel_filter, vel_d_body_f = filters.window_update(state.vel_filter, vel_d_body)

    # desired position integration (:96-99); integrate in the state dtype —
    # a weakly-typed f64 dt from a caller must not promote the scatter
    pos_d_world = state.torso_pos_d_world
    delta = (vel_d_world * dt).astype(pos_d_world.dtype)
    pos_d_world = pos_d_world.at[0].add(delta[0])
    pos_d_world = pos_d_world.at[1].add(delta[1])
    pos_d_world = pos_d_world.at[2].set(
        jnp.asarray(joy.body_height, pos_d_world.dtype)
    )
    pos_d_body = rot.T @ (pos_d_world - fbk.torso_pos_world)
    pos_filter, pos_d_body_f = filters.window_update(state.pos_filter, pos_d_body)

    # desired attitude integration (:127-137)
    ang_vel_d = jnp.stack([joy.roll_rate, joy.pitch_rate, joy.yaw_rate])
    quat_d = state.quat_d + 0.5 * (lie.quat_G(state.quat_d) @ ang_vel_d) * dt
    quat_d = lie.quat_normalize(quat_d)

    # sinusoidal attitude test mode (:140-146)
    amp = 3.14 / 8.0
    phase = 2.0 * 3.14 / 900.0 * state.attitude_count
    sin_euler = jnp.full((3,), amp * jnp.sin(phase), dtype=dtype)
    quat_sin = lie.euler_to_quat(sin_euler)
    quat_d = jnp.where(joy.sin_ang_vel, quat_sin, quat_d)
    attitude_count = state.attitude_count + joy.sin_ang_vel.astype(dtype)

    new_state = GoalState(
        torso_pos_d_world=pos_d_world,
        quat_d=quat_d,
        vel_filter=vel_filter,
        pos_filter=pos_filter,
        attitude_count=attitude_count,
    )
    cmd = Command(
        pos_body_d=pos_d_body_f,
        lin_vel_body_d=vel_d_body_f,
        quat_d=quat_d,
        ang_vel_body_d=ang_vel_d,
        contacts=contacts,
    )
    return new_state, cmd
