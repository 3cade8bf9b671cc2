"""Synchronous (threadless) replica of the hardware loopback control cycle
for debugging the standing drift: control tick + articulated plant step,
printing true/estimated state and GRFs per tick."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from quaternion_mpc_tpu.control import goals, quat_mpc
from quaternion_mpc_tpu.control import torque as torque_mod
from quaternion_mpc_tpu.est import kf as kf_mod
from quaternion_mpc_tpu.kin import leg as leg_mod
from quaternion_mpc_tpu.ops import lie
from quaternion_mpc_tpu.runtime import hardware_loop as hw
from quaternion_mpc_tpu.sim import articulated as art_mod
from quaternion_mpc_tpu.sim import terrain as terrain_mod
from quaternion_mpc_tpu.solver import SolverOptions
from quaternion_mpc_tpu.utils import config as cfg_mod

dtype = jnp.float32
target_height = 0.3
mpc_rate, low_rate = 50.0, 250.0
dt_ctrl, dt_low = 1.0 / mpc_rate, 1.0 / low_rate

wts = quat_mpc.weights_from_config(cfg_mod.gazebo_go1_quat_mpc(), dtype=dtype)
terrain = terrain_mod.make_terrain("flat", dtype=dtype)
ap = art_mod.default_params(
    wts.mass, wts.inertia, wts.com_offset, wts.trunk_mass, terrain, dtype
)
rs = art_mod.init_state(height=target_height, rho_fix=ap.rho_fix, dtype=dtype)

tick_fn = jax.jit(hw.make_hw_control_tick(6, SolverOptions(al_iterations=1, ilqr_iterations=3)))


def observe(rs, rs_prev, dt):
    _, foot_world, foot_vel_world, _ = art_mod.foot_kinematics(rs, ap)
    f_world = art_mod.contact_forces(foot_world, foot_vel_world, ap)
    n_vec = terrain_mod.normal(ap.terrain, foot_world[..., :2])
    f_normal = jnp.sum(f_world * n_vec, axis=-1)
    a_world = (rs.torso.vel - rs_prev.torso.vel) / dt
    rot = lie.quat_to_rotmat(rs.torso.quat)
    accel_body = rot.T @ (a_world + jnp.array([0.0, 0.0, 9.81], dtype))
    return hw.HWSensors(
        quat=rs.torso.quat, gyro=rs.torso.omega, accel=accel_body,
        q=rs.q.reshape(-1), dq=rs.dq.reshape(-1), foot_force=f_normal,
    ), f_world


peer_step = jax.jit(
    lambda rs, cm: art_mod.step(
        rs,
        torque_mod.JointTargets(q=cm[..., 0], dq=cm[..., 1], tau=cm[..., 2]),
        ap._replace(kp_joint=cm[..., 3], kd_joint=cm[..., 4]),
        dt_ctrl,
        int(dt_ctrl / 0.000125),
    )
)

rs_prev = rs
sensors, f_world = observe(rs, rs_prev, dt_ctrl)
rot0 = lie.quat_to_rotmat(sensors.quat)
foot_body0 = leg_mod.fk(sensors.q.reshape(4, 3), ap.rho_fix)
from quaternion_mpc_tpu.control.types import RobotFeedback

fbk0 = RobotFeedback(
    torso_pos_world=jnp.array([0.0, 0.0, 0.09], dtype),
    torso_quat=sensors.quat,
    torso_lin_vel_world=jnp.zeros(3, dtype),
    torso_ang_vel_body=sensors.gyro,
    foot_pos_body=foot_body0,
    foot_contact=jnp.ones(4, dtype),
    joint_pos=sensors.q,
    joint_vel=sensors.dq,
)
carry = hw.HWCarry(goal=goals.init_goal_state(fbk0),
                   kf=kf_mod.init_state(rot0, foot_body0, dtype=dtype),
                   mode=goals.init_mode_state(target_height, dtype),
                   standup=__import__('quaternion_mpc_tpu.control.standup', fromlist=['init_standup']).init_standup(sensors.q))
joy_neutral = goals.neutral_joy_sample(dtype)
joy_b = joy_neutral._replace(default_pos=jnp.asarray(True))
N_PRIME = 25

for k in range(100):
    joy = joy_b if k in (0, N_PRIME) else joy_neutral
    carry, cmd_mat, info = tick_fn(
        carry, sensors, jnp.asarray(dt_ctrl, dtype), joy, wts,
        ap.rho_fix, ap.kp_joint, ap.kd_joint
    )
    rs_prev = rs
    rs = peer_step(rs, jnp.asarray(cmd_mat).reshape(4, 3, 5))
    sensors, f_world = observe(rs, rs_prev, dt_ctrl)
    if k % 5 == 0 or k == 99:
        tp = np.asarray(rs.torso.pos)
        tv = np.asarray(rs.torso.vel)
        ep = np.asarray(info["est_pos"])
        ev = np.asarray(info["est_vel"])
        fw = np.asarray(f_world)
        print(
            f"k={k:3d} true p=({tp[0]:+.3f},{tp[1]:+.3f},{tp[2]:.3f}) "
            f"v=({tv[0]:+.3f},{tv[1]:+.3f},{tv[2]:+.3f}) | "
            f"est p=({ep[0]:+.3f},{ep[1]:+.3f},{ep[2]:.3f}) "
            f"v=({ev[0]:+.3f},{ev[1]:+.3f},{ev[2]:+.3f}) | "
            f"sum f=({fw.sum(0)[0]:+.1f},{fw.sum(0)[1]:+.1f},{fw.sum(0)[2]:+.1f}) "
            f"cost={float(info['mpc_cost']):.4f}"
        )
