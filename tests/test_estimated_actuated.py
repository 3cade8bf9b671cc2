"""Full Gazebo-parity loop (VERDICT r2 missing #4): estimator + torque
layer + gait + terrain in ONE closed loop. The controller sees only
derived sensing — encoders, IMU, f = J⁻ᵀτ contact detection, kf_type-routed
torso estimates — and acts only through the joint-servo command.

Reference cycle: ``GazeboInterface.cpp:58-82`` (fbk → est → ctrl → send),
``BaseInterface.cpp:253-261`` (foot force from torques), the casadi
submodule's ``A1KFCombineLOWithFootTerrain`` (terrain-aware heights).
"""

import jax
import jax.numpy as jnp
import numpy as np

from quaternion_mpc_tpu.control import quat_mpc
from quaternion_mpc_tpu.runtime import step as rt
from quaternion_mpc_tpu.sim import terrain as tmod
from quaternion_mpc_tpu.solver import SolverOptions
from quaternion_mpc_tpu.utils import config as cfg_mod

DTYPE = jnp.float32
OPTS = SolverOptions(al_iterations=2, ilqr_iterations=4)


def _wts():
    return quat_mpc.weights_from_config(cfg_mod.gazebo_go1_quat_mpc(), dtype=DTYPE)


def test_trot_through_torque_and_basickf():
    """0.4 m/s trot with torque actuation AND BasicKF estimation — the
    controller never reads ground truth."""
    carry, sp = rt.init_estimated_actuated_scenario(_wts(), dtype=DTYPE, kf_type=1)
    joy = rt.neutral_joy(DTYPE)._replace(velx=jnp.asarray(0.4, DTYPE))
    step = jax.jit(rt.make_estimated_actuated_step(horizon=10, opts=OPTS, kf_type=1))
    vels, est_errs = [], []
    for _ in range(300):
        carry, m = step(carry, sp, joy)
        vels.append(float(carry.robot.torso.vel[0]))
        est_errs.append(float(m.est_err))
    assert bool(carry.alive), "fell during estimated+actuated trot"
    np.testing.assert_allclose(np.mean(vels[-150:]), 0.4, atol=0.12)
    assert float(carry.robot.torso.pos[0]) > 0.8
    assert np.mean(est_errs[-150:]) < 0.05, "estimator drifted"
    # joints actually move: this is the torque-driven plant
    assert float(jnp.max(jnp.abs(carry.robot.dq))) > 0.1


def test_trot_through_torque_and_ekf_with_mocap_dropout():
    """kf_type=2: EKF with rate-limited simulated mocap. A mid-run dropout
    must not kill the walk; the error re-converges after re-fusion."""
    carry, sp = rt.init_estimated_actuated_scenario(_wts(), dtype=DTYPE, kf_type=2)
    joy = rt.neutral_joy(DTYPE)._replace(velx=jnp.asarray(0.4, DTYPE))
    step = jax.jit(rt.make_estimated_actuated_step(horizon=10, opts=OPTS, kf_type=2))
    errs, vels = [], []
    for k in range(300):
        mocap_on = not (100 <= k < 180)
        carry, m = step(carry, sp, joy, jnp.asarray(mocap_on))
        errs.append(float(m.est_err))
        vels.append(float(carry.robot.torso.vel[0]))
    assert bool(carry.alive), "fell (EKF/mocap)"
    np.testing.assert_allclose(np.mean(vels[-150:]), 0.4, atol=0.15)
    # dropout degrades but stays bounded; re-fusion recovers
    assert max(errs[100:180]) < 0.25, "estimate diverged during dropout"
    assert np.mean(errs[-60:]) < 0.05, "did not re-converge after mocap returned"
    assert np.mean(errs[-60:]) < max(errs[100:180]), "re-fusion had no effect"


def test_trot_up_slope_with_terrain_aware_kf():
    """Slope climb with BasicKF + terrain-aware foot-height references
    (flat-ground height pinning diverges here — the reason the reference
    carries a WithFootTerrain estimator variant)."""
    tp = tmod.make_terrain("slope", slope_grade=0.2, dtype=DTYPE)
    carry, sp = rt.init_estimated_actuated_scenario(
        _wts(), dtype=DTYPE, kf_type=1, terrain=tp, start_x=-0.4
    )
    joy = rt.neutral_joy(DTYPE)._replace(velx=jnp.asarray(0.3, DTYPE))
    step = jax.jit(rt.make_estimated_actuated_step(horizon=10, opts=OPTS, kf_type=1))
    for _ in range(450):
        carry, m = step(carry, sp, joy)
    assert bool(carry.alive), "fell on the slope (estimated+actuated)"
    x = float(carry.robot.torso.pos[0])
    z = float(carry.robot.torso.pos[2])
    assert x > 0.6, f"did not climb (x={x:.3f})"
    np.testing.assert_allclose(z, 0.2 * max(x, 0.0) + 0.3, atol=0.08)
    assert float(m.est_err) < 0.08, f"estimator err {float(m.est_err):.3f} m"
