"""Closed-loop tests: the in-framework plant replaces Gazebo (SURVEY.md §4c).

Standing balance must settle (the reference's system test is "robot stands in
Gazebo"); the scenario fleet version must mask diverged rollouts instead of
poisoning the batch.
"""

import jax
import jax.numpy as jnp
import numpy as np

from quaternion_mpc_tpu.control import quat_mpc
from quaternion_mpc_tpu.models import srb
from quaternion_mpc_tpu.runtime import step as rt
from quaternion_mpc_tpu.solver import SolverOptions
from quaternion_mpc_tpu.utils import config as cfg_mod


def _setup(dtype=jnp.float64):
    wts = quat_mpc.weights_from_config(cfg_mod.gazebo_go1_quat_mpc(), dtype=dtype)
    carry, sp = rt.init_scenario(wts, srb.go1_params().foot_pos, dtype=dtype)
    return carry, sp, rt.neutral_joy(dtype)


def test_standing_balance_settles():
    carry, sp, joy = _setup()
    step = rt.make_standing_step(
        horizon=10, opts=SolverOptions(al_iterations=2, ilqr_iterations=4)
    )
    step_jit = jax.jit(step)

    # perturb: tilted attitude + height error + lateral velocity
    q0 = jnp.array([0.99, 0.1, 0.05, 0.0])
    q0 = q0 / jnp.linalg.norm(q0)
    carry = carry._replace(
        plant=carry.plant._replace(
            quat=q0,
            pos=jnp.array([0.0, 0.0, 0.25]),
            vel=jnp.array([0.1, -0.1, 0.0]),
        )
    )
    for _ in range(150):  # 1.5 s at h=10 ms
        carry, metrics = step_jit(carry, sp, joy)
    assert bool(carry.alive)
    assert float(metrics.height_err) < 0.01
    assert float(metrics.att_err) < 1e-3
    np.testing.assert_allclose(np.array(carry.plant.vel), 0.0, atol=0.02)
    np.testing.assert_allclose(np.array(carry.plant.omega), 0.0, atol=0.02)


def test_fleet_masks_diverged_scenario():
    carry1, sp1, joy1 = _setup()
    B = 4
    tile = lambda t: jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), t)
    carry, sp, joy = tile(carry1), tile(sp1), tile(joy1)
    # poison scenario 1 with NaN velocity
    bad_vel = carry.plant.vel.at[1].set(jnp.nan)
    carry = carry._replace(plant=carry.plant._replace(vel=bad_vel))

    step = rt.make_standing_step(
        horizon=6, opts=SolverOptions(al_iterations=1, ilqr_iterations=2)
    )
    vstep = jax.jit(jax.vmap(step))
    for _ in range(3):
        carry, metrics = vstep(carry, sp, joy)
    alive = np.array(carry.alive)
    assert alive.tolist() == [True, False, True, True]
    # healthy scenarios keep finite state
    assert np.isfinite(np.array(carry.plant.pos)[[0, 2, 3]]).all()


def test_sin_attitude_tracking():
    """Sinusoidal attitude test mode (QuatMpc.cpp:140-146): the controller
    tracks a moving attitude reference without falling."""
    carry, sp, joy = _setup()
    joy = joy._replace(sin_ang_vel=jnp.asarray(True))
    step = rt.make_standing_step(
        horizon=10, opts=SolverOptions(al_iterations=2, ilqr_iterations=4)
    )
    step_jit = jax.jit(step)
    att_errs = []
    for _ in range(100):
        carry, metrics = step_jit(carry, sp, joy)
        att_errs.append(float(metrics.att_err))
    assert bool(carry.alive)
    # geodesic error stays small while reference oscillates
    assert max(att_errs[20:]) < 5e-3
