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


def test_estimated_standing_balance_converges():
    """kf_type=1 path: controller closes over BasicKF estimates; the KF
    height converges to truth and the robot holds the target height."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from quaternion_mpc_tpu.control import quat_mpc
    from quaternion_mpc_tpu.runtime import step as rt
    from quaternion_mpc_tpu.utils import config as cfg_mod

    dtype = jnp.float64
    wts = quat_mpc.weights_from_config(cfg_mod.gazebo_go1_quat_mpc(), dtype=dtype)
    foot = jnp.asarray(
        [[0.2104, 0.13, -0.325], [0.2104, -0.13, -0.325],
         [-0.1658, 0.13, -0.325], [-0.1658, -0.13, -0.325]], dtype)
    carry, sp = rt.init_estimated_scenario(wts, foot, height=0.3, dtype=dtype)
    step_fn = rt.make_estimated_standing_step(horizon=6)
    joy = rt.neutral_joy(dtype)

    @jax.jit
    def run(c):
        return jax.lax.scan(lambda cc, _: step_fn(cc, sp, joy), c, None, length=120)

    carry2, ms = run(carry)
    # KF started at z=0.09 (reference init) while truth is 0.3: must converge
    kf_z = float(carry2.kf.x[2])
    true_z = float(carry2.plant.pos[2])
    assert abs(kf_z - true_z) < 0.02, (kf_z, true_z)
    assert abs(true_z - 0.3) < 0.05
    assert bool(np.all(np.asarray(ms.alive)[-10:] > 0.5))


def test_fleet_standing_step_matches_vmapped():
    """Fleet-native standing step == vmapped per-scenario step (same
    trajectory up to solver fp ordering)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from quaternion_mpc_tpu.control import quat_mpc
    from quaternion_mpc_tpu.runtime import step as rt
    from quaternion_mpc_tpu.utils import config as cfg_mod

    dtype = jnp.float64
    B = 3
    wts = quat_mpc.weights_from_config(cfg_mod.gazebo_go1_quat_mpc(), dtype=dtype)
    foot = jnp.asarray(
        [[0.2104, 0.13, -0.325], [0.2104, -0.13, -0.325],
         [-0.1658, 0.13, -0.325], [-0.1658, -0.13, -0.325]], dtype)
    c1, sp1 = rt.init_scenario(wts, foot, dtype=dtype)
    joy1 = rt.neutral_joy(dtype)
    tile = lambda t: jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), t)
    carry, sp, joy = tile(c1), tile(sp1), tile(joy1)
    # attitude + body-rate perturbation so the ω-feedback path is exercised:
    # with mismatched zero_initial_omega the trajectories split after one tick
    q0 = jnp.asarray([0.995, 0.06, -0.04, 0.02], dtype)
    q0 = q0 / jnp.linalg.norm(q0)
    carry = carry._replace(
        plant=carry.plant._replace(
            vel=jnp.asarray([[0.05, 0, 0], [0, -0.05, 0], [0, 0, 0.02]], dtype),
            omega=jnp.asarray([[0.2, -0.1, 0.05], [0, 0.15, 0], [-0.1, 0, 0.1]], dtype),
            quat=jnp.broadcast_to(q0, (B, 4)),
        )
    )

    ref_step = rt.make_standing_step(horizon=6)
    fleet_step = rt.make_fleet_standing_step(horizon=6)
    v_ref = jax.jit(jax.vmap(ref_step))
    f_fl = jax.jit(fleet_step)

    c_ref, c_fl = carry, carry
    for _ in range(5):  # multiple steps: a one-step check can't see ω-path drift
        c_ref, m_ref = v_ref(c_ref, sp, joy)
        c_fl, m_fl = f_fl(c_fl, sp, joy)
    np.testing.assert_allclose(
        np.asarray(c_fl.plant.pos), np.asarray(c_ref.plant.pos), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(c_fl.plant.quat), np.asarray(c_ref.plant.quat), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(m_fl.mpc_cost), np.asarray(m_ref.mpc_cost), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(m_fl.att_err), np.asarray(m_ref.att_err), atol=1e-7
    )
