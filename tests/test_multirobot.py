"""The 6-robot URDF registry as LOAD-BEARING data (`robots/*_description`):
`config_for_robot` derives controller-ready physical constants for any
family (trunk inertials from the registry, mass via the reference's own
trunk→robot scaling, stance footprint from the leg geometry), and the
quat-MPC standing loop balances robots 4× apart in mass with no per-robot
tuning — contact geometry and model constants are data, not code
(SURVEY.md branch note)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quaternion_mpc_tpu.control import quat_mpc
from quaternion_mpc_tpu.ops import lie
from quaternion_mpc_tpu.runtime import step as rt
from quaternion_mpc_tpu.solver import SolverOptions
from quaternion_mpc_tpu.utils import config as cfg_mod

DTYPE = jnp.float32


def test_registry_derives_sane_configs():
    for name in ("go1", "a1", "aliengo", "aliengoZ1", "b1", "laikago"):
        cfg = cfg_mod.config_for_robot(name)
        assert cfg.robot.mass > cfg.robot.trunk_mass > 0
        feet = np.asarray(cfg.robot.default_foot_pos)
        assert feet.shape == (4, 3)
        # FL, FR, RL, RR sign layout
        assert feet[0, 0] > 0 > feet[2, 0]
        assert feet[0, 1] > 0 > feet[1, 1]
        assert np.all(feet[:, 2] < -0.2)
        # leg geometry reachable: stance depth below full extension
        desc = cfg_mod.robot_descriptions()[name]
        assert -feet[0, 2] < desc.thigh_length + desc.calf_length


@pytest.mark.parametrize("name", ["a1", "b1"])
def test_standing_balance_other_robot(name):
    """Closed-loop recovery from a perturbed start for a small (A1,
    ~15 kg) and a large (B1, ~62 kg) robot, straight from the registry."""
    cfg = cfg_mod.config_for_robot(name)
    wts = quat_mpc.weights_from_config(cfg, dtype=DTYPE)
    feet = jnp.asarray(cfg.robot.default_foot_pos, DTYPE)
    height = -float(feet[0, 2])
    carry, sp = rt.init_scenario(wts, feet, height=height, dtype=DTYPE)
    q0 = lie.euler_to_quat(jnp.asarray([0.1, -0.08, 0.0], DTYPE))
    carry = carry._replace(
        plant=carry.plant._replace(
            quat=q0, vel=jnp.asarray([0.1, -0.1, 0.0], DTYPE)
        )
    )
    step = jax.jit(rt.make_standing_step(
        horizon=10, opts=SolverOptions(al_iterations=2, ilqr_iterations=4)
    ))
    joy = rt.neutral_joy(DTYPE)._replace(body_height=jnp.asarray(height, DTYPE))
    for _ in range(150):
        carry, m = step(carry, sp, joy)
    assert bool(carry.alive), f"{name} fell"
    assert float(jnp.abs(carry.plant.quat[0])) > 0.999, f"{name} attitude"
    np.testing.assert_allclose(float(carry.plant.pos[2]), height, atol=0.02)
    assert float(jnp.linalg.norm(carry.plant.vel)) < 0.08


@pytest.mark.parametrize("name,velx", [("a1", 0.35), ("aliengo", 0.35)])
def test_trot_other_robot(name, velx):
    """Registry geometry drives the WALKING tier end to end: per-robot
    rho_fix (FK/IK/J) and stance footprint flow through ScenarioParams —
    gait, Raibert, IK and the MPC model all run on the other robot's
    dimensions with the Go1 controller weights untouched."""
    cfg = cfg_mod.config_for_robot(name)
    wts = quat_mpc.weights_from_config(cfg, dtype=DTYPE)
    desc = cfg_mod.robot_descriptions()[name]
    height = -cfg.robot.default_foot_pos[0][2]
    carry, sp = rt.init_walking_scenario(
        wts, height=height, dtype=DTYPE,
        rho_fix=desc.rho_fix(), default_rel=cfg.robot.default_foot_pos,
    )
    joy = rt.neutral_joy(DTYPE)._replace(
        velx=jnp.asarray(velx, DTYPE), body_height=jnp.asarray(height, DTYPE)
    )
    step = jax.jit(rt.make_walking_step(
        horizon=10, opts=SolverOptions(al_iterations=2, ilqr_iterations=4)
    ))
    vels = []
    for _ in range(300):
        carry, m = step(carry, sp, joy)
        vels.append(float(m.vel_err))
    assert bool(carry.alive), f"{name} fell while trotting"
    assert float(carry.plant.pos[0]) > 0.7
    assert np.mean(vels[-150:]) < 0.06
    np.testing.assert_allclose(float(carry.plant.pos[2]), height, atol=0.03)
