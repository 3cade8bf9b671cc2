"""Closed-loop trot over the analytic terrain worlds (slope / stairs — the
reference demonstrably walks these Gazebo worlds, ``unitree_gazebo/worlds/``)
and the per-knot MPC contact schedule (the reference's unplumbed
``LeggedContactFSM::predict_contact_state``, ConvexMpc.cpp:82 TODO)."""

import jax
import jax.numpy as jnp
import numpy as np

from quaternion_mpc_tpu.control import quat_mpc
from quaternion_mpc_tpu.runtime import step as rt
from quaternion_mpc_tpu.sim import terrain as tmod
from quaternion_mpc_tpu.solver import SolverOptions
from quaternion_mpc_tpu.utils import config as cfg_mod

OPTS = SolverOptions(al_iterations=2, ilqr_iterations=4)


def _run(terrain, n_steps, velx=0.3, dtype=jnp.float64, **step_kw):
    wts = quat_mpc.weights_from_config(cfg_mod.gazebo_go1_quat_mpc(), dtype=dtype)
    carry, sp = rt.init_walking_scenario(wts, dtype=dtype, terrain=terrain)
    joy = rt.neutral_joy(dtype)._replace(velx=jnp.asarray(velx, dtype))
    step = jax.jit(rt.make_walking_step(horizon=10, opts=OPTS, **step_kw))
    ms = []
    for _ in range(n_steps):
        carry, m = step(carry, sp, joy)
        ms.append(jax.tree.map(float, m))
    return carry, ms


def test_trot_up_slope():
    """Walk up the 0.2-grade slope world without falling; torso height must
    follow the ramp (z ≈ grade·x + target at the end)."""
    tp = tmod.make_terrain("slope", slope_grade=0.2, dtype=jnp.float64)
    carry, ms = _run(tp, 400)
    assert bool(carry.alive), "fell on the slope"
    x = float(carry.plant.pos[0])
    z = float(carry.plant.pos[2])
    assert x > 0.8, f"did not climb the slope (x={x:.3f})"
    # torso tracks ramp height: z ≈ 0.2·x + 0.3
    np.testing.assert_allclose(z, 0.2 * x + 0.3, atol=0.08)


def test_trot_up_stairs():
    """Climb the stairs world (0.17 m rise / 0.30 m run, the unitree_gazebo
    stairs model geometry) without falling."""
    tp = tmod.make_terrain("stairs", stair_rise=0.17, stair_run=0.30, dtype=jnp.float64)
    carry, ms = _run(tp, 400)
    assert bool(carry.alive), "fell on the stairs"
    x = float(carry.plant.pos[0])
    z = float(carry.plant.pos[2])
    assert x > 0.7, f"did not climb the stairs (x={x:.3f})"
    # after >2 steps of rise the torso must be well above flat-ground height
    assert z > 0.55, f"torso did not gain stair height (z={z:.3f})"


def test_per_knot_contact_schedule_improves_tracking():
    """The (N+1, n_feet) predicted contact schedule must not degrade — and in
    practice improves — velocity/height tracking vs the constant schedule
    (measured: vel_err 0.0175 → 0.0151, height_err 0.0038 → 0.0025)."""
    _, ms_const = _run(None, 250, velx=0.4, per_knot_contacts=False)
    _, ms_sched = _run(None, 250, velx=0.4, per_knot_contacts=True)
    ve_c = np.mean([m.vel_err for m in ms_const[-150:]])
    ve_s = np.mean([m.vel_err for m in ms_sched[-150:]])
    he_c = np.mean([m.height_err for m in ms_const[-150:]])
    he_s = np.mean([m.height_err for m in ms_sched[-150:]])
    assert ve_s <= ve_c * 1.02, f"per-knot schedule degraded vel tracking: {ve_s:.4f} vs {ve_c:.4f}"
    assert he_s <= he_c * 1.02, f"per-knot schedule degraded height tracking: {he_s:.4f} vs {he_c:.4f}"


def test_per_knot_contacts_build_problem():
    """build_problem with (N+1, n_feet) contacts: per-knot u_ref weight split
    and per-knot fz_max gating in cb."""
    dtype = jnp.float64
    wts = quat_mpc.weights_from_config(cfg_mod.gazebo_go1_quat_mpc(), dtype=dtype)
    carry, sp = rt.init_walking_scenario(wts, dtype=dtype)
    fbk = rt.feedback_from_plant(carry.plant, sp.plant_params.foot_pos_body)
    N = 4
    # FL+RR stance for knots 0-2, all-stance at knots 3-4
    contacts = jnp.asarray(
        [[1, 0, 0, 1]] * 3 + [[1, 1, 1, 1]] * 2, dtype=dtype
    )
    from quaternion_mpc_tpu.control.types import Command

    cmd = Command(
        pos_body_d=jnp.zeros(3, dtype),
        lin_vel_body_d=jnp.zeros(3, dtype),
        quat_d=jnp.asarray([1.0, 0, 0, 0], dtype),
        ang_vel_body_d=jnp.zeros(3, dtype),
        contacts=contacts,
    )
    prob = quat_mpc.build_problem(fbk, cmd, wts, N)
    W = float(wts.mass) * quat_mpc.GRAVITY
    # knot 0: weight over 2 feet; knot 3: over 4 feet
    np.testing.assert_allclose(prob.cost.u_ref[0, 2::3], np.array([W / 2, 0, 0, W / 2]))
    np.testing.assert_allclose(prob.cost.u_ref[3, 2::3], np.full(4, W / 4))
    assert prob.cb.shape == (N + 1, 24)
    # swing legs get fz_max = 0 rows (force pinned to zero)
    np.testing.assert_allclose(prob.cb[0, 4 + 6], 0.0)  # FR swing at knot 0
    np.testing.assert_allclose(prob.cb[3, 4 + 6], -float(wts.fz_max))

    # single-solver solve with the per-knot problem stays finite and the
    # swing-leg force at knot 0 is (near) zero
    from quaternion_mpc_tpu.solver import make_solver

    sol = make_solver(quat_mpc.MODEL_SPEC, OPTS)(prob)
    assert bool(jnp.all(jnp.isfinite(sol.us)))
    fz_swing = float(sol.us[0].reshape(4, 3)[1, 2])
    assert abs(fz_swing) < 2.0, f"swing-leg force not gated: {fz_swing}"


def test_mixed_terrain_randomized_fleet():
    """Domain randomization across ONE fleet (the north-star's 'batch axis
    over randomized gaits/commands/contacts', SURVEY.md §2.3): six scenarios
    mixing flat / slope / stairs worlds (TerrainParams.kind is per-scenario
    DATA, traced through one compiled step) with randomized velocity
    commands, solved by the single batch-last fleet solver. Every scenario
    must stay alive and behave per ITS world: slope walkers gain height
    with the ramp, stairs walkers climb, flat walkers stay level."""
    dtype = jnp.float64
    wts = quat_mpc.weights_from_config(cfg_mod.gazebo_go1_quat_mpc(), dtype=dtype)
    worlds = [
        tmod.make_terrain("flat", dtype=dtype),
        tmod.make_terrain("flat", dtype=dtype),
        tmod.make_terrain("slope", slope_grade=0.15, dtype=dtype),
        tmod.make_terrain("slope", slope_grade=0.25, dtype=dtype),
        tmod.make_terrain("stairs", stair_rise=0.17, stair_run=0.30, dtype=dtype),
        tmod.make_terrain("stairs", stair_rise=0.12, stair_run=0.30, dtype=dtype),
    ]
    velxs = [0.25, 0.45, 0.3, 0.25, 0.3, 0.35]  # randomized commands
    carries, sps, joys = [], [], []
    for tp, vx in zip(worlds, velxs):
        c, s = rt.init_walking_scenario(wts, dtype=dtype, terrain=tp)
        carries.append(c)
        sps.append(s)
        joys.append(rt.neutral_joy(dtype)._replace(velx=jnp.asarray(vx, dtype)))
    stack = lambda *xs: jnp.stack(xs)
    carry = jax.tree.map(stack, *carries)
    sp = jax.tree.map(stack, *sps)
    joy = jax.tree.map(stack, *joys)

    fleet_step = rt.make_fleet_walking_step(horizon=10, opts=OPTS)

    @jax.jit
    def run(c):
        return jax.lax.scan(lambda cc, _: fleet_step(cc, sp, joy), c,
                            None, length=300)

    carry, ms = run(carry)
    alive = np.asarray(carry.alive)
    assert alive.all(), f"fleet lost scenarios: {alive}"
    pos = np.asarray(carry.plant.pos)
    # all walked forward (randomized speeds, 3 s)
    assert (pos[:, 0] > 0.4).all(), pos[:, 0]
    # flat walkers stay at height; slope/stairs walkers gained height
    assert abs(pos[0, 2] - 0.3) < 0.05 and abs(pos[1, 2] - 0.3) < 0.05
    assert pos[2, 2] > 0.38 and pos[3, 2] > 0.42, pos[2:4, 2]
    assert pos[4, 2] > 0.42 and pos[5, 2] > 0.40, pos[4:6, 2]
