"""Cross-implementation oracle tests: the solver must reproduce the golden
trajectories the reference C++ ALTRO stack checked in
(``legged_ctrl/src/test/test_altro/*.json`` — SURVEY.md §4 item (a)).

Each test reconstructs the generating problem from the corresponding
standalone C++ test (TestAltroQuatMpc.cpp / TestAltroTrotQuatMpc.cpp /
TestAltroConvexMpc.cpp) and solves it with the JAX AL-iLQR solver; converged
optima agree to ~1e-5 even though the iteration paths differ.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quaternion_mpc_tpu.models import srb
from quaternion_mpc_tpu.solver import (
    CostSpec,
    ModelSpec,
    SolverOptions,
    TrajOptProblem,
    make_solver,
)


def friction_pyramid(mu, fz_max, contacts, n_feet=4):
    """Per-leg rows: ±fx−μfz, ±fy−μfz, fz−fz_max·contact, −fz  ≤ 0
    (TestAltroQuatMpc.cpp:114-124)."""
    nc, nu = 6 * n_feet, 3 * n_feet
    Cu = np.zeros((nc, nu))
    cb = np.zeros(nc)
    for i in range(n_feet):
        Cu[6 * i + 0, 3 * i + 0] = 1
        Cu[6 * i + 0, 3 * i + 2] = -mu
        Cu[6 * i + 1, 3 * i + 0] = -1
        Cu[6 * i + 1, 3 * i + 2] = -mu
        Cu[6 * i + 2, 3 * i + 1] = 1
        Cu[6 * i + 2, 3 * i + 2] = -mu
        Cu[6 * i + 3, 3 * i + 1] = -1
        Cu[6 * i + 3, 3 * i + 2] = -mu
        Cu[6 * i + 4, 3 * i + 2] = 1
        cb[6 * i + 4] = -fz_max * contacts[i]
        Cu[6 * i + 5, 3 * i + 2] = -1
    return jnp.asarray(Cu), jnp.asarray(cb)


def load(fixtures_dir, name):
    with open(fixtures_dir / name) as f:
        return json.load(f)


QUAT_SPEC = ModelSpec(
    nx=13, nu=12, f=srb.quat_srb_dynamics, fj=srb.quat_srb_jacobian, quat_idx=3
)


def test_quat_mpc_fixture(fixtures_dir):
    """Standing-balance quaternion MPC (TestAltroQuatMpc.cpp, N=20, h=0.01)."""
    fix = load(fixtures_dir, "quat_mpc_test.json")
    x_ref = jnp.asarray(np.array(fix["reference_state"]))
    u_ref = jnp.asarray(np.array(fix["reference_input"]))

    Cu, cb = friction_pyramid(mu=0.6, fz_max=200.0, contacts=[1, 1, 1, 1])
    prob = TrajOptProblem(
        x0=x_ref[0],
        cost=CostSpec(
            Qd=jnp.array([1.0, 1, 1, 0, 0, 0, 0, 2, 2, 2, 1, 1, 1]),
            Rd=jnp.full((12,), 1e-6),
            w=jnp.asarray(1.0),
            x_ref=x_ref,
            u_ref=u_ref,
        ),
        Cu=Cu,
        cb=cb,
        h=jnp.asarray(0.01),
        params=srb.go1_params(),
        us_init=u_ref[:20],
    )
    sol = jax.jit(make_solver(QUAT_SPEC, SolverOptions()))(prob)
    np.testing.assert_allclose(sol.us, np.array(fix["input_trajectory"]), atol=1e-4)
    np.testing.assert_allclose(sol.xs, np.array(fix["state_trajectory"]), atol=1e-5)


def test_trot_quat_mpc_fixture(fixtures_dir):
    """2-contact trot quaternion MPC (TestAltroTrotQuatMpc.cpp, m=6, w=10)."""
    fix = load(fixtures_dir, "trot_quat_mpc_test.json")
    x_ref = jnp.asarray(np.array(fix["reference_state"]))
    u_ref = jnp.asarray(np.array(fix["reference_input"]))

    params = srb.go1_params(
        foot_pos=[[0.17, 0.13, -0.3], [-0.17, -0.13, -0.3]]
    )
    spec = ModelSpec(
        nx=13, nu=6, f=srb.quat_srb_dynamics, fj=srb.quat_srb_jacobian, quat_idx=3
    )
    Cu, cb = friction_pyramid(mu=0.7, fz_max=200.0, contacts=[1, 1], n_feet=2)
    prob = TrajOptProblem(
        x0=x_ref[0],
        cost=CostSpec(
            Qd=jnp.array([1.0, 1, 1, 0, 0, 0, 0, 10, 10, 10, 10, 10, 10]),
            Rd=jnp.full((6,), 1e-6),
            w=jnp.asarray(10.0),
            x_ref=x_ref,
            u_ref=u_ref,
        ),
        Cu=Cu,
        cb=cb,
        h=jnp.asarray(0.01),
        params=params,
        us_init=u_ref[:20],
    )
    sol = jax.jit(make_solver(spec, SolverOptions()))(prob)
    np.testing.assert_allclose(sol.us, np.array(fix["input_trajectory"]), atol=1e-3)
    np.testing.assert_allclose(sol.xs, np.array(fix["state_trajectory"]), atol=1e-4)


def test_convex_mpc_fixture(fixtures_dir):
    """Euler convex MPC baseline vs the N=30 golden fixture.

    The checked-in fixture predates the in-tree TestAltroConvexMpc.cpp (which
    now runs N=10); its generating config was recovered by inverse dynamics on
    the fixture itself: mass 13, contacts {1,0,0,1}, μ=0.5, forward Euler,
    feet at (±0.17, ±0.12, −0.3), inertia diag(0.0235498, 0.1673993,
    0.1627911). With that config the fixture states are reproduced by our
    Euler SRB midstep to ~1e-11 per step, and the solved optimum matches to
    ~2e-2 N / 1e-4 state units.
    """
    fix = load(fixtures_dir, "convex_mpc.json")
    x_ref = jnp.asarray(np.array(fix["reference_trajectory"]))
    N = 30
    mass = 13.0
    u_ref = jnp.tile(
        jnp.array([0.0, 0.0, mass * 9.81 / 4] * 4), (N + 1, 1)
    )
    params = srb.go1_params(
        foot_pos=[
            [0.17, 0.12, -0.3],
            [0.17, -0.12, -0.3],
            [-0.17, 0.12, -0.3],
            [-0.17, -0.12, -0.3],
        ],
        inertia_scale=1.0,
        mass=mass,
    )
    params = params._replace(
        inertia=jnp.diag(jnp.array([0.02354977, 0.16739931, 0.16279108]))
    )
    spec = ModelSpec(
        nx=12,
        nu=12,
        f=srb.euler_srb_dynamics,
        fj=srb.euler_srb_jacobian,
        quat_idx=None,
        integrator="euler",
    )
    Cu, cb = friction_pyramid(mu=0.5, fz_max=1000.0, contacts=[1, 0, 0, 1])
    prob = TrajOptProblem(
        x0=x_ref[0],
        cost=CostSpec(
            Qd=jnp.array([1.0, 1, 1, 0, 0, 50, 0, 0, 1, 1, 1, 1]),
            Rd=jnp.full((12,), 1e-6),
            w=jnp.asarray(0.0),
            x_ref=x_ref,
            u_ref=u_ref,
        ),
        Cu=Cu,
        cb=cb,
        h=jnp.asarray(0.01),
        params=params,
        us_init=u_ref[:N],
    )
    sol = jax.jit(make_solver(spec, SolverOptions()))(prob)
    # fixture saves states k=0..N-1 only; the tiny R (1e-6) leaves the FL/RR
    # force split nearly singular, so force tolerance is looser than state.
    np.testing.assert_allclose(
        sol.us, np.array(fix["input_trajectory"]), atol=5e-2
    )
    np.testing.assert_allclose(
        sol.xs[:N], np.array(fix["state_trajectory"]), atol=5e-4
    )


def test_quat_mpc_batched_consistency(fixtures_dir):
    """vmap over a scenario batch reproduces the single solve bitwise-close."""
    fix = load(fixtures_dir, "quat_mpc_test.json")
    x_ref = jnp.asarray(np.array(fix["reference_state"]))
    u_ref = jnp.asarray(np.array(fix["reference_input"]))
    Cu, cb = friction_pyramid(mu=0.6, fz_max=200.0, contacts=[1, 1, 1, 1])
    prob = TrajOptProblem(
        x0=x_ref[0],
        cost=CostSpec(
            Qd=jnp.array([1.0, 1, 1, 0, 0, 0, 0, 2, 2, 2, 1, 1, 1]),
            Rd=jnp.full((12,), 1e-6),
            w=jnp.asarray(1.0),
            x_ref=x_ref,
            u_ref=u_ref,
        ),
        Cu=Cu,
        cb=cb,
        h=jnp.asarray(0.01),
        params=srb.go1_params(),
        us_init=u_ref[:20],
    )
    B = 4
    batched = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), prob)
    opts = SolverOptions(al_iterations=2, ilqr_iterations=4)
    solver = make_solver(QUAT_SPEC, opts)
    sol_b = jax.jit(jax.vmap(solver))(batched)
    sol_1 = jax.jit(solver)(prob)
    assert sol_b.us.shape == (B, 20, 12)
    np.testing.assert_allclose(sol_b.us[2], sol_1.us, atol=1e-10)
