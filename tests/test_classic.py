"""Classic-system solver tests — the reference's progression fixtures
(TestDoubleIntegrator / TestPendulum / TestBicycle with the scotty-dog
trajectory) driving the generic vector-space path of the optimizer,
including state inequality constraints (steering bound)."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from quaternion_mpc_tpu.models import classic, discretize
from quaternion_mpc_tpu.solver import (
    CostSpec,
    ModelSpec,
    SolverOptions,
    TrajOptProblem,
    make_solver,
)


def _unconstrained(nc, nu):
    return jnp.zeros((nc, nu)), jnp.zeros((nc,))


def test_double_integrator_reaches_goal():
    dim = 2
    n, m, N, h = 2 * dim, dim, 20, 0.1
    spec = ModelSpec(nx=n, nu=m, f=classic.double_integrator_dynamics, quat_idx=None)
    goal = jnp.array([1.0, -0.5, 0.0, 0.0])
    x_ref = jnp.tile(goal, (N + 1, 1))
    u_ref = jnp.zeros((N + 1, m))
    Cu, cb = _unconstrained(0, m)
    prob = TrajOptProblem(
        x0=jnp.zeros(n),
        cost=CostSpec(
            Qd=jnp.ones(n), Rd=1e-2 * jnp.ones(m), w=jnp.asarray(0.0),
            x_ref=x_ref, u_ref=u_ref, Qdf=1e4 * jnp.ones(n),
        ),
        Cu=Cu, cb=cb, h=jnp.asarray(h), params=None, us_init=jnp.zeros((N, m)),
    )
    sol = jax.jit(make_solver(spec, SolverOptions(al_iterations=1, ilqr_iterations=20)))(prob)
    np.testing.assert_allclose(np.array(sol.xs[-1]), np.array(goal), atol=1e-2)


def test_pendulum_swing_up():
    n, m, N, h = 2, 1, 60, 0.05
    spec = ModelSpec(nx=n, nu=m, f=classic.pendulum_dynamics, quat_idx=None)
    goal = jnp.array([jnp.pi, 0.0])
    x_ref = jnp.tile(goal, (N + 1, 1))
    u_ref = jnp.zeros((N + 1, m))
    Cu, cb = _unconstrained(0, m)
    prob = TrajOptProblem(
        x0=jnp.zeros(n),
        cost=CostSpec(
            Qd=jnp.array([1e-2, 1e-1]), Rd=1e-3 * jnp.ones(m), w=jnp.asarray(0.0),
            x_ref=x_ref, u_ref=u_ref, Qdf=jnp.array([100.0, 100.0]),
        ),
        Cu=Cu, cb=cb, h=jnp.asarray(h), params=None,
        us_init=0.1 * jnp.ones((N, m)),
    )
    sol = jax.jit(
        make_solver(spec, SolverOptions(al_iterations=1, ilqr_iterations=80))
    )(prob)
    np.testing.assert_allclose(float(sol.xs[-1, 0]), np.pi, atol=0.05)
    np.testing.assert_allclose(float(sol.xs[-1, 1]), 0.0, atol=0.1)


def test_bicycle_tracks_scotty(fixtures_dir):
    """Receding-horizon bicycle MPC over the scotty-dog reference
    (TestBicycle.cpp: N=30, Qd=1e-2, Rd=1e-3, Qdf=1e1, |δ| ≤ 60°).

    The checked-in scotty_mpc.json records the reference's closed-loop
    tracking errors; ours must stay in the same band.
    """
    with open(fixtures_dir / "scotty.json") as f:
        scotty = json.load(f)
    x_ref_full = jnp.asarray(np.array(scotty["state_trajectory"]))
    u_ref_full = jnp.asarray(np.array(scotty["input_trajectory"]))
    h = scotty["tf"] / scotty["N"]  # 0.1 s

    with open(fixtures_dir / "scotty_mpc.json") as f:
        ref_mpc = json.load(f)
    ref_err = np.array(ref_mpc["tracking_error"])

    n, m, N = 4, 2, 30
    spec = ModelSpec(nx=n, nu=m, f=classic.bicycle_dynamics, quat_idx=None)
    params = (jnp.asarray(2.7), jnp.asarray(1.5))

    delta_max = 60.0 * np.pi / 180.0
    Cx = jnp.asarray([[0.0, 0, 0, 1.0], [0.0, 0, 0, -1.0]])
    Cu = jnp.zeros((2, m))
    cb = jnp.asarray([-delta_max, -delta_max])

    solver = make_solver(spec, SolverOptions(al_iterations=2, ilqr_iterations=8))

    def build(k0, x0, us_init):
        idx = k0 + jnp.arange(N + 1)
        return TrajOptProblem(
            x0=x0,
            cost=CostSpec(
                Qd=1e-2 * jnp.ones(n), Rd=1e-3 * jnp.ones(m), w=jnp.asarray(0.0),
                x_ref=x_ref_full[idx], u_ref=u_ref_full[idx], Qdf=1e1 * jnp.ones(n),
            ),
            Cu=Cu, cb=cb, h=jnp.asarray(h), params=params, us_init=us_init, Cx=Cx,
        )

    @jax.jit
    def mpc_step(k0, x0, us_warm):
        sol = solver(build(k0, x0, us_warm))
        u0 = sol.us[0]
        x_next = discretize.midpoint_step(classic.bicycle_dynamics, x0, u0, params, h)
        us_warm = jnp.concatenate([sol.us[1:], sol.us[-1:]])
        return x_next, u0, us_warm

    Nsim = 100
    x = x_ref_full[0]
    us_warm = jnp.tile(u_ref_full[0], (N, 1))
    errs = []
    for k in range(Nsim):
        x_next, u0, us_warm = mpc_step(k, x, us_warm)
        err = float(jnp.sum((x - x_ref_full[k]) ** 2))
        errs.append(err)
        x = x_next
        assert abs(float(x[3])) <= delta_max + 1e-3  # steering bound honored
    # closed-loop tracking error in the reference's band
    assert max(errs) < max(float(ref_err.max()) * 3.0, 1e-3), (max(errs), ref_err.max())
