"""Horizon-parallel (associative-scan) Riccati backward pass: must reproduce
the sequential sweep's gains/feedforwards, and the full fleet solve with
backend="assoc" must still hit the golden fixture optimum (SURVEY.md §5
"sequence-parallelism" axis; VERDICT r1 item 7)."""

import jax
import jax.numpy as jnp
import numpy as np

from quaternion_mpc_tpu import examples
from quaternion_mpc_tpu.control import quat_mpc
from quaternion_mpc_tpu.solver import SolverOptions
from quaternion_mpc_tpu.solver import fleet as fl
from quaternion_mpc_tpu.solver import parallel_riccati as pr
from quaternion_mpc_tpu.solver.fleet import FleetModelSpec, FleetProblem


def _random_lqr(N=8, nx=4, nu=2, B=3, seed=0):
    rng = np.random.default_rng(seed)
    Ac = 0.3 * rng.standard_normal((nx, nx))
    Bc = rng.standard_normal((nx, nu))

    def f(x, u, p):
        return (
            jnp.einsum("ij,jb->ib", jnp.asarray(Ac), x)
            + jnp.einsum("ij,jb->ib", jnp.asarray(Bc), u)
        )

    def fj(x, u, p):
        J = np.concatenate([Ac, Bc], axis=1)
        return jnp.broadcast_to(jnp.asarray(J)[..., None], (nx, nx + nu, x.shape[-1]))

    spec = FleetModelSpec(nx=nx, nu=nu, f=f, fj=fj, quat_idx=None, integrator="euler")
    prob = FleetProblem(
        x0=jnp.asarray(rng.standard_normal((nx, B))),
        x_ref=jnp.asarray(rng.standard_normal((N + 1, nx, B))),
        u_ref=jnp.asarray(0.1 * rng.standard_normal((N + 1, nu, B))),
        Qd=jnp.ones((nx, 1)),
        Rd=0.1 * jnp.ones((nu, 1)),
        w=jnp.ones((1,)),
        Cu=jnp.asarray(rng.standard_normal((3, nu))[..., None] * np.ones((1, 1, B))),
        cb=jnp.asarray(-np.ones((3, 1)) * np.ones((1, B))),
        h=jnp.asarray(0.1),
        params=None,
        us_init=jnp.asarray(0.1 * rng.standard_normal((N, nu, B))),
    )
    return spec, prob, rng


def test_assoc_backward_matches_sequential_lqr():
    spec, prob, rng = _random_lqr()
    N, B = prob.us_init.shape[0], prob.x0.shape[-1]

    def roll(x, u):
        return fl._fleet_step(spec, x, u, prob.params, prob.h), x

    xN, xs0 = jax.lax.scan(roll, prob.x0, prob.us_init)
    xs = jnp.concatenate([xs0, xN[None]], axis=0)
    lam = jnp.abs(jnp.asarray(rng.standard_normal((N, 3, B)))) * 0.1
    rho = jnp.asarray(2.0)
    reg = jnp.full((B,), 1e-9)

    seq = fl.riccati_backward(spec, prob, xs, prob.us_init, lam, rho, reg)
    par = pr.parallel_backward(spec, prob, xs, prob.us_init, lam, rho, reg)
    for s, p, name, tol in zip(seq, par, ("K", "d", "dV1", "dV2", "g"),
                               (1e-7, 1e-7, 1e-6, 1e-6, 1e-7)):
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(s), atol=tol, err_msg=name
        )


def test_assoc_backend_matches_fixture_optimum():
    """Full quaternion fleet solve with backend='assoc' lands on the f64
    golden fixture optimum (same guard as the sequential path)."""
    B = 4
    prob, gold_us, gold_xs = examples.fixture_fleet_problem(B, jnp.float64)
    spec = quat_mpc._fleet_spec()
    solver = jax.jit(fl.make_fleet_solver(spec, SolverOptions(), backend="assoc"))
    sol = solver(prob)
    us = np.asarray(sol.us)  # (20, 12, B)
    assert np.all(np.isfinite(us))
    for b in range(B):
        np.testing.assert_allclose(us[..., b], gold_us, atol=1e-3)
