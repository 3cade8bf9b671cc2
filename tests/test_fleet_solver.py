"""Fleet-native (batch-last) solver must agree with the per-scenario solver
and with the golden quaternion fixture."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from quaternion_mpc_tpu.control import quat_mpc
from quaternion_mpc_tpu.models import srb
from quaternion_mpc_tpu.solver import SolverOptions
from quaternion_mpc_tpu.solver.fleet import (
    FleetProblem,
    bmm,
    bmv,
    cho_solve_bl,
    cholesky_bl,
    make_fleet_solver,
)
from tests.test_solver_fixtures import friction_pyramid
from __graft_entry__ import _example_batch


def test_batch_last_linalg():
    rng = np.random.default_rng(0)
    B, n = 7, 12
    M = rng.standard_normal((B, n, n))
    A = np.einsum("bij,bkj->bik", M, M) + 3 * np.eye(n)  # SPD
    b = rng.standard_normal((B, n))
    A_bl = jnp.moveaxis(jnp.asarray(A), 0, -1)
    b_bl = jnp.moveaxis(jnp.asarray(b), 0, -1)
    L = cholesky_bl(A_bl)
    x = cho_solve_bl(L, b_bl)
    x_ref = np.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(np.moveaxis(np.array(x), -1, 0), x_ref, atol=1e-8)
    # matrix RHS
    Bmat = rng.standard_normal((B, n, 5))
    X = cho_solve_bl(L, jnp.moveaxis(jnp.asarray(Bmat), 0, -1))
    X_ref = np.linalg.solve(A, Bmat)
    np.testing.assert_allclose(np.moveaxis(np.array(X), -1, 0), X_ref, atol=1e-8)


def test_fleet_dynamics_match_single():
    p = srb.go1_params()
    pf = srb.params_to_fleet(p)
    key = jax.random.PRNGKey(0)
    B = 5
    qs = jax.random.normal(key, (B, 4))
    qs = qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)
    xs = jnp.concatenate(
        [0.1 * jax.random.normal(jax.random.PRNGKey(1), (B, 3)), qs,
         0.5 * jax.random.normal(jax.random.PRNGKey(2), (B, 6))], axis=-1
    )
    us = 20.0 * jax.random.normal(jax.random.PRNGKey(3), (B, 12))
    xd_fleet = srb.quat_srb_dynamics_fleet(xs.T, us.T, pf)
    xd_single = jax.vmap(srb.quat_srb_dynamics, in_axes=(0, 0, None))(xs, us, p)
    np.testing.assert_allclose(xd_fleet.T, xd_single, atol=1e-12)

    J_fleet = srb.quat_srb_jacobian_fleet(xs.T, us.T, pf)
    J_single = jax.vmap(srb.quat_srb_jacobian, in_axes=(0, 0, None))(xs, us, p)
    np.testing.assert_allclose(jnp.moveaxis(J_fleet, -1, 0), J_single, atol=1e-12)


def test_structured_expansions_match_generic():
    """The structured error-state discrete Jacobian (srb.quat_srb_error_
    discrete_jac_fleet), its block decomposition (quat_srb_edj_blocks +
    fleet._structured_q_terms), and the blockwise cost expansion must equal
    the generic dense path E(x1)ᵀ·discretize(fj)·E(x) to fp round-off —
    they are exact algebra over the model's sparsity, not approximations."""
    import quaternion_mpc_tpu.solver.fleet as fl

    spec = quat_mpc._fleet_spec()
    args = _example_batch(batch=16, horizon=10, dtype=jnp.float64)
    prob = quat_mpc.build_fleet_problem(*args, 10)
    x = prob.x0
    u = prob.us_init[0]
    x1 = fl._fleet_step(spec, x, u, prob.params, prob.h)

    # dense generic reference
    Ad, Bd = fl._fleet_discrete_jac(spec, x, u, prob.params, prob.h)
    E0 = fl._error_proj_bl(x, 3, 12)
    E1 = fl._error_proj_bl(x1, 3, 12)
    Ae_ref = fl.bmm(fl.bt(E1), fl.bmm(Ad, E0))
    Be_ref = fl.bmm(fl.bt(E1), Bd)

    Ae, Be = srb.quat_srb_error_discrete_jac_fleet(x, x1, u, prob.params, prob.h)
    np.testing.assert_allclose(np.array(Ae), np.array(Ae_ref), atol=1e-14)
    np.testing.assert_allclose(np.array(Be), np.array(Be_ref), atol=1e-14)

    # block Q-terms vs dense products against a random value function
    rng = np.random.default_rng(3)
    M = rng.standard_normal((16, 12, 12))
    Vxx = jnp.moveaxis(jnp.asarray(np.einsum("bij,bkj->bik", M, M)), 0, -1)
    Vx = jnp.moveaxis(jnp.asarray(rng.standard_normal((16, 12))), 0, -1)
    lam = jnp.zeros((prob.cb.shape[-2], 16), jnp.float64)
    cbk = fl.cb_knots(prob.cb, 10)[0]
    lx, lxx, lu, luu = fl.cost_expansion(
        spec, x, u, prob.x_ref[0], prob.u_ref[0], lam, 10.0, prob, cbk
    )
    blocks = srb.quat_srb_edj_blocks(x, x1, u, prob.params, prob.h)
    Qx, Qu, Qxx, Quu, Qux = fl._structured_q_terms(blocks, Vx, Vxx, lx, lxx, lu, luu)
    AtV = fl.bmm(fl.bt(Ae_ref), Vxx)
    BtV = fl.bmm(fl.bt(Be_ref), Vxx)
    np.testing.assert_allclose(np.array(Qx), np.array(lx + fl.bmv(fl.bt(Ae_ref), Vx)), atol=1e-10)
    np.testing.assert_allclose(np.array(Qu), np.array(lu + fl.bmv(fl.bt(Be_ref), Vx)), atol=1e-10)
    np.testing.assert_allclose(np.array(Qxx), np.array(lxx + fl.bmm(AtV, Ae_ref)), atol=1e-10)
    np.testing.assert_allclose(np.array(Quu), np.array(luu + fl.bmm(BtV, Be_ref)), atol=1e-10)
    np.testing.assert_allclose(np.array(Qux), np.array(fl.bmm(BtV, Ae_ref)), atol=1e-10)


def test_fleet_solver_matches_quat_fixture(fixtures_dir):
    with open(fixtures_dir / "quat_mpc_test.json") as f:
        fix = json.load(f)
    x_ref = jnp.asarray(np.array(fix["reference_state"]))
    u_ref = jnp.asarray(np.array(fix["reference_input"]))
    Cu, cb = friction_pyramid(mu=0.6, fz_max=200.0, contacts=[1, 1, 1, 1])
    B = 3

    tile_bl = lambda a: jnp.broadcast_to(a[..., None], a.shape + (B,))
    prob = FleetProblem(
        x0=tile_bl(x_ref[0]),
        x_ref=tile_bl(x_ref),
        u_ref=tile_bl(u_ref),
        Qd=tile_bl(jnp.array([1.0, 1, 1, 0, 0, 0, 0, 2, 2, 2, 1, 1, 1])),
        Rd=tile_bl(jnp.full((12,), 1e-6)),
        w=jnp.ones((B,)),
        Cu=tile_bl(Cu),
        cb=tile_bl(cb),
        h=jnp.asarray(0.01),
        params=srb.params_to_fleet(srb.go1_params()),
        us_init=tile_bl(u_ref[:20]),
    )
    solver = make_fleet_solver(quat_mpc._fleet_spec(), SolverOptions())
    sol = jax.jit(solver)(prob)
    U = np.moveaxis(np.array(sol.us), -1, 0)  # (B, N, 12)
    X = np.moveaxis(np.array(sol.xs), -1, 0)
    for b in range(B):
        np.testing.assert_allclose(U[b], np.array(fix["input_trajectory"]), atol=1e-4)
        np.testing.assert_allclose(X[b], np.array(fix["state_trajectory"]), atol=1e-5)


def test_fleet_controller_matches_vmapped():
    """End-to-end: fleet-native controller == vmapped per-scenario controller."""
    B, N = 6, 10
    fbk, cmd, wts = _example_batch(batch=B, horizon=N, dtype=jnp.float64)
    fbk = jax.tree.map(jnp.asarray, fbk)
    cmd = jax.tree.map(jnp.asarray, cmd)
    opts = SolverOptions(al_iterations=2, ilqr_iterations=5)

    fleet_ctrl = quat_mpc.make_fleet_controller(N, opts)
    grf_fleet, cost_fleet = jax.jit(fleet_ctrl)(fbk, cmd, wts)

    single_ctrl = quat_mpc.make_controller(N, opts)
    out, sol = jax.jit(jax.vmap(single_ctrl))(fbk, cmd, wts)

    # forces are O(40 N); 1e-5 N absolute allows op-reordering rounding drift
    # amplified through 10 iLQR iterations (identical algorithm, fused graph)
    np.testing.assert_allclose(np.array(grf_fleet), np.array(out.grf_world), atol=1e-5)
    np.testing.assert_allclose(np.array(cost_fleet), np.array(sol.stats.cost), atol=1e-7)
