"""Pallas Riccati-sweep kernel vs the XLA reference path.

Runs the kernel in interpreter mode on the CPU mesh (conftest forces
JAX_PLATFORMS=cpu), exactly as the TPU build compiles it via Mosaic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _example_batch
from quaternion_mpc_tpu.control import quat_mpc
from quaternion_mpc_tpu.solver import SolverOptions
from quaternion_mpc_tpu.solver import fleet as fl
from quaternion_mpc_tpu.solver import pallas_fleet as pf


def _setup(B=128, N=10):
    spec = quat_mpc._fleet_spec()
    fbk, cmd, wts = _example_batch(batch=B, horizon=N, dtype=jnp.float32)
    prob = jax.jit(lambda f, c, w: quat_mpc.build_fleet_problem(f, c, w, N))(
        fbk, cmd, wts
    )

    def init_roll(prob):
        def stepf(x, u):
            return fl._fleet_step(spec, x, u, prob.params, prob.h), x

        xN, xs0 = jax.lax.scan(stepf, prob.x0, prob.us_init)
        return jnp.concatenate([xs0, xN[None]], axis=0)

    xs = jax.jit(init_roll)(prob)
    return spec, prob, xs, prob.us_init


def test_gj_solve_matches_reference():
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (12, 12, 16), jnp.float32)
    spd = fl.bmm(fl.bt(A), A) + 5.0 * jnp.eye(12, dtype=jnp.float32)[..., None]
    b = jax.random.normal(jax.random.PRNGKey(1), (12, 16), jnp.float32)
    Bm = jax.random.normal(jax.random.PRNGKey(2), (12, 12, 16), jnp.float32)
    d_ref, K_ref = fl.solve_spd_multi(spd, [b, Bm])
    d, K = pf.gj_solve2(spd, b, Bm)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K_ref), atol=1e-5)


def test_pallas_sweep_matches_xla_backward():
    spec, prob, xs, us = _setup()
    N, B = us.shape[0], us.shape[-1]
    lam = 0.1 * jnp.ones((N, prob.cb.shape[0], B), jnp.float32)
    rho = jnp.asarray(1.0, jnp.float32)
    reg = jnp.full((B,), 1e-6, jnp.float32)

    ref = fl.riccati_backward(spec, prob, xs, us, lam, rho, reg)
    out = pf.riccati_backward_pallas(spec, prob, xs, us, lam, rho, reg, interpret=True)
    assert out is not None
    # the recursion amplifies f32 op-reordering differences backward through
    # the horizon; |K| reaches ~550, so compare with a relative tolerance
    for name, a, b in zip(["Ks", "ds", "dV1", "dV2", "g"], ref, out):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-2, atol=2e-1, err_msg=name
        )


def test_pallas_backend_solver_converges():
    spec, prob, xs, us = _setup()
    opts = SolverOptions(al_iterations=2, ilqr_iterations=5)
    sol_xla = jax.jit(fl.make_fleet_solver(spec, opts, backend="xla"))(prob)
    sol_pl = jax.jit(
        fl.make_fleet_solver(spec, opts, backend="pallas_interpret")
    )(prob)
    c_xla = np.asarray(sol_xla.cost)
    c_pl = np.asarray(sol_pl.cost)
    assert np.all(np.isfinite(c_pl))
    # same converged quality (iterate paths may bifurcate per scenario)
    assert np.mean(c_pl) < np.mean(c_xla) * 1.05 + 1e-3


def test_pallas_envelope_fallback():
    """Non-f32 or non-128-multiple batches return None -> XLA fallback."""
    spec, prob, xs, us = _setup(B=128)
    N, B = us.shape[0], us.shape[-1]
    lam = jnp.zeros((N, prob.cb.shape[0], B), jnp.float32)
    out = pf.riccati_backward_pallas(
        spec, prob, xs.astype(jnp.float64), us, lam, 1.0, jnp.zeros((B,)), interpret=True
    )
    assert out is None
