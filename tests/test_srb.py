"""SRB dynamics + discretization tests.

Analytic Jacobians are checked against jacfwd of the dynamics (exact for the
quat model; the Euler model's Jacobian is a deliberate reference approximation
— AltroUtils.cpp:352-359 — so only the retained blocks are compared)."""

import jax
import jax.numpy as jnp
import numpy as np

from quaternion_mpc_tpu.models import discretize, srb
from quaternion_mpc_tpu.ops import lie


def _params(n_feet=4):
    p = srb.go1_params()
    if n_feet != 4:
        p = p._replace(foot_pos=p.foot_pos[:n_feet])
    return p


def _rand_quat_state(key):
    kq, kv = jax.random.split(key)
    q = jax.random.normal(kq, (4,))
    q = q / jnp.linalg.norm(q)
    rest = 0.5 * jax.random.normal(kv, (9,))
    return jnp.concatenate([rest[:3], q, rest[3:]])


def test_quat_srb_jacobian_matches_autodiff():
    p = _params()
    for seed in range(3):
        key = jax.random.PRNGKey(seed)
        x = _rand_quat_state(key)
        u = 10.0 * jax.random.normal(jax.random.PRNGKey(seed + 100), (12,))
        J_analytic = srb.quat_srb_jacobian(x, u, p)
        J_ad = discretize.autodiff_jacobian(srb.quat_srb_dynamics)(x, u, p)
        np.testing.assert_allclose(J_analytic, J_ad, atol=1e-10)


def test_quat_srb_two_feet():
    """The 2-contact "trot" variant is the same code over a 2-row foot_pos."""
    p = _params(n_feet=2)
    x = _rand_quat_state(jax.random.PRNGKey(0))
    u = 10.0 * jax.random.normal(jax.random.PRNGKey(1), (6,))
    xdot = srb.quat_srb_dynamics(x, u, p)
    assert xdot.shape == (13,)
    J = srb.quat_srb_jacobian(x, u, p)
    assert J.shape == (13, 19)
    J_ad = discretize.autodiff_jacobian(srb.quat_srb_dynamics)(x, u, p)
    np.testing.assert_allclose(J, J_ad, atol=1e-10)


def test_quat_srb_standing_equilibrium():
    """Equal-ish vertical forces summing to m·g give v̇≈0 (up to CoM moment)."""
    p = _params()
    x = jnp.zeros(13).at[3].set(1.0)
    fz = 12.84 * 9.81 / 4
    u = jnp.tile(jnp.array([0.0, 0.0, fz]), 4)
    xdot = srb.quat_srb_dynamics(x, u, p)
    np.testing.assert_allclose(xdot[:3], 0.0, atol=1e-12)  # ṗ = v = 0
    np.testing.assert_allclose(xdot[7:10], 0.0, atol=1e-12)  # force balance
    # angular accel only from CoM-offset gravity moment (x-offset -> pitch moment)
    assert abs(xdot[11]) > 1e-3


def test_euler_srb_jacobian_retained_blocks():
    p = _params()
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(2), (12,))
    u = 10.0 * jax.random.normal(jax.random.PRNGKey(3), (12,))
    J = srb.euler_srb_jacobian(x, u, p)
    J_ad = discretize.autodiff_jacobian(srb.euler_srb_dynamics)(x, u, p)
    # du block is exact
    np.testing.assert_allclose(J[:, 12:], J_ad[:, 12:], atol=1e-10)
    # rpy-rate rows wrt omega are exact
    np.testing.assert_allclose(J[0:6, 6:12], J_ad[0:6, 6:12], atol=1e-10)
    # d(rpy_rate)/dyaw entries are exact
    np.testing.assert_allclose(J[0:2, 2], J_ad[0:2, 2], atol=1e-10)


def test_midpoint_step_and_jacobian_consistent():
    p = _params()
    x = _rand_quat_state(jax.random.PRNGKey(4))
    u = 5.0 * jax.random.normal(jax.random.PRNGKey(5), (12,))
    h = 0.01
    J = discretize.midpoint_jacobian(
        srb.quat_srb_dynamics, srb.quat_srb_jacobian, x, u, p, h
    )
    step = lambda xx, uu: discretize.midpoint_step(srb.quat_srb_dynamics, xx, uu, p, h)
    Jx_ad = jax.jacfwd(step, argnums=0)(x, u)
    Ju_ad = jax.jacfwd(step, argnums=1)(x, u)
    np.testing.assert_allclose(J[:, :13], Jx_ad, atol=1e-10)
    np.testing.assert_allclose(J[:, 13:], Ju_ad, atol=1e-10)


def test_error_projection_and_diff():
    x = _rand_quat_state(jax.random.PRNGKey(6))
    E = discretize.error_projection(x, quat_idx=3, ne=12)
    assert E.shape == (13, 12)
    np.testing.assert_allclose(E[3:7, 3:6], lie.quat_G(x[3:7]), atol=1e-12)
    # diff/retract round trip
    e = 0.01 * jax.random.normal(jax.random.PRNGKey(7), (12,))
    x2 = discretize.state_retract(x, e, quat_idx=3)
    np.testing.assert_allclose(discretize.state_diff(x2, x, quat_idx=3), e, atol=1e-10)
    # E is the chart derivative: d(x_ref ⊞ e)/de at e=0
    Jr = jax.jacfwd(lambda ee: discretize.state_retract(x, ee, quat_idx=3))(jnp.zeros(12))
    np.testing.assert_allclose(Jr, E, atol=1e-10)


def test_vmap_over_scenarios():
    """Everything carries a scenario batch axis via vmap (the DP axis)."""
    p = _params()
    batch = 16
    keys = jax.random.split(jax.random.PRNGKey(8), batch)
    xs = jax.vmap(_rand_quat_state)(keys)
    us = jnp.tile(jnp.array([0.0, 0.0, 30.0] * 4), (batch, 1))
    batched_p = jax.tree.map(lambda a: jnp.tile(a, (batch,) + (1,) * a.ndim), p)
    xdots = jax.vmap(srb.quat_srb_dynamics)(xs, us, batched_p)
    assert xdots.shape == (batch, 13)
    single = srb.quat_srb_dynamics(xs[0], us[0], p)
    np.testing.assert_allclose(xdots[0], single, atol=1e-12)
