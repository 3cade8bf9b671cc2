"""Classic progression systems used by the reference solver test-suite
(``legged_ctrl/src/test/test_altro/AltroTestUtils.cpp``): double integrator,
pendulum, kinematic bicycle. They exercise the generic (vector-space) path of
the trajectory optimizer exactly like the reference's TestDoubleIntegrator /
TestPendulum / TestBicycle executables.
"""

from __future__ import annotations

import jax.numpy as jnp


def double_integrator_dynamics(x, u, params):
    """Continuous 2·dim double integrator: ẋ = [v, u]."""
    del params
    dim = u.shape[-1]
    return jnp.concatenate([x[dim:], u])


PENDULUM_MASS = 1.0
PENDULUM_LENGTH = 0.5
PENDULUM_FRICTION = 0.1
PENDULUM_GRAVITY = 9.81


def pendulum_dynamics(x, u, params):
    """Torque-actuated pendulum (AltroTestUtils.cpp:48-61 constants)."""
    del params
    m = PENDULUM_MASS * PENDULUM_LENGTH * PENDULUM_LENGTH
    theta, omega = x[0], x[1]
    omega_dot = (
        u[0] / m
        - PENDULUM_GRAVITY * jnp.sin(theta) / PENDULUM_LENGTH
        - PENDULUM_FRICTION * omega / m
    )
    return jnp.stack([omega, omega_dot])


def bicycle_dynamics(x, u, params):
    """Kinematic bicycle, CoG reference frame (AltroTestUtils.cpp:134-168).

    x = [px, py, theta, delta], u = [v, delta_dot];
    params = (length, dist_to_rear_wheels) — defaults (2.7, 1.5).
    """
    length, lr = params
    v, delta_dot = u[0], u[1]
    theta, delta = x[2], x[3]
    beta = jnp.arctan2(lr * delta, length)
    omega = v * jnp.cos(beta) * jnp.tan(delta) / length
    return jnp.stack(
        [
            v * jnp.cos(theta + beta),
            v * jnp.sin(theta + beta),
            omega,
            delta_dot,
        ]
    )
