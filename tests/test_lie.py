"""Property tests for quaternion/SO(3) algebra (reference: TestQuatUtils.cpp,
upgraded from print-only smoke checks to real asserts per SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quaternion_mpc_tpu.ops import lie


def random_quats(key, n):
    q = jax.random.normal(key, (n, 4))
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


@pytest.fixture
def qs():
    return random_quats(jax.random.PRNGKey(0), 32)


def test_quat_mult_matches_L(qs):
    q1, q2 = qs[:16], qs[16:]
    direct = lie.quat_mult(q1, q2)
    via_L = jnp.einsum("bij,bj->bi", lie.quat_L(q1), q2)
    np.testing.assert_allclose(direct, via_L, atol=1e-12)


def test_quat_mult_matches_R(qs):
    q1, q2 = qs[:16], qs[16:]
    direct = lie.quat_mult(q1, q2)
    via_R = jnp.einsum("bij,bj->bi", lie.quat_R(q2), q1)
    np.testing.assert_allclose(direct, via_R, atol=1e-12)


def test_conj_is_inverse(qs):
    ident = lie.quat_mult(qs, lie.quat_conj(qs))
    expect = jnp.tile(jnp.array([1.0, 0, 0, 0]), (qs.shape[0], 1))
    np.testing.assert_allclose(ident, expect, atol=1e-12)


def test_cayley_round_trip():
    phi = jax.random.normal(jax.random.PRNGKey(1), (32, 3))
    np.testing.assert_allclose(lie.inv_cayley_map(lie.cayley_map(phi)), phi, atol=1e-12)


def test_cayley_unit_norm():
    phi = 10.0 * jax.random.normal(jax.random.PRNGKey(2), (32, 3))
    np.testing.assert_allclose(jnp.linalg.norm(lie.cayley_map(phi), axis=-1), 1.0, atol=1e-12)


def test_G_is_L_times_H(qs):
    GH = jnp.einsum("bij,jk->bik", lie.quat_L(qs), lie.H())
    np.testing.assert_allclose(lie.quat_G(qs), GH, atol=1e-12)


def test_rotmat_orthonormal(qs):
    R = lie.quat_to_rotmat(qs)
    eye = jnp.eye(3)
    np.testing.assert_allclose(jnp.einsum("bij,bkj->bik", R, R), jnp.tile(eye, (qs.shape[0], 1, 1)), atol=1e-12)
    np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-12)


def test_rotate_matches_rotmat(qs):
    v = jax.random.normal(jax.random.PRNGKey(3), (qs.shape[0], 3))
    np.testing.assert_allclose(
        lie.quat_rotate(qs, v), jnp.einsum("bij,bj->bi", lie.quat_to_rotmat(qs), v), atol=1e-12
    )


def test_euler_quat_round_trip():
    euler = jnp.array([[0.3, -0.4, 1.2], [0.0, 0.0, 0.0], [-1.0, 0.5, -2.0]])
    np.testing.assert_allclose(lie.quat_to_euler(lie.euler_to_quat(euler)), euler, atol=1e-12)


def test_known_rotations():
    # 90° about z
    q = lie.euler_to_quat(jnp.array([0.0, 0.0, jnp.pi / 2]))
    np.testing.assert_allclose(
        lie.quat_rotate(q, jnp.array([1.0, 0.0, 0.0])), jnp.array([0.0, 1.0, 0.0]), atol=1e-12
    )
    np.testing.assert_allclose(q, jnp.array([np.sqrt(0.5), 0, 0, np.sqrt(0.5)]), atol=1e-12)


def test_qdot_formula(qs):
    # q̇ = ½ G(q) ω matches ½ q ⊗ [0, ω]
    omega = jax.random.normal(jax.random.PRNGKey(4), (qs.shape[0], 3))
    omega_quat = jnp.concatenate([jnp.zeros((qs.shape[0], 1)), omega], axis=-1)
    qdot_a = 0.5 * jnp.einsum("bij,bj->bi", lie.quat_G(qs), omega)
    qdot_b = 0.5 * lie.quat_mult(qs, omega_quat)
    np.testing.assert_allclose(qdot_a, qdot_b, atol=1e-12)


def test_skew_cross():
    v = jax.random.normal(jax.random.PRNGKey(5), (8, 3))
    u = jax.random.normal(jax.random.PRNGKey(6), (8, 3))
    np.testing.assert_allclose(jnp.einsum("bij,bj->bi", lie.skew(v), u), jnp.cross(v, u), atol=1e-12)


def test_quat_error_small_angle():
    q_ref = random_quats(jax.random.PRNGKey(7), 8)
    phi = 1e-4 * jax.random.normal(jax.random.PRNGKey(8), (8, 3))
    q = lie.quat_mult(q_ref, lie.cayley_map(phi))
    np.testing.assert_allclose(lie.quat_error(q, q_ref), phi, atol=1e-10)
