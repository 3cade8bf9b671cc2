"""Leg kinematics tests (reference analog: TestInvKin.cpp FK/IK round-trip
on random joint angles with Go1 geometry)."""

import jax
import jax.numpy as jnp
import numpy as np

from quaternion_mpc_tpu.kin import leg


def random_q(key, n):
    lo = jnp.array([-0.8, -1.0, -2.6])
    hi = jnp.array([0.8, 1.5, -0.95])
    return lo + (hi - lo) * jax.random.uniform(key, (n, 3))


def test_fk_default_stance():
    """Near-zero thigh/calf bend puts feet around the configured default
    foothold (gazebo_go1_quat_mpc.yaml:16-30)."""
    rho = leg.go1_rho_fix()
    q = jnp.tile(jnp.array([0.0, 0.75, -1.5]), (4, 1))
    p = leg.fk(q, rho)
    np.testing.assert_allclose(p[0, 0], 0.1881 + p[0, 0] - p[0, 0], atol=0.2)
    # symmetry
    np.testing.assert_allclose(p[0, 0], p[1, 0], atol=1e-12)  # FL/FR same x
    np.testing.assert_allclose(p[0, 1], -p[1, 1], atol=1e-12)  # mirrored y
    np.testing.assert_allclose(p[0, 2], p[1, 2], atol=1e-12)
    assert p[0, 2] < -0.25  # foot well below the hip
    assert p[0, 1] > 0.1    # left foot to the left


def test_ik_fk_round_trip():
    rho = leg.go1_rho_fix()
    for leg_idx in range(4):
        q = random_q(jax.random.PRNGKey(leg_idx), 64)
        p = leg.fk(q, rho[leg_idx])
        q_rec = leg.ik(p, rho[leg_idx])
        p_rec = leg.fk(q_rec, rho[leg_idx])
        # position round trip (the joint solution may differ by branch)
        np.testing.assert_allclose(p_rec, p, atol=1e-9)


def test_ik_exact_joint_recovery():
    """Within the nominal workspace the IK recovers the exact joints."""
    rho = leg.go1_rho_fix()
    q = jnp.array([[0.2, 0.8, -1.6], [-0.3, 0.5, -1.2], [0.0, 1.0, -2.0]])
    for leg_idx in range(4):
        p = leg.fk(q, rho[leg_idx])
        q_rec = leg.ik(p, rho[leg_idx])
        np.testing.assert_allclose(q_rec, q, atol=1e-9)


def test_ik_out_of_reach_no_nan():
    rho = leg.go1_rho_fix()
    p_far = jnp.array([[1.0, 1.0, -2.0], [0.0, 0.0, 0.0], [0.0, 0.0, -10.0]])
    q = leg.ik(p_far, rho[0])
    assert bool(jnp.all(jnp.isfinite(q)))


def test_jacobian_matches_fd():
    rho = leg.go1_rho_fix()
    q = jnp.array([0.1, 0.7, -1.4])
    J = leg.jac(q, rho[0])
    eps = 1e-7
    for j in range(3):
        dp = (leg.fk(q.at[j].add(eps), rho[0]) - leg.fk(q.at[j].add(-eps), rho[0])) / (2 * eps)
        np.testing.assert_allclose(J[:, j], dp, atol=1e-6)


def test_torque_force_round_trip():
    rho = leg.go1_rho_fix()
    q = jnp.array([[0.1, 0.7, -1.4]] * 4)
    f = jnp.array([[1.0, 2.0, -30.0]] * 4)
    tau = leg.joint_torques_from_force(q, f, rho)
    f_rec = leg.foot_force_from_torques(q, -tau, rho)
    np.testing.assert_allclose(f_rec, f, atol=1e-9)


def test_ik_near_matches_ik_on_default_branch():
    """Seeded with ik's own (foot-below) solution, ik_near reproduces it."""
    rho = leg.go1_rho_fix()
    for leg_idx in range(4):
        q = random_q(jax.random.PRNGKey(10 + leg_idx), 64)
        p = leg.fk(q, rho[leg_idx])
        q_a = leg.ik(p, rho[leg_idx])
        q_b = leg.ik_near(p, rho[leg_idx], q_a)
        np.testing.assert_allclose(q_a, q_b, atol=1e-9)


def test_ik_near_recovers_true_joints_any_branch():
    """ik_near(fk(q), q) == q for random q spanning BOTH hip branches —
    the exact current-q recovery ik() alone cannot provide (it pins e=+s,
    so folded configurations round-trip to the other pre-image)."""
    rho = leg.go1_rho_fix()
    for leg_idx in range(4):
        q = random_q(jax.random.PRNGKey(20 + leg_idx), 128)
        p = leg.fk(q, rho[leg_idx])
        q_rec = leg.ik_near(p, rho[leg_idx], q)
        np.testing.assert_allclose(q_rec, q, atol=1e-8)


def test_ik_near_selects_folded_branch():
    """Targets reachable by both hip branches: ik_near picks the branch
    nearest the CURRENT joints (A1Kinematics.h:44-50), and both selected
    solutions are exact FK pre-images."""
    rho = leg.go1_rho_fix()
    for leg_idx in range(4):
        # a folded-over configuration: hip rolled far, leg over the hip axis
        q_folded = jnp.array([[2.4, 0.4, -1.4], [2.8, 0.9, -1.8]])
        p = leg.fk(q_folded, rho[leg_idx])
        # from a nominal pose the solver picks the stance branch...
        q_nom = jnp.tile(jnp.array([0.0, 0.75, -1.5]), (2, 1))
        q_stance = leg.ik_near(p, rho[leg_idx], q_nom)
        # ...from the folded pose it picks (and exactly recovers) the fold
        q_fold_rec = leg.ik_near(p, rho[leg_idx], q_folded)
        np.testing.assert_allclose(q_fold_rec, q_folded, atol=1e-9)
        # both are valid pre-images of the same foot position
        np.testing.assert_allclose(leg.fk(q_stance, rho[leg_idx]), p, atol=1e-9)
        np.testing.assert_allclose(leg.fk(q_fold_rec, rho[leg_idx]), p, atol=1e-9)
        # and they genuinely differ in hip branch
        assert np.all(np.abs(np.asarray(q_stance[:, 0] - q_folded[:, 0])) > 0.3)
