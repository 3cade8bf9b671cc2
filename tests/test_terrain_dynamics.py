"""Terrain estimation + per-leg inverse dynamics (Go1Dynamics parity layer)."""

import jax
import jax.numpy as jnp
import numpy as np

from quaternion_mpc_tpu.kin import leg as leg_mod
from quaternion_mpc_tpu.kin import leg_dynamics as ld
from quaternion_mpc_tpu.kin import terrain


def test_plane_fit_recovers_slope():
    rng = np.random.default_rng(0)
    a0, a1, a2 = 0.05, 0.3, -0.1
    feet = rng.uniform(-0.3, 0.3, (8, 2)).astype(np.float32)
    z = a0 + a1 * feet[:, 0] + a2 * feet[:, 1]
    pos = jnp.asarray(np.concatenate([feet, z[:, None]], axis=1))
    coef = terrain.fit_walk_surface(pos)
    np.testing.assert_allclose(np.asarray(coef), [a1, a2, -1.0], atol=1e-3)


def test_dihedral_angle_flat_vs_slope():
    flat = jnp.asarray([0.0, 0.0, 1.0])
    slope = jnp.asarray([np.tan(0.2), 0.0, -1.0])  # 0.2 rad incline
    ang = terrain.dihedral_angle(flat, slope)
    np.testing.assert_allclose(float(ang), 0.2, atol=1e-6)


def test_terrain_update_pitches_into_slope():
    st = terrain.init_terrain_state(window=1)
    # uphill ahead: z grows with x, front feet (FL, FR) higher than rear
    feet = jnp.asarray(
        [[0.2, 0.15, 0.06], [0.2, -0.15, 0.06], [-0.2, 0.15, -0.06], [-0.2, -0.15, -0.06]],
        jnp.float32,
    )
    st, pitch_d = terrain.terrain_update(st, feet, movement_mode=1, torso_height=0.3)
    assert float(st.terrain_angle) > 0.1
    # F_R_diff = 0.24 > 0.05 -> pitch = -terrain_angle (QuatMpc.cpp:328-333)
    assert float(pitch_d) < 0.0
    # downhill (front feet lower) flips the sign
    feet_down = feet.at[:, 2].set(jnp.asarray([-0.06, -0.06, 0.06, 0.06], jnp.float32))
    _, pitch_down = terrain.terrain_update(st, feet_down, 1, 0.3)
    assert float(pitch_down) > 0.0


def test_terrain_update_gated_when_not_walking():
    """Reference gate: adaptation only in walking mode with torso z > 0.1."""
    st = terrain.init_terrain_state(window=1)
    feet = jnp.asarray(
        [[0.2, 0.15, 0.06], [0.2, -0.15, 0.06], [-0.2, 0.15, -0.06], [-0.2, -0.15, -0.06]],
        jnp.float32,
    )
    st2, pitch_d = terrain.terrain_update(st, feet, movement_mode=0, torso_height=0.3)
    assert float(pitch_d) == 0.0
    assert float(st2.terrain_angle) == float(st.terrain_angle)
    _, pitch_low = terrain.terrain_update(st, feet, movement_mode=1, torso_height=0.05)
    assert float(pitch_low) == 0.0


def test_chain_fk_matches_closed_form():
    rng = np.random.default_rng(1)
    rho = leg_mod.go1_rho_fix(jnp.float32)
    for i in range(4):
        q = jnp.asarray(rng.uniform(-1.0, 1.0, 3).astype(np.float32))
        p_chain = ld.foot_position(q, rho[i])
        p_ref = leg_mod.fk(q, rho[i])
        np.testing.assert_allclose(np.asarray(p_chain), np.asarray(p_ref), atol=1e-5)


def test_mass_matrix_spd_and_symmetric():
    rho = leg_mod.go1_rho_fix(jnp.float32)[0]
    params = ld.go1_leg_params()
    q = jnp.asarray([0.1, 0.7, -1.4], jnp.float32)
    M = np.asarray(ld.mass_matrix(q, rho, params))
    np.testing.assert_allclose(M, M.T, atol=1e-6)
    assert np.all(np.linalg.eigvalsh(M) > 0)


def test_inverse_dynamics_energy_consistency():
    """Power balance: τ·q̇ = dE/dt along any trajectory point."""
    rho = leg_mod.go1_rho_fix(jnp.float32)[0]
    params = ld.go1_leg_params()
    g = jnp.asarray([0.0, 0.0, -9.81], jnp.float32)
    q = jnp.asarray([0.2, 0.5, -1.1], jnp.float32)
    dq = jnp.asarray([0.3, -0.4, 0.6], jnp.float32)
    qdd = jnp.asarray([1.0, -2.0, 0.5], jnp.float32)
    tau = ld.inverse_dynamics(q, dq, qdd, rho, params, g)
    # dE/dt = d(T+V)/dt = ∇_qE·q̇ + ∇_q̇T·q̈
    E = lambda q_, dq_: ld.kinetic_energy(q_, dq_, rho, params) + ld.potential_energy(
        q_, rho, params, g
    )
    dE_q = jax.grad(E, argnums=0)(q, dq) @ dq
    dE_dq = jax.grad(E, argnums=1)(q, dq) @ qdd
    np.testing.assert_allclose(float(tau @ dq), float(dE_q + dE_dq), rtol=1e-4)


def test_gravity_compensation_holds_leg():
    """τ_g equals inverse dynamics at rest (q̇ = q̈ = 0)."""
    rho = leg_mod.go1_rho_fix(jnp.float32)[1]
    params = ld.go1_leg_params(mirror_y=True)
    q = jnp.asarray([-0.05, 0.6, -1.3], jnp.float32)
    z3 = jnp.zeros(3, jnp.float32)
    tau_id = ld.inverse_dynamics(q, z3, z3, rho, params)
    tau_g = ld.gravity_compensation(q, rho, params)
    np.testing.assert_allclose(np.asarray(tau_id), np.asarray(tau_g), atol=1e-5)


def test_task_space_id_reaches_desired_accel():
    """Forward-simulate with τ from task-space ID: foot accel matches."""
    rho = leg_mod.go1_rho_fix(jnp.float32)[0]
    params = ld.go1_leg_params()
    q = jnp.asarray([0.1, 0.6, -1.2], jnp.float32)
    dq = jnp.asarray([0.2, -0.1, 0.3], jnp.float32)
    a_des = jnp.asarray([1.0, -0.5, 2.0], jnp.float32)
    tau = ld.task_space_inverse_dynamics(q, dq, a_des, rho, params)
    # forward dynamics: q̈ = M⁻¹(τ − c)
    M = ld.mass_matrix(q, rho, params)
    c = ld.bias_forces(q, dq, rho, params, jnp.asarray([0.0, 0.0, -9.81], jnp.float32))
    qdd = jnp.linalg.solve(M, tau - c)
    # resulting foot accel = J q̈ + J̇ q̇
    J = leg_mod.jac(q, rho)
    _, jdot_dq = jax.jvp(lambda qq: leg_mod.jac(qq, rho) @ dq, (q,), (dq,))
    a = J @ qdd + jdot_dq
    np.testing.assert_allclose(np.asarray(a), np.asarray(a_des), atol=1e-4)


def test_calibration_jacobians_match_fd():
    rho = leg_mod.go1_rho_fix(jnp.float64)[0]
    q = jnp.asarray([0.15, 0.55, -1.25], jnp.float64)
    dfk = np.asarray(leg_mod.dfk_drho(q, rho))
    eps = 1e-6
    for j in range(5):
        dr = np.zeros(5)
        dr[j] = eps
        fd = (
            np.asarray(leg_mod.fk(q, rho + jnp.asarray(dr)))
            - np.asarray(leg_mod.fk(q, rho - jnp.asarray(dr)))
        ) / (2 * eps)
        np.testing.assert_allclose(dfk[:, j], fd, atol=1e-5)
    dJ = np.asarray(leg_mod.dJ_dq(q, rho))
    assert dJ.shape == (3, 3, 3)
    assert np.all(np.isfinite(dJ))


def test_tau_ctrl_with_id_feedforward():
    """Swing legs get inverse-dynamics feedforward; stance unchanged."""
    import jax.numpy as jnp

    from quaternion_mpc_tpu.control import torque
    from quaternion_mpc_tpu.control.types import ControlOutput, RobotFeedback

    rho = leg_mod.go1_rho_fix(jnp.float32)
    q = jnp.tile(jnp.asarray([0.0, 0.8, -1.6], jnp.float32), (4, 1))
    foot = leg_mod.fk(q, rho)
    fbk = RobotFeedback(
        torso_pos_world=jnp.asarray([0.0, 0.0, 0.3], jnp.float32),
        torso_quat=jnp.asarray([1.0, 0, 0, 0], jnp.float32),
        torso_lin_vel_world=jnp.zeros(3, jnp.float32),
        torso_ang_vel_body=jnp.zeros(3, jnp.float32),
        foot_pos_body=foot,
        foot_contact=jnp.asarray([1.0, 0.0, 1.0, 0.0]),
        joint_pos=q.reshape(-1),
        joint_vel=jnp.zeros(12, jnp.float32),
    )
    out = ControlOutput(
        grf_body=jnp.tile(jnp.asarray([0.0, 0.0, 30.0], jnp.float32), (4, 1)),
        grf_world=jnp.tile(jnp.asarray([0.0, 0.0, 30.0], jnp.float32), (4, 1)),
        foot_pos_target_world=foot + jnp.asarray([0.0, 0.0, 0.3], jnp.float32),
        foot_vel_target_world=jnp.zeros((4, 3), jnp.float32),
        mpc_cost=jnp.zeros(()),
        mpc_iterations=jnp.zeros((), jnp.int32),
    )
    contacts = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    params = torque.go1_leg_params_all()
    acc = jnp.tile(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (4, 1))
    base = torque.tau_ctrl_update(fbk, out, rho, contacts)
    with_id = torque.tau_ctrl_update_with_id(fbk, out, rho, contacts, params, acc)
    # stance legs identical, swing legs now carry feedforward torque
    np.testing.assert_allclose(
        np.asarray(with_id.tau[0]), np.asarray(base.tau[0]), atol=1e-6
    )
    assert float(np.abs(np.asarray(with_id.tau[1])).sum()) > 0.01
    assert float(np.abs(np.asarray(base.tau[1])).sum()) < 1e-6
