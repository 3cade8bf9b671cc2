"""Estimator tests: the linear KF (BasicKF port) and the contact-aided EKF
must recover torso position/velocity from IMU + leg kinematics on a
synthetic constant-velocity trajectory (feet pinned). Filters run under a
jitted lax.scan — the same shape the runtime uses."""

import jax
import jax.numpy as jnp
import numpy as np

from quaternion_mpc_tpu.est import ekf, kf

DT = 0.002
VEL = jnp.array([0.3, 0.1, 0.0])
FOOT0 = jnp.array(
    [[0.19, 0.13, -0.3], [0.19, -0.13, -0.3], [-0.19, 0.13, -0.3], [-0.19, -0.13, -0.3]]
)
POS0 = jnp.array([0.0, 0.0, 0.3])
FEET_WORLD = FOOT0 + POS0


def _kf_inputs(k, contacts, foot_vel_override=None):
    pos = POS0 + VEL * k * DT
    fvr = -jnp.broadcast_to(VEL, (4, 3))
    if foot_vel_override is not None:
        fvr = fvr.at[1].set(foot_vel_override)
    return kf.KFInputs(
        torso_rot_mat=jnp.eye(3),
        torso_lin_acc_body=jnp.array([0.0, 0.0, kf.GRAVITY]),
        torso_ang_vel_body=jnp.zeros(3),
        foot_pos_body=FEET_WORLD - pos,
        foot_lin_vel_rel=fvr,
        contacts=contacts,
    )


def _run_kf(T, contacts, foot_vel_override=None):
    state = kf.init_state(jnp.eye(3), FEET_WORLD - POS0)

    def body(state, k):
        state, p, v = kf.update(state, _kf_inputs(k, contacts, foot_vel_override), DT)
        return state, (p, v)

    state, (ps, vs) = jax.jit(
        lambda s: jax.lax.scan(body, s, jnp.arange(T, dtype=jnp.float64))
    )(state)
    return state, ps[-1], vs[-1]


def test_basic_kf_tracks_velocity():
    _, p_est, v_est = _run_kf(800, jnp.ones(4))
    np.testing.assert_allclose(np.array(v_est), np.array(VEL), atol=0.02)
    np.testing.assert_allclose(float(p_est[2]), 0.3, atol=0.02)


def test_basic_kf_swing_leg_gating():
    """A swinging leg's bogus velocity must not corrupt the estimate."""
    _, _, v_est = _run_kf(
        800, jnp.array([1.0, 0.0, 1.0, 1.0]), foot_vel_override=jnp.array([5.0, -5.0, 3.0])
    )
    np.testing.assert_allclose(np.array(v_est), np.array(VEL), atol=0.05)


def test_ekf_tracks_velocity_and_attitude():
    state = ekf.init_state(POS0, jnp.zeros(3), FOOT0)

    def body(state, k):
        pos = POS0 + VEL * k * DT
        inp = ekf.EkfInputs(
            torso_lin_acc_body=jnp.array([0.0, 0.0, ekf.GRAVITY]),
            torso_ang_vel_body=jnp.zeros(3),
            foot_pos_body=FEET_WORLD - pos,
            foot_lin_vel_rel=-jnp.broadcast_to(VEL, (4, 3)),
            contacts=jnp.ones(4),
        )
        state, p, v = ekf.update(state, inp, DT)
        return state, (p, v)

    state, (ps, vs) = jax.jit(
        lambda s: jax.lax.scan(body, s, jnp.arange(4000, dtype=jnp.float64))
    )(state)
    np.testing.assert_allclose(np.array(vs[-1]), np.array(VEL), atol=0.01)
    np.testing.assert_allclose(np.array(state.x[6:9]), 0.0, atol=0.001)
    # position tracks the true trajectory
    np.testing.assert_allclose(
        np.array(ps[-1]), np.array(POS0 + VEL * 3999 * DT), atol=0.02
    )


def test_ekf_mocap_update_pins_position():
    state = ekf.init_state(POS0, jnp.zeros(3), FOOT0)
    drifted = state._replace(x=state.x.at[0:3].add(jnp.array([0.5, -0.2, 0.1])))
    fixed = ekf.mocap_update(drifted, POS0, jnp.asarray(0.0))
    assert float(jnp.linalg.norm(fixed.x[0:3] - POS0)) < float(
        jnp.linalg.norm(drifted.x[0:3] - POS0)
    )


def test_kf_vmap_batch():
    state = kf.init_state(jnp.eye(3), FEET_WORLD - POS0)
    B = 3
    states = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), state)
    inp = _kf_inputs(0, jnp.ones(4))
    inps = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), inp)
    new_states, ps, vs = jax.vmap(kf.update, in_axes=(0, 0, None))(states, inps, DT)
    assert ps.shape == (B, 3)


def test_kf_height_innovation_gate():
    """A riser-aliased height reference (one foot's href wrong by a full
    0.17 m rise) must NOT yank the height estimate: the innovation gate
    inflates that measurement's noise by ~(innov/gate)^2*1e3. Without the
    gate the first update moves z by centimeters; with it, sub-millimeter."""
    import jax.numpy as jnp

    from quaternion_mpc_tpu.est import kf
    from quaternion_mpc_tpu.ops import lie

    dtype = jnp.float64
    rot = lie.quat_to_rotmat(jnp.array([1.0, 0.0, 0.0, 0.0], dtype))
    foot_body = jnp.asarray(
        [[0.19, 0.13, -0.3], [0.19, -0.13, -0.3],
         [-0.19, 0.13, -0.3], [-0.19, -0.13, -0.3]], dtype)
    st = kf.init_state(rot, foot_body, dtype=dtype)
    # settle the filter on consistent flat-ground measurements first
    inp = kf.KFInputs(
        torso_rot_mat=rot,
        torso_lin_acc_body=jnp.array([0.0, 0.0, 9.81], dtype),
        torso_ang_vel_body=jnp.zeros(3, dtype),
        foot_pos_body=foot_body,
        foot_lin_vel_rel=jnp.zeros((4, 3), dtype),
        contacts=jnp.ones(4, dtype),
    )
    import jax

    upd = jax.jit(lambda s, href: kf.update(s, inp, 0.01, foot_height_ref=href))
    flat_href = jnp.zeros((4,), dtype)
    for _ in range(200):
        st, pos, _ = upd(st, flat_href)
    z0 = float(st.x[2])

    # one foot's href suddenly claims a full rise (riser aliasing)
    bad_href = jnp.array([0.17, 0.0, 0.0, 0.0], dtype)
    st_gated, _, _ = upd(st, bad_href)
    dz = abs(float(st_gated.x[2]) - z0)
    assert dz < 1e-3, f"gated update moved z by {dz:.4f} m"

    # sanity: a CONSISTENT small href change is still tracked (gate off)
    ok_href = jnp.full((4,), 0.01, dtype)
    st2 = st
    for _ in range(50):
        st2, _, _ = upd(st2, ok_href)
    assert abs(float(st2.x[2]) - (z0 + 0.01)) < 5e-3
