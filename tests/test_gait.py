"""Contact-schedule + swing-curve tests (reference behavior:
LeggedContactFSM.cpp pattern tables and transitions, Utils.cpp quintic)."""

import jax
import jax.numpy as jnp
import numpy as np

from quaternion_mpc_tpu.gait import schedule, swing


def test_quintic_boundary_conditions():
    T = jnp.asarray(0.25)
    p0 = jnp.array([0.0, 0.1, 0.0])
    p1 = jnp.array([0.15, 0.12, 0.0])
    pos0, vel0, _ = swing.quintic_swing_target(jnp.asarray(0.0), T, p0, p1)
    posT, velT, _ = swing.quintic_swing_target(T, T, p0, p1)
    np.testing.assert_allclose(pos0, p0, atol=1e-9)
    np.testing.assert_allclose(posT, p1, atol=1e-9)
    np.testing.assert_allclose(vel0[:2], 0.0, atol=1e-9)
    np.testing.assert_allclose(velT[:2], 0.0, atol=1e-9)
    np.testing.assert_allclose(vel0[2], swing.Z_VEL_LIFTOFF, atol=1e-9)
    np.testing.assert_allclose(velT[2], swing.Z_VEL_TOUCHDOWN, atol=1e-9)
    # apex at midpoint
    pos_mid, vel_mid, _ = swing.quintic_swing_target(T / 2, T, p0, p1)
    np.testing.assert_allclose(pos_mid[2], swing.Z_APEX, atol=1e-9)
    np.testing.assert_allclose(vel_mid[2], 0.0, atol=1e-9)


def test_trot_pattern_alternation():
    """Diagonal pairs: FL/RR stance first half-cycle, FR/RL swing, then flip."""
    pat = schedule.trot_pattern()
    foot = jnp.array([[0.2, 0.14, 0.0], [0.2, -0.14, 0.0], [-0.2, 0.14, 0.0], [-0.2, -0.14, 0.0]])
    state = schedule.init_gait_state(foot, pat)
    dt, freq = 0.005, 2.0  # half-cycle = 50 ticks
    no_contact = jnp.zeros((4,), dtype=bool)

    contacts = []
    for _ in range(120):
        state = schedule.gait_update(state, pat, dt, freq, foot, foot, no_contact)
        contacts.append(np.array(schedule.contact_flags(state, pat)))
    contacts = np.array(contacts)
    # first half cycle: FL(0), RR(3) stance; FR(1), RL(2) swing
    assert contacts[10].tolist() == [True, False, False, True]
    # second half cycle: flipped
    assert contacts[60].tolist() == [False, True, True, False]
    # next cycle: back
    assert contacts[110].tolist() == [True, False, False, True]


def test_early_contact_transition():
    """>90% through swing + foot force → immediate stance (FSM :55-61)."""
    pat = schedule.trot_pattern()
    foot = jnp.zeros((4, 3))
    state = schedule.init_gait_state(foot, pat)
    dt, freq = 0.005, 2.0
    # advance FR (leg 1, swing first) to 92% of its swing (0.92*50 ticks)
    for _ in range(46):
        state = schedule.gait_update(state, pat, dt, freq, foot, foot, jnp.zeros(4, bool))
    assert not bool(schedule.contact_flags(state, pat)[1])
    state = schedule.gait_update(state, pat, dt, freq, foot, foot, jnp.ones(4, bool))
    assert bool(schedule.contact_flags(state, pat)[1])


def test_predict_contact_state():
    pat = schedule.trot_pattern()
    foot = jnp.zeros((4, 3))
    state = schedule.init_gait_state(foot, pat)
    freq = 2.0
    # at phase 0: FL stance; predicting 0.3 cycles ahead (0.15 s) stays stance,
    # predicting 0.35 s ahead (phase 0.7) → FL swing
    pred_now = schedule.predict_contact_state(state, pat, freq, 0.15)
    assert pred_now.tolist() == [True, False, False, True]
    pred_later = schedule.predict_contact_state(state, pat, freq, 0.35)
    assert pred_later.tolist() == [False, True, True, False]


def test_swing_targets_move_toward_goal():
    pat = schedule.trot_pattern()
    start = jnp.array([[0.2, 0.14, 0.0], [0.2, -0.14, 0.0], [-0.2, 0.14, 0.0], [-0.2, -0.14, 0.0]])
    goal = start + jnp.array([0.1, 0.0, 0.0])
    state = schedule.init_gait_state(start, pat)
    dt, freq = 0.005, 2.0
    xs = []
    for _ in range(99):
        state = schedule.gait_update(state, pat, dt, freq, start, goal, jnp.zeros(4, bool))
        xs.append(float(state.target_pos[1, 0]))  # FR swings first
    # FR target should have advanced toward goal x
    assert xs[45] > 0.25
    # and lifted during the swing
    state2 = schedule.init_gait_state(start, pat)
    zmax = 0.0
    for _ in range(40):
        state2 = schedule.gait_update(state2, pat, dt, freq, start, goal, jnp.zeros(4, bool))
        zmax = max(zmax, float(state2.target_pos[1, 2]))
    assert zmax > 0.05


def test_patterns_wellformed():
    for pat in [
        schedule.trot_pattern(),
        schedule.trot_with_stand_pattern(),
        schedule.crawl_pattern(),
        schedule.stand_pattern(),
    ]:
        assert pat.states.shape == pat.switch_time.shape
        # last valid segment always ends at phase 1.0
        last = pat.n_seg - 1
        ends = jnp.take_along_axis(pat.switch_time, last[:, None], axis=1)[:, 0]
        np.testing.assert_allclose(ends, 1.0)
