"""Contact-schedule "FSM" as pure, batched functions over an explicit pytree.

Replaces the reference's stateful per-leg ``LeggedContactFSM``
(``legged_ctrl/src/utils/LeggedContactFSM.cpp``) with the same pattern tables
as *data* and the transition logic as masked ops:

- pattern tables: trot (:87-108), trot-with-stand (:110-150), crawl
  (:152-193), stand (:195-206) — encoded as padded (n_legs, MAX_SEG) arrays;
- early-contact transition when >90% through swing with foot force (:55-67);
- swing targets from the quintic curve (:237-246);
- ``predict_contact_state`` horizon prediction (:272-286), which the
  reference declared but never wired into the MPC — here
  ``predict_contact_schedule`` feeds per-knot (N+1, n_feet) contact
  schedules into ``quat_mpc.build_problem`` (the walking steps in
  ``runtime/step.py`` pass them by default).

All functions vmap over legs and over scenarios.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from quaternion_mpc_tpu.gait import swing as swing_mod

SWING = 0
STANCE = 1
MAX_SEG = 4  # max segments per leg across all reference patterns (3) + pad


class GaitPattern(NamedTuple):
    """Per-leg cyclic pattern: segment states + cumulative switch times.

    states: (n_legs, MAX_SEG) int32 (SWING/STANCE, padded with STANCE)
    switch_time: (n_legs, MAX_SEG) phase in (0, 1] at which each segment ends
        (padded with 1.0)
    n_seg: (n_legs,) int32 number of valid segments
    """

    states: jnp.ndarray
    switch_time: jnp.ndarray
    n_seg: jnp.ndarray


def _pattern(rows):
    n_legs = len(rows)
    states = np.full((n_legs, MAX_SEG), STANCE, dtype=np.int32)
    times = np.ones((n_legs, MAX_SEG))
    n_seg = np.zeros((n_legs,), dtype=np.int32)
    for i, segs in enumerate(rows):
        n_seg[i] = len(segs)
        for j, (s, t) in enumerate(segs):
            states[i, j] = s
            times[i, j] = t
    return GaitPattern(
        states=jnp.asarray(states),
        switch_time=jnp.asarray(times),
        n_seg=jnp.asarray(n_seg),
    )


def trot_pattern() -> GaitPattern:
    """Diagonal pairs offset by half a cycle (LeggedContactFSM.cpp:87-108)."""
    st, sw = STANCE, SWING
    return _pattern(
        [
            [(st, 0.5), (sw, 1.0)],  # FL
            [(sw, 0.5), (st, 1.0)],  # FR
            [(sw, 0.5), (st, 1.0)],  # RL
            [(st, 0.5), (sw, 1.0)],  # RR
        ]
    )


def trot_with_stand_pattern() -> GaitPattern:
    """Trot with an all-stance dwell (LeggedContactFSM.cpp:110-150)."""
    st, sw = STANCE, SWING
    return _pattern(
        [
            [(st, 0.6), (sw, 1.0)],
            [(st, 0.1), (sw, 0.5), (st, 1.0)],
            [(st, 0.1), (sw, 0.5), (st, 1.0)],
            [(st, 0.6), (sw, 1.0)],
        ]
    )


def crawl_pattern() -> GaitPattern:
    """One leg swings at a time (LeggedContactFSM.cpp:152-193)."""
    st, sw = STANCE, SWING
    return _pattern(
        [
            [(sw, 0.25), (st, 1.0)],
            [(st, 0.25), (sw, 0.5), (st, 1.0)],
            [(st, 0.5), (sw, 0.75), (st, 1.0)],
            [(st, 0.75), (sw, 1.0)],
        ]
    )


def crawl_dwell_pattern() -> GaitPattern:
    """Crawl with a short ALL-STANCE settle dwell after every swing (no
    reference analog — the reference crawl chains swings back-to-back,
    LeggedContactFSM.cpp:152-193). On full-height stairs the dwell gives
    the MPC a four-leg window to re-center the body before the next
    liftoff — the straddle-phase roll-over happens exactly when a swing
    starts from an un-settled three-leg support."""
    st, sw = STANCE, SWING
    return _pattern(
        [
            [(sw, 0.20), (st, 1.0)],
            [(st, 0.25), (sw, 0.45), (st, 1.0)],
            [(st, 0.50), (sw, 0.70), (st, 1.0)],
            [(st, 0.75), (sw, 0.95), (st, 1.0)],
        ]
    )


def stand_pattern(n_legs: int = 4) -> GaitPattern:
    return _pattern([[(STANCE, 1.0)]] * n_legs)


class GaitState(NamedTuple):
    """Explicit per-leg FSM state (all (n_legs,) or (n_legs, 3); batchable)."""

    phase: jnp.ndarray
    seg_idx: jnp.ndarray          # int32 current segment per leg
    seg_start: jnp.ndarray        # phase at which the current segment started
    swing_start_pos: jnp.ndarray  # (n_legs, 3) world liftoff position
    target_pos: jnp.ndarray       # (n_legs, 3) FSM foot position target
    target_vel: jnp.ndarray
    target_acc: jnp.ndarray
    terrain_height: jnp.ndarray   # (n_legs,) foot z recorded at stance exit
    foothold: jnp.ndarray         # (n_legs, 3) rate-limited swing endpoint


def init_gait_state(foot_pos_world: jnp.ndarray, pattern: GaitPattern) -> GaitState:
    n_legs = foot_pos_world.shape[-2]
    dtype = foot_pos_world.dtype
    z = jnp.zeros((n_legs,), dtype=dtype)
    return GaitState(
        phase=z,
        seg_idx=jnp.zeros((n_legs,), dtype=jnp.int32),
        seg_start=z,
        swing_start_pos=foot_pos_world,
        target_pos=foot_pos_world,
        target_vel=jnp.zeros_like(foot_pos_world),
        target_acc=jnp.zeros_like(foot_pos_world),
        terrain_height=foot_pos_world[..., 2],
        foothold=foot_pos_world,
    )


def _seg_state(pattern: GaitPattern, idx):
    return jnp.take_along_axis(pattern.states, idx[..., None], axis=-1)[..., 0]


def _seg_end(pattern: GaitPattern, idx):
    return jnp.take_along_axis(pattern.switch_time, idx[..., None], axis=-1)[..., 0]


def gait_update(
    state: GaitState,
    pattern: GaitPattern,
    dt,
    gait_freq,
    foot_pos_world: jnp.ndarray,
    foot_pos_target_world: jnp.ndarray,
    foot_contact: jnp.ndarray,
) -> GaitState:
    """One FSM tick for all legs at once (LeggedContactFSM::update semantics).

    foot_contact: (n_legs,) bool — early-contact flag source.
    Returns the new GaitState; read contacts with `contact_flags(state, pattern)`.
    """
    dtype = foot_pos_world.dtype
    phase = state.phase + gait_freq * dt
    cur_state = _seg_state(pattern, state.seg_idx)
    # pattern tables are stored at default precision; compute in the caller's
    seg_end = _seg_end(pattern, state.seg_idx).astype(dtype)

    denom = jnp.maximum(seg_end - state.seg_start, 1e-9)
    percent = jnp.clip((phase - state.seg_start) / denom, 0.0, 1.0)

    # transitions
    stance_to_swing = (cur_state == STANCE) & (phase >= seg_end)
    swing_done = percent >= 1.0
    early_contact = (percent > 0.9) & foot_contact
    swing_to_stance = (cur_state == SWING) & (swing_done | early_contact)
    transition = stance_to_swing | swing_to_stance

    next_idx = jnp.where(
        transition, (state.seg_idx + 1) % pattern.n_seg, state.seg_idx
    )
    wrapped = transition & (next_idx < state.seg_idx)
    phase = jnp.where(wrapped, phase - 1.0, phase)
    seg_start = jnp.where(transition, phase, state.seg_start)
    seg_end_new = _seg_end(pattern, next_idx).astype(dtype)
    new_state = _seg_state(pattern, next_idx)

    # stance-exit bookkeeping: record terrain height (LeggedContactFSM.cpp:80-84)
    terrain_height = jnp.where(
        stance_to_swing, foot_pos_world[..., 2], state.terrain_height
    )
    # swing-enter: record liftoff position
    swing_start_pos = jnp.where(
        stance_to_swing[..., None], foot_pos_world, state.swing_start_pos
    )

    # rate-limited swing endpoint: the commanded foothold follows the
    # planner's target with a per-tick step bound. On flat/slope ground the
    # Raibert target drifts millimeters per tick and the limit never
    # engages (identical behavior); on stairs the foothold-margin clamp
    # TELEPORTS the target a stride + a rise when it first clears an edge
    # (snap_to_ground fall-back), and feeding that discontinuity straight
    # into the swing curve steps the position command mid-swing — a 48
    # rad/s PD torque spike (measured). Liftoff snaps directly (the curve
    # starts at p_start regardless of endpoint, so a fresh endpoint at
    # t=0 is continuous by construction).
    # per-leg updates in the (possibly new) segment
    denom_new = jnp.maximum(seg_end_new - seg_start, 1e-9)
    percent_new = jnp.clip((phase - seg_start) / denom_new, 0.0, 1.0)

    step_lim = 0.06  # m per FSM tick
    foothold = state.foothold + jnp.clip(
        foot_pos_target_world - state.foothold, -step_lim, step_lim
    )
    # LATCH after 35% of the swing — but only for riser-scale climbs: a
    # late endpoint change (or the clearing-profile switch it can trigger)
    # steps the position command mid-flight; early-swing commands barely
    # depend on the endpoint, so updates there are continuous. Flat/slope
    # swings (sub-CLEARING_RISE) keep the reference's continuous mid-swing
    # Raibert adaptation — with the rate limit never engaging there, their
    # behavior is unchanged. Stance legs track freely.
    in_swing_now = (new_state == SWING)
    climb = (
        jnp.maximum(state.foothold[..., 2], foot_pos_target_world[..., 2])
        - swing_start_pos[..., 2]
    ) > swing_mod.CLEARING_RISE
    latched = in_swing_now & (percent_new >= 0.35) & climb
    foothold = jnp.where(latched[..., None], state.foothold, foothold)
    foothold = jnp.where(
        stance_to_swing[..., None], foot_pos_target_world, foothold
    )
    T_swing = 0.5 / gait_freq
    pos, vel, acc = swing_mod.quintic_swing_target(
        0.5 * percent_new / gait_freq * jnp.ones_like(state.phase),
        T_swing * jnp.ones_like(state.phase),
        swing_start_pos,
        foothold,
    )
    in_swing = (new_state == SWING)[..., None]
    # stance-enter: freeze the foot where it touched down
    stance_entered = swing_to_stance[..., None]
    target_pos = jnp.where(
        in_swing, pos, jnp.where(stance_entered, foot_pos_world, state.target_pos)
    )
    target_vel = jnp.where(in_swing, vel, jnp.zeros_like(vel))
    target_acc = jnp.where(in_swing, acc, jnp.zeros_like(acc))

    return GaitState(
        phase=phase.astype(dtype),
        seg_idx=next_idx,
        seg_start=seg_start.astype(dtype),
        swing_start_pos=swing_start_pos,
        target_pos=target_pos,
        target_vel=target_vel,
        target_acc=target_acc,
        terrain_height=terrain_height,
        foothold=foothold,
    )


def contact_flags(state: GaitState, pattern: GaitPattern) -> jnp.ndarray:
    """(n_legs,) bool — True when the leg's plan is STANCE."""
    return _seg_state(pattern, state.seg_idx) == STANCE


def predict_contact_state(
    state: GaitState, pattern: GaitPattern, gait_freq, dt
) -> jnp.ndarray:
    """Planned contact a time dt ahead (LeggedContactFSM.cpp:272-286).

    Pure lookup into the pattern table at the wrapped predicted phase; usable
    per MPC knot to build a time-varying contact schedule.
    """
    predicted = jnp.mod(state.phase + gait_freq * dt, 1.0)
    # first segment whose switch_time >= predicted phase
    ge = pattern.switch_time >= predicted[..., None]
    idx = jnp.argmax(ge, axis=-1)
    return _seg_state(pattern, idx) == STANCE


def predict_contact_schedule(
    state: GaitState, pattern: GaitPattern, gait_freq, h, n_knots: int
) -> jnp.ndarray:
    """(n_knots, n_legs) planned contacts at t, t+h, ..., t+(n_knots−1)h —
    the per-knot MPC contact schedule the reference declared but never wired
    (LeggedContactFSM.cpp:272-286; TODO at ConvexMpc.cpp:82). Row 0 is the
    CURRENT FSM state (respecting early-contact transitions), later rows are
    pattern-table lookups at the predicted phase."""
    import jax

    dts = jnp.arange(n_knots, dtype=state.phase.dtype) * h
    sched = jax.vmap(
        lambda dt: predict_contact_state(state, pattern, gait_freq, dt)
    )(dts)
    return sched.at[0].set(contact_flags(state, pattern))
