"""Contact-aided linear Kalman filter for torso pose/velocity.

Port of the reference's ``BasicKF`` (``legged_ctrl/src/estimation/BasicKF.cpp``,
header ``include/estimation/BasicKF.h``): 18 states (p, v, 4 foot positions),
28 measurements (4× FK position residual, 4× leg-odometry velocity, 4 foot
heights), orientation assumed known from the IMU. Same noise constants
(header :13-20), the same contact-gated ×1e3 noise inflation (:97-107), the
same anti-drift covariance surgery (:138-142) — restructured as a pure
``(state, inputs) -> state`` function over an explicit pytree, batchable with
vmap (the reference is single-robot, mutable, and mutex-guarded).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from quaternion_mpc_tpu.ops import lie

STATE_SIZE = 18
MEAS_SIZE = 28
NUM_LEG = 4
PROCESS_NOISE_PIMU = 0.01
PROCESS_NOISE_VIMU = 0.01
PROCESS_NOISE_PFOOT = 0.01
SENSOR_NOISE_PIMU_REL_FOOT = 0.001
SENSOR_NOISE_VIMU_REL_FOOT = 0.1
SENSOR_NOISE_ZFOOT = 0.001
GRAVITY = 9.81


class KFState(NamedTuple):
    x: jnp.ndarray  # (18,) [p, v, foot_FL, foot_FR, foot_RL, foot_RR]
    P: jnp.ndarray  # (18, 18)
    initialized: jnp.ndarray  # bool


def _measurement_matrix(dtype):
    """Fixed C (BasicKF.cpp:14-20)."""
    C = np.zeros((MEAS_SIZE, STATE_SIZE))
    for i in range(NUM_LEG):
        C[3 * i : 3 * i + 3, 0:3] = -np.eye(3)
        C[3 * i : 3 * i + 3, 6 + 3 * i : 9 + 3 * i] = np.eye(3)
        C[12 + 3 * i : 15 + 3 * i, 3:6] = np.eye(3)
        C[24 + i, 6 + 3 * i + 2] = 1.0
    return jnp.asarray(C, dtype=dtype)


def init_state(
    torso_rot_mat: jnp.ndarray, foot_pos_body: jnp.ndarray, dtype=None
) -> KFState:
    """BasicKF::init_state (BasicKF.cpp:59-71): p₀=(0,0,0.09), feet from FK."""
    dtype = dtype or torso_rot_mat.dtype
    p0 = jnp.array([0.0, 0.0, 0.09], dtype=dtype)
    feet_world = foot_pos_body @ torso_rot_mat.T + p0
    x = jnp.concatenate([p0, jnp.zeros((3,), dtype=dtype), feet_world.reshape(-1)])
    return KFState(x=x, P=3.0 * jnp.eye(STATE_SIZE, dtype=dtype), initialized=jnp.asarray(True))


class KFInputs(NamedTuple):
    torso_rot_mat: jnp.ndarray      # (3,3) attitude from IMU
    torso_lin_acc_body: jnp.ndarray  # (3,)
    torso_ang_vel_body: jnp.ndarray  # (3,)
    foot_pos_body: jnp.ndarray      # (4,3) FK
    foot_lin_vel_rel: jnp.ndarray   # (4,3) J·dq per leg
    contacts: jnp.ndarray           # (4,) estimated contact ∈ [0,1]


HEIGHT_INNOVATION_GATE = 0.05  # m; ~riser-aliasing detector threshold


def update(state: KFState, inp: KFInputs, dt,
           foot_height_ref=None,
           foot_height_noise_scale=None) -> Tuple[KFState, jnp.ndarray, jnp.ndarray]:
    """One KF tick; returns (state, pos_world, vel_world).

    ``foot_height_ref``: optional (4,) expected ground height under each
    foot. The reference's BasicKF pins stance-foot height to 0 (flat
    ground); the terrain-aware variant (the casadi submodule's
    ``A1KFCombineLOWithFootTerrain`` role) measures foot height against
    the known walking surface instead — required on slopes/stairs, where
    the flat-ground assumption drives the height estimate divergent.

    ``foot_height_noise_scale``: optional (4,) multiplier on the per-foot
    height measurement noise — the caller's riser-proximity de-weighting
    (pass the local terrain-height SPREAD within the xy estimate
    uncertainty: near a stair riser a ±1 cm horizontal error aliases a
    full 0.17 m rise into the height reference, so that measurement must
    carry riser-sized variance, not millimeter variance).

    Independent of the caller, an INNOVATION GATE (Mahalanobis-style on
    the height residual, threshold ``HEIGHT_INNOVATION_GATE``) inflates
    the noise of any foot whose height innovation is implausible for a
    millimeter-grade measurement — the in-filter backstop for unmodeled
    terrain discontinuity."""
    dtype = state.x.dtype
    eye3 = jnp.eye(3, dtype=dtype)
    R = inp.torso_rot_mat
    contact = inp.contacts

    A = jnp.eye(STATE_SIZE, dtype=dtype)
    A = A.at[0:3, 3:6].set(dt * eye3)
    B = jnp.zeros((STATE_SIZE, 3), dtype=dtype)
    B = B.at[3:6, 0:3].set(dt * eye3)
    u = R @ inp.torso_lin_acc_body + jnp.array([0.0, 0.0, -GRAVITY], dtype=dtype)

    # noise matrices with contact gating (BasicKF.cpp:93-107)
    infl = 1.0 + (1.0 - contact) * 1e3  # (4,)
    Qd = jnp.concatenate(
        [
            jnp.full((3,), PROCESS_NOISE_PIMU * dt / 20.0, dtype),
            jnp.full((3,), PROCESS_NOISE_VIMU * dt * GRAVITY / 20.0, dtype),
            jnp.repeat(infl * dt * PROCESS_NOISE_PFOOT, 3),
        ]
    )
    Q = jnp.diag(Qd)
    hscale = (
        jnp.ones((NUM_LEG,), dtype)
        if foot_height_noise_scale is None
        else foot_height_noise_scale
    )

    C = _measurement_matrix(dtype)

    # process update
    xbar = A @ state.x + B @ u
    Pbar = A @ state.P @ A.T + Q
    yhat = C @ xbar

    # measurements (BasicKF.cpp:117-123)
    fk_world = inp.foot_pos_body @ R.T  # (4,3)
    leg_v = -inp.foot_lin_vel_rel - jnp.cross(
        jnp.broadcast_to(inp.torso_ang_vel_body, (NUM_LEG, 3)), inp.foot_pos_body
    )
    vel_meas = (1.0 - contact[:, None]) * state.x[3:6] + contact[:, None] * (leg_v @ R.T)
    href = jnp.zeros((NUM_LEG,), dtype) if foot_height_ref is None else foot_height_ref
    height_meas = contact * href + (1.0 - contact) * (
        state.x[2] + inp.foot_pos_body[:, 2]
    )
    y = jnp.concatenate([fk_world.reshape(-1), vel_meas.reshape(-1), height_meas])

    # innovation gate on the height rows: a residual far beyond what a
    # mm-grade height measurement can produce means the reference itself is
    # wrong (foot on the other side of a riser) — de-weight smoothly, and
    # only for stance feet (swing feet are already ×1e3 inflated).
    # Two re-entry paths keep a confidently-wrong z estimate from locking
    # in (the gate would otherwise suppress exactly the only absolute-height
    # measurement that could correct it, since R grows ~err² while P grows
    # only ~1e-4/tick):
    #  (a) the inflation is CAPPED — a gated measurement still corrects,
    #      just ~1000× slower, so a post-transient offset decays instead of
    #      persisting forever;
    #  (b) CONSENSUS disable — when every stance foot gates at once, the
    #      innovations agree and the terrain-aliasing hypothesis (one foot
    #      on the wrong side of a riser) cannot explain them; a common
    #      offset is estimator error, so the gate stands down entirely.
    innov_h = (y - yhat)[24:28]
    a2 = (innov_h / HEIGHT_INNOVATION_GATE) ** 2
    gate = 1.0 + jnp.minimum(jnp.maximum(a2 - 1.0, 0.0) * 1e3, 1e3)
    stance = contact > 0.5
    n_stance = jnp.sum(stance)
    n_gated = jnp.sum(stance & (a2 > 1.0))
    consensus = (n_stance > 0) & (n_gated == n_stance)
    gate = jnp.where(consensus, 1.0, gate)
    Rd = jnp.concatenate(
        [
            jnp.repeat(infl * SENSOR_NOISE_PIMU_REL_FOOT, 3),
            jnp.repeat(infl * SENSOR_NOISE_VIMU_REL_FOOT, 3),
            infl * SENSOR_NOISE_ZFOOT * hscale * gate,
        ]
    )
    Rm = jnp.diag(Rd)

    S = C @ Pbar @ C.T + Rm
    S = 0.5 * (S + S.T)
    err = y - yhat
    Serr = jnp.linalg.solve(S, err)
    x_new = xbar + Pbar @ C.T @ Serr
    SC = jnp.linalg.solve(S, C)
    P_new = Pbar - Pbar @ C.T @ SC @ Pbar
    P_new = 0.5 * (P_new + P_new.T)

    # anti-drift covariance surgery (BasicKF.cpp:138-142)
    det2 = P_new[0, 0] * P_new[1, 1] - P_new[0, 1] * P_new[1, 0]
    drift = det2 > 1e-6
    P_surg = P_new.at[0:2, 2:].set(0.0).at[2:, 0:2].set(0.0)
    P_surg = P_surg.at[0:2, 0:2].multiply(0.1)
    P_new = jnp.where(drift, P_surg, P_new)

    new_state = KFState(x=x_new, P=P_new, initialized=state.initialized)
    return new_state, x_new[0:3], x_new[3:6]
