"""Terrain estimation from stance footholds.

Role parity with the reference's walking-surface fit (`Utils::get_walk_surf_coef`,
``legged_ctrl/src/utils/Utils.cpp:128-145``), dihedral angle
(``Utils.cpp:117-126``) and the (commented-out but shipped) pitch-adaptation
logic in ``QuatMpc::terrain_update`` (``src/mpc/QuatMpc.cpp:307-335``):

1. least-squares plane z = a0 + a1·x + a2·y through the recent stance
   foothold positions (absolute/CoM frame), surface normal ~ [a1, a2, -1];
2. dihedral angle between the fitted plane and flat ground, passed through a
   moving-average filter and clamped to ±0.349 rad (±20°);
3. desired body pitch set to ±terrain_angle depending on walking direction.

Everything is batched/jittable; the filter state is an explicit pytree
(MovingWindowFilter semantics, ``include/utils/MovingWindowFilter.hpp``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from quaternion_mpc_tpu.utils import filters

FLAT_GROUND_COEF = (0.0, 0.0, 1.0)  # z-up plane normal (QuatMpc.cpp:309)
MAX_TERRAIN_ANGLE = 0.349           # rad, QuatMpc.cpp:320-325


def fit_walk_surface(foot_pos_abs: jnp.ndarray, weights=None) -> jnp.ndarray:
    """Fit z = a0 + a1·x + a2·y through foothold positions.

    foot_pos_abs: (..., n_feet, 3) recent stance foot positions (absolute
    frame — torso-centered, world-aligned). weights: optional (..., n_feet)
    per-foot weights (e.g. contact confidence). Returns the surface
    coefficient vector [a1, a2, -1] (Utils.cpp:142-144 convention).

    Solves the 3x3 normal equations in closed form (WᵀW)⁻¹Wᵀz with a
    Tikhonov floor so degenerate foothold sets (collinear feet) stay finite
    — the reference uses an SVD pseudo-inverse for the same reason
    (Utils.cpp:107-116).
    """
    x = foot_pos_abs[..., 0]
    y = foot_pos_abs[..., 1]
    z = foot_pos_abs[..., 2]
    ones = jnp.ones_like(x)
    W = jnp.stack([ones, x, y], axis=-1)  # (..., n_feet, 3)
    if weights is not None:
        W = W * weights[..., None]
        z = z * weights
    WtW = jnp.einsum("...fi,...fj->...ij", W, W)
    WtW = WtW + 1e-6 * jnp.eye(3, dtype=foot_pos_abs.dtype)
    Wtz = jnp.einsum("...fi,...f->...i", W, z)
    a = jnp.linalg.solve(WtW, Wtz)
    return jnp.stack(
        [a[..., 1], a[..., 2], -jnp.ones_like(a[..., 0])], axis=-1
    )


def dihedral_angle(coef_1, coef_2) -> jnp.ndarray:
    """Angle between two planes given [a, b, c] coefficient vectors
    (Utils::cal_dihedral_angle, Utils.cpp:117-126)."""
    num = jnp.abs(jnp.sum(coef_1 * coef_2, axis=-1))
    den = jnp.linalg.norm(coef_1, axis=-1) * jnp.linalg.norm(coef_2, axis=-1)
    return jnp.arccos(jnp.clip(num / jnp.maximum(den, 1e-12), -1.0, 1.0))


class TerrainState(NamedTuple):
    """Filtered terrain estimate (pytree; batchable)."""

    angle_filter: filters.WindowState
    terrain_angle: jnp.ndarray  # filtered, clamped dihedral angle (rad)
    surf_coef: jnp.ndarray      # (3,) latest fitted [a1, a2, -1]


def init_terrain_state(window: int = 100, dtype=jnp.float32) -> TerrainState:
    return TerrainState(
        angle_filter=filters.window_init(window, dtype=dtype),
        terrain_angle=jnp.zeros((), dtype),
        surf_coef=jnp.asarray([0.0, 0.0, -1.0], dtype),
    )


def terrain_update(
    state: TerrainState,
    foot_pos_abs: jnp.ndarray,
    movement_mode=1,
    torso_height=None,
    contact_weights=None,
) -> tuple[TerrainState, jnp.ndarray]:
    """One terrain tick, matching QuatMpc::terrain_update (QuatMpc.cpp:307-335):
    fit plane → UNSIGNED dihedral vs flat ground → moving-average filter →
    clamp ±0.349 rad → desired pitch signed by the front-minus-rear stance
    foot height difference (F_R_diff > 0.05 m ⇒ front feet higher ⇒ pitch up,
    i.e. −terrain_angle).

    Gating mirrors the reference: the filter advances and pitch adaptation
    applies only in walking mode (``movement_mode > 0``) with the torso above
    0.1 m; otherwise the state is held and pitch_d = 0 (reference: leaves
    ``torso_euler_d[1]`` untouched).

    foot_pos_abs rows are FL, FR, RL, RR (absolute/CoM frame). Returns
    (new_state, pitch_d).
    """
    dtype = foot_pos_abs.dtype
    coef = fit_walk_surface(foot_pos_abs, contact_weights)
    flat = jnp.asarray(FLAT_GROUND_COEF, dtype)
    raw = dihedral_angle(flat, coef)  # unsigned, reference filters this
    active = jnp.asarray(movement_mode) > 0
    if torso_height is not None:
        active = active & (jnp.asarray(torso_height) > 0.1)
    filt_new, angle_new = filters.window_update(state.angle_filter, raw)
    filt = jax.tree.map(
        lambda new, old: jnp.where(active, new, old), filt_new, state.angle_filter
    )
    angle = jnp.where(active, angle_new, state.terrain_angle)
    angle = jnp.clip(angle, -MAX_TERRAIN_ANGLE, MAX_TERRAIN_ANGLE)
    # F_R_diff = z_FL + z_FR − z_RL − z_RR (QuatMpc.cpp:328)
    z = foot_pos_abs[..., 2]
    f_r_diff = z[..., 0] + z[..., 1] - z[..., 2] - z[..., 3]
    pitch_d = jnp.where(f_r_diff > 0.05, -angle, angle)
    pitch_d = jnp.where(active, pitch_d, jnp.zeros_like(pitch_d))
    return TerrainState(filt, angle, coef), pitch_d
