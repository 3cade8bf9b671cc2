"""Swing-foot trajectories: quintic per-axis polynomial (and legacy Bézier).

Mirrors the boundary conditions of the reference
(``legged_ctrl/src/utils/Utils.cpp:236-293``): position/velocity pinned at
t=0 and t=T, a midpoint condition (z-apex 0.1 m, xy midpoint with the
peak-velocity heuristic v_mid = 1.26/T·‖Δxy‖), returning pos/vel/acc.
Vectorized over legs and scenarios; the 6×6 boundary solve is batched.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

Z_APEX = 0.1          # m (Utils.cpp:259)
Z_VEL_LIFTOFF = 0.1   # m/s (Utils.cpp:256)
Z_VEL_TOUCHDOWN = -0.1
XY_MID_VEL_GAIN = 1.26  # (Utils.cpp:247)
# rise threshold that switches a swing to the vertical-first clearing
# profile: above this the target sits on a HIGHER surface with an obstacle
# face between (stair riser); the reference's single quintic moves forward
# while still low and stubs the toe on the face
CLEARING_RISE = 0.06


def _smoothstep(s):
    s = jnp.clip(s, 0.0, 1.0)
    return s * s * (3.0 - 2.0 * s)


def _smoothstep_d(s):
    inside = (s >= 0.0) & (s <= 1.0)
    s = jnp.clip(s, 0.0, 1.0)
    return jnp.where(inside, 6.0 * s * (1.0 - s), 0.0)


def _smoothstep_dd(s):
    inside = (s >= 0.0) & (s <= 1.0)
    s = jnp.clip(s, 0.0, 1.0)
    return jnp.where(inside, 6.0 - 12.0 * s, 0.0)


def clearing_swing_target(t, T, p_start, p_end,
                          f_up: float = 0.4, f_fwd: float = 0.9):
    """Vertical-FIRST swing for riser-scale climbs (no reference analog —
    the reference never demonstrates closed-loop stairs at the joint
    level): rise to the apex over the first ``f_up`` of the swing while
    holding xy, translate horizontally at apex height over
    [f_up, f_fwd], descend onto the target over [f_fwd, 1]. All three
    segments are C1 smoothstep blends with zero boundary velocities, so
    the foot crosses the riser plane at apex height instead of dragging
    its toe into the face."""
    s = t / jnp.maximum(T, 1e-9)
    z_s, z_e = p_start[..., 2], p_end[..., 2]
    apex = jnp.maximum(z_s, z_e) + Z_APEX

    s1 = s / f_up
    s2 = (s - f_up) / (f_fwd - f_up)
    s3 = (s - f_fwd) / (1.0 - f_fwd)
    u1, u2, u3 = _smoothstep(s1), _smoothstep(s2), _smoothstep(s3)
    d1 = _smoothstep_d(s1) / (f_up * T)
    d2 = _smoothstep_d(s2) / ((f_fwd - f_up) * T)
    d3 = _smoothstep_d(s3) / ((1.0 - f_fwd) * T)
    a1 = _smoothstep_dd(s1) / (f_up * T) ** 2
    a2 = _smoothstep_dd(s2) / ((f_fwd - f_up) * T) ** 2
    a3 = _smoothstep_dd(s3) / ((1.0 - f_fwd) * T) ** 2

    z = z_s + (apex - z_s) * u1 - (apex - z_e) * u3
    vz = (apex - z_s) * d1 - (apex - z_e) * d3
    az = (apex - z_s) * a1 - (apex - z_e) * a3

    dxy = p_end[..., :2] - p_start[..., :2]
    xy = p_start[..., :2] + dxy * u2[..., None]
    vxy = dxy * d2[..., None]
    axy = dxy * a2[..., None]

    pos = jnp.concatenate([xy, z[..., None]], axis=-1)
    vel = jnp.concatenate([vxy, vz[..., None]], axis=-1)
    acc = jnp.concatenate([axy, az[..., None]], axis=-1)
    return pos, vel, acc


def _boundary_matrix(T, dtype):
    """Rows: value@0, value@T, vel@0, vel@T, value@T/2, vel@T/2."""
    z = jnp.zeros_like(T)
    one = jnp.ones_like(T)
    T2, T3, T4, T5 = T * T, T**3, T**4, T**5
    return jnp.stack(
        [
            jnp.stack([one, z, z, z, z, z], -1),
            jnp.stack([one, T, T2, T3, T4, T5], -1),
            jnp.stack([z, one, z, z, z, z], -1),
            jnp.stack([z, one, 2 * T, 3 * T2, 4 * T3, 5 * T4], -1),
            jnp.stack([one, T / 2, T2 / 4, T3 / 8, T4 / 16, T5 / 32], -1),
            jnp.stack([z, one, T, 3 * T2 / 4, 4 * T3 / 8, 5 * T4 / 16], -1),
        ],
        axis=-2,
    ).astype(dtype)


def quintic_swing_target(
    t: jnp.ndarray, T: jnp.ndarray, p_start: jnp.ndarray, p_end: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Evaluate the quintic swing curve at time t of a swing of duration T.

    p_start/p_end: (..., 3) world-frame liftoff and touchdown targets.
    Returns (pos, vel, acc), each (..., 3).
    """
    dtype = p_start.dtype
    C = _boundary_matrix(T, dtype)

    d = p_end - p_start
    dx, dy = d[..., 0], d[..., 1]
    v_xy_mid = (XY_MID_VEL_GAIN / T) * jnp.sqrt(dx * dx + dy * dy)
    theta = jnp.arctan2(jnp.abs(dy), jnp.abs(dx))
    v_x_mid = jnp.sign(dx) * v_xy_mid * jnp.cos(theta)
    v_y_mid = jnp.sign(dy) * v_xy_mid * jnp.sin(theta)
    # jnp.sign(0) = 0 but reference uses (dx >= 0 ? 1 : -1); cos/sin terms
    # vanish with |d|=0 anyway, so the difference is only exact zeros.

    zeros = jnp.zeros_like(dx)
    # z apex RELATIVE to the higher of liftoff/touchdown: the reference's
    # absolute 0.1 m (Utils.cpp:259) assumes the flat world's z≈0 ground —
    # on slope/stairs worlds an absolute apex would drive the swing foot
    # into the terrain. Identical on flat ground (max(0,0)+0.1).
    apex = jnp.maximum(p_start[..., 2], p_end[..., 2]) + Z_APEX

    def axis_con(p0, pT, v0, vT, mid, vmid):
        return jnp.stack([p0, pT, v0, vT, mid, vmid], axis=-1)

    cons = jnp.stack(
        [
            axis_con(
                p_start[..., 0], p_end[..., 0], zeros, zeros,
                0.5 * (p_start[..., 0] + p_end[..., 0]), v_x_mid,
            ),
            axis_con(
                p_start[..., 1], p_end[..., 1], zeros, zeros,
                0.5 * (p_start[..., 1] + p_end[..., 1]), v_y_mid,
            ),
            axis_con(
                p_start[..., 2], p_end[..., 2],
                jnp.full_like(dx, Z_VEL_LIFTOFF), jnp.full_like(dx, Z_VEL_TOUCHDOWN),
                apex, zeros,
            ),
        ],
        axis=-2,
    )  # (..., 3, 6)

    coeff = jnp.linalg.solve(C[..., None, :, :], cons[..., :, :, None])[..., 0]

    tp = jnp.stack([jnp.ones_like(t), t, t**2, t**3, t**4, t**5], axis=-1)
    tv = jnp.stack(
        [jnp.zeros_like(t), jnp.ones_like(t), 2 * t, 3 * t**2, 4 * t**3, 5 * t**4],
        axis=-1,
    )
    ta = jnp.stack(
        [jnp.zeros_like(t)] * 2 + [2 * jnp.ones_like(t), 6 * t, 12 * t**2, 20 * t**3],
        axis=-1,
    )
    pos = jnp.einsum("...ak,...k->...a", coeff, tp)
    vel = jnp.einsum("...ak,...k->...a", coeff, tv)
    acc = jnp.einsum("...ak,...k->...a", coeff, ta)

    # riser-scale climbs switch to the vertical-first clearing profile
    # (the quintic stays bit-exact for every flat/slope swing — the blend
    # only engages when the target is a full CLEARING_RISE above liftoff)
    rise = p_end[..., 2] - p_start[..., 2]
    use_clear = (rise > CLEARING_RISE)[..., None]
    pos_c, vel_c, acc_c = clearing_swing_target(t, T, p_start, p_end)
    pos = jnp.where(use_clear, pos_c, pos)
    vel = jnp.where(use_clear, vel_c, vel)
    acc = jnp.where(use_clear, acc_c, acc)
    return pos, vel, acc


def bezier_swing_target(
    t: jnp.ndarray,
    p_start: jnp.ndarray,
    p_end: jnp.ndarray,
    clearance: float = 0.22,
    terrain_pitch: jnp.ndarray | float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Legacy 4th-order Bézier swing curve (Utils.cpp:165-220).

    Control points per axis: [start, start, end, end, end]; the z-axis lifts
    point 1 by FOOT_SWING_CLEARANCE1 (0) and point 2 by clearance +
    0.5·sin(terrain_pitch). Velocity output is zero, matching the reference's
    (vestigially) disabled derivative computation.
    """
    coeffs = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0], dtype=p_start.dtype)
    t = jnp.clip(t, 0.0, 1.0)
    powers = jnp.stack([t**i for i in range(5)], axis=-1)
    rev = jnp.stack([(1.0 - t) ** (4 - i) for i in range(5)], axis=-1)
    basis = coeffs * powers * rev  # (..., 5)

    ctrl = jnp.stack(
        [p_start, p_start, p_end, p_end, p_end], axis=-2
    )  # (..., 5, 3)
    lift = jnp.zeros_like(ctrl)
    lift = lift.at[..., 2, 2].add(clearance + 0.5 * jnp.sin(jnp.asarray(terrain_pitch)))
    ctrl = ctrl + lift
    pos = jnp.einsum("...k,...ka->...a", basis, ctrl)
    return pos, jnp.zeros_like(pos)
