"""Analytic terrain worlds for the batched plant.

Role parity with the reference's Gazebo worlds (``unitree_gazebo/worlds/``:
`earth` flat ground, `space` zero gravity, `slope`, `stairs` + the stairs
model) — here each world is a pure height/normal field so foothold targets,
contact detection, and the terrain estimator run on-device with no mesh.

A world is *data*: `TerrainParams(kind, ...)` selects the field with
`lax.switch`, so a fleet can mix worlds across scenarios (kind is traced).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

FLAT = 0
SLOPE = 1
STAIRS = 2

KINDS = {"flat": FLAT, "earth": FLAT, "slope": SLOPE, "stairs": STAIRS}


class TerrainParams(NamedTuple):
    """kind: 0 flat | 1 slope | 2 stairs (int32, batchable).

    slope_grade: rise/run along +x for `slope` (worlds/slope.world ramp).
    stair_rise / stair_run: step height/depth for `stairs`
    (unitree_gazebo stairs model: 0.17 m rise / 0.30 m run analog).
    gravity: world gravity magnitude — 0.0 reproduces `space.world`.
    """

    kind: jnp.ndarray
    slope_grade: jnp.ndarray
    stair_rise: jnp.ndarray
    stair_run: jnp.ndarray
    gravity: jnp.ndarray


def make_terrain(
    kind: str = "flat",
    slope_grade: float = 0.2,
    stair_rise: float = 0.17,
    stair_run: float = 0.30,
    gravity: float = 9.81,
    dtype=jnp.float32,
) -> TerrainParams:
    if kind == "space":
        gravity = 0.0
        kind = "flat"
    return TerrainParams(
        kind=jnp.asarray(KINDS[kind], jnp.int32),
        slope_grade=jnp.asarray(slope_grade, dtype),
        stair_rise=jnp.asarray(stair_rise, dtype),
        stair_run=jnp.asarray(stair_run, dtype),
        gravity=jnp.asarray(gravity, dtype),
    )


def height(tp: TerrainParams, xy: jnp.ndarray) -> jnp.ndarray:
    """Ground height z(x, y). xy: (..., 2) -> (...)."""
    x = xy[..., 0]
    flat_z = jnp.zeros_like(x)
    slope_z = tp.slope_grade * jnp.maximum(x, 0.0)
    # stairs start at x = 0, climbing in +x
    n_step = jnp.floor(jnp.maximum(x, 0.0) / tp.stair_run)
    stairs_z = tp.stair_rise * n_step * (x > 0.0)
    zs = jnp.stack([flat_z, slope_z, stairs_z], axis=0)
    return jnp.take_along_axis(
        zs, jnp.broadcast_to(tp.kind, x.shape)[None], axis=0
    )[0]


def normal(tp: TerrainParams, xy: jnp.ndarray) -> jnp.ndarray:
    """Unit surface normal at (x, y): (..., 3). Stairs treads are flat."""
    x = xy[..., 0]
    up = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0], dtype=xy.dtype), xy.shape[:-1] + (3,)
    )
    g = tp.slope_grade
    slope_n = jnp.stack(
        [
            jnp.where(x > 0.0, -g, 0.0) / jnp.sqrt(1.0 + g * g),
            jnp.zeros_like(x),
            jnp.where(x > 0.0, 1.0 / jnp.sqrt(1.0 + g * g), 1.0),
        ],
        axis=-1,
    )
    is_slope = (tp.kind == SLOPE)
    return jnp.where(jnp.broadcast_to(is_slope, x.shape)[..., None], slope_n, up)


def penetration(tp: TerrainParams, pos_world: jnp.ndarray) -> jnp.ndarray:
    """Signed depth of a point below the terrain surface (positive inside)."""
    return height(tp, pos_world[..., :2]) - pos_world[..., 2]


def contact_geometry(tp: TerrainParams, pos_world: jnp.ndarray):
    """(normal, penetration) for the CONTACT solver — box-SDF resolution on
    stairs.

    The naive height-field treatment (`penetration` above) reads a foot that
    has drifted a millimeter past a riser edge while still below the upper
    tread as a RISE-deep vertical penetration — a force bomb (measured:
    50 rad/s joint-velocity spikes on riser clips that trip the safety
    kill). The solid step is a box: when the horizontal depth past the
    riser face is smaller than the vertical depth below the tread, the
    nearest surface is the FACE, so the contact is a shallow horizontal
    push (normal −x̂, depth = distance past the face) — which is what a
    physical foot grazing a riser feels. Flat/slope kinds are unchanged."""
    xy = pos_world[..., :2]
    x = pos_world[..., 0]
    z = pos_world[..., 2]
    n_surf = normal(tp, xy)
    pen_v = height(tp, xy) - z

    # horizontal depth past the current riser face (stairs climb in +x).
    # The FIRST riser is at x = stair_run — for x in [0, stair_run) the foot
    # is on the flat approach with no face behind it, so the face branch
    # must stay inert there (same base>0 guard as snap_to_ground): without
    # it, a stance foot within the ~1 cm blend band past the stairs origin
    # gets a spuriously face-weighted, reduced-normal contact on flat ground.
    x_rel = x - tp.stair_run * jnp.floor(jnp.maximum(x, 0.0) / tp.stair_run)
    big = jnp.asarray(1e3, pos_world.dtype)
    depth_h = jnp.where(x >= tp.stair_run, x_rel, big)
    # SMOOTH face/tread blend: a hard switch makes the normal flip
    # direction every substep for a foot wedged exactly at the step corner
    # (depth_h ≈ pen_v), which rings the low-inertia calf against the
    # anchor-spring friction at ~50 rad/s (measured). Blend over a ~1 cm
    # band instead — the corner becomes a rounded edge.
    w_face = jax.nn.sigmoid((pen_v - depth_h) / 0.01)
    on_stairs = (
        jnp.broadcast_to(tp.kind == STAIRS, x.shape) & (pen_v > 0.0)
    )
    w_face = jnp.where(on_stairs, w_face, 0.0)
    face_n = jnp.broadcast_to(
        jnp.asarray([-1.0, 0.0, 0.0], dtype=pos_world.dtype),
        pos_world.shape[:-1] + (3,),
    )
    n_out = w_face[..., None] * face_n + (1.0 - w_face[..., None]) * n_surf
    n_out = n_out / jnp.linalg.norm(n_out, axis=-1, keepdims=True)
    pen_out = w_face * jnp.minimum(depth_h, pen_v) + (1.0 - w_face) * pen_v
    return n_out, pen_out


def contact_probability(tp: TerrainParams, pos_world, force_normal, threshold=10.0):
    """Sigmoid contact confidence 1/(1+e^{-10(F-thr)}) gated by proximity
    (BaseInterface.cpp:234-249 sigmoid + the plant's height query)."""
    sig = 1.0 / (1.0 + jnp.exp(-10.0 * (force_normal - threshold)))
    near = penetration(tp, pos_world) > -0.01
    return sig * near.astype(sig.dtype)


FOOTHOLD_EDGE_MARGIN = 0.06  # m, min landing distance from a riser edge


def snap_to_ground(
    tp: TerrainParams, pos_world: jnp.ndarray, edge_forward: bool = False
) -> jnp.ndarray:
    """Project a foothold target onto the terrain surface (replaces the
    flat-ground `target[..., 2] = 0` in the walking loop).

    On STAIRS the target x is first nudged at least ``FOOTHOLD_EDGE_MARGIN``
    away from the riser edges (foothold adaptation): a Raibert target
    landing millimeters past an edge (a) forces the swing foot to cross the
    riser plane at the very end of its descent, grazing the face, and
    (b) sits exactly where a centimeter of state-estimate error aliases a
    full rise in the estimator's terrain height reference. Landing
    mid-tread removes both failure modes at the source.

    ``edge_forward``: resolution side for a target within ``margin`` PAST
    an edge. False (default): fall BACK to the lower tread — safe for the
    trot on moderate stairs, BUT it makes the band
    [edge−margin, edge+margin) a one-way trap for a slowly-advancing leg:
    both sides resolve BACKWARD, so consecutive Raibert targets pin the
    foot at edge−margin while the torso walks on, stretching the leg to
    collapse (measured r5: the rear feet never left tread 0 on the 0.17 m
    crawl; the 'kinematic wall' was this trap, not leg length). True:
    resolve to edge+margin — land ON the new tread just past the face
    (nearest-side semantics); the vertical-first clearing swing handles
    the late riser crossing. Use for climbing gaits."""
    x = pos_world[..., 0]
    base = tp.stair_run * jnp.floor(jnp.maximum(x, 0.0) / tp.stair_run)
    x_rel = x - base
    margin = jnp.minimum(FOOTHOLD_EDGE_MARGIN, 0.45 * tp.stair_run)
    # the first riser is at x = run (the field is flat through x = 0), so
    # the near-edge rule applies only for base > 0
    near_edge = (x_rel < margin) & (base > 0.0)
    resolved = base + margin if edge_forward else base - margin
    x_stairs = jnp.where(
        near_edge, resolved,
        jnp.minimum(x, base + tp.stair_run - margin),
    )
    x_stairs = jnp.where(x > 0.0, x_stairs, x)
    on_stairs = jnp.broadcast_to(tp.kind == STAIRS, x.shape)
    x_out = jnp.where(on_stairs, x_stairs, x)
    xy = jnp.stack([x_out, pos_world[..., 1]], axis=-1)
    z = height(tp, xy)
    return jnp.concatenate([xy, z[..., None]], axis=-1)
