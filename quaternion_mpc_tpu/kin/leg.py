"""3-DoF quadruped leg kinematics: closed-form FK / analytic IK / Jacobian.

Role parity with the reference's MATLAB-codegen ``A1Kinematics``
(``legged_ctrl/src/utils/A1Kinematics.cpp``, header ``:15-63``) but derived
fresh from the leg geometry (SURVEY.md §7.5): hip-roll about x, thigh and
calf pitch about y, with per-leg parameters

    rho_fix = [offset_x, offset_y, hip_len (signed), l_thigh, l_calf]

exactly the values installed at ``BaseInterface.cpp:12-34`` (Go1: ±0.1881,
±0.04675, ±0.0812, 0.213, 0.213). Joint order per leg: (hip, thigh, calf),
legs ordered FL, FR, RL, RR. All functions are batched over leading axes and
autodiff-friendly; the Jacobian is exact (forward-mode of the closed form).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Go1 geometry (BaseInterface.cpp:12-34, LeggedParams.h:14-15)
GO1_RHO_FIX = np.array(
    [
        [0.1881, 0.04675, 0.0812, 0.213, 0.213],   # FL
        [0.1881, -0.04675, -0.0812, 0.213, 0.213],  # FR
        [-0.1881, 0.04675, 0.0812, 0.213, 0.213],   # RL
        [-0.1881, -0.04675, -0.0812, 0.213, 0.213],  # RR
    ]
)


def go1_rho_fix(dtype=None) -> jnp.ndarray:
    return jnp.asarray(GO1_RHO_FIX, dtype=dtype)


def fk(q: jnp.ndarray, rho_fix: jnp.ndarray) -> jnp.ndarray:
    """Foot position in body frame. q: (..., 3), rho_fix: (..., 5) -> (..., 3)."""
    ox, oy, d, lt, lc = (rho_fix[..., i] for i in range(5))
    q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2]
    s1, c1 = jnp.sin(q1), jnp.cos(q1)
    # in-plane (sagittal) chain, angles measured from straight down
    ext = lt * jnp.cos(q2) + lc * jnp.cos(q2 + q3)   # distance below hip axis
    x = ox - lt * jnp.sin(q2) - lc * jnp.sin(q2 + q3)
    y = oy + d * c1 + ext * s1
    z = d * s1 - ext * c1
    return jnp.stack([x, y, z], axis=-1)


def jac(q: jnp.ndarray, rho_fix: jnp.ndarray) -> jnp.ndarray:
    """Foot Jacobian ∂fk/∂q, (..., 3, 3); exact forward-mode of the closed form."""
    flat_q = q.reshape(-1, 3)
    flat_r = jnp.broadcast_to(rho_fix, q.shape[:-1] + (5,)).reshape(-1, 5)
    J = jax.vmap(jax.jacfwd(fk))(flat_q, flat_r)
    return J.reshape(q.shape[:-1] + (3, 3))


def ik(p: jnp.ndarray, rho_fix: jnp.ndarray) -> jnp.ndarray:
    """Analytic inverse kinematics (knee-backward branch, Unitree convention).

    p: (..., 3) desired foot position in body frame. Returns q (..., 3).
    Out-of-reach targets are clamped to the workspace boundary (mirrors the
    NaN-guard at ``BaseInterface.cpp:351-355`` by never producing NaN).
    """
    ox, oy, d, lt, lc = (rho_fix[..., i] for i in range(5))
    px = p[..., 0] - ox
    py = p[..., 1] - oy
    pz = p[..., 2]

    # hip roll from the frontal-plane circle of radius |d| around the x-axis
    r2 = py * py + pz * pz
    s2 = jnp.maximum(r2 - d * d, 1e-12)  # squared in-plane leg extension
    s = jnp.sqrt(s2)
    q1 = jnp.arctan2(pz, py) + jnp.arctan2(s, d)
    # wrap to (-pi, pi] so the hip stays near zero for feet below the body
    q1 = jnp.mod(q1 + jnp.pi, 2 * jnp.pi) - jnp.pi

    # planar 2-link IK in the sagittal plane: reach (x=-px forward, s down)
    dist2 = jnp.clip(px * px + s2, (lt - lc) ** 2 + 1e-12, (lt + lc) ** 2 - 1e-12)
    cos_knee = (dist2 - lt * lt - lc * lc) / (2.0 * lt * lc)
    q3 = -jnp.arccos(jnp.clip(cos_knee, -1.0, 1.0))  # knee folds backward
    q2 = jnp.arctan2(-px, s) - jnp.arctan2(
        lc * jnp.sin(q3), lt + lc * jnp.cos(q3)
    )
    return jnp.stack([q1, q2, q3], axis=-1)


def ik_near(p: jnp.ndarray, rho_fix: jnp.ndarray, q_now: jnp.ndarray) -> jnp.ndarray:
    """Analytic IK with hip-roll branch selection from the current joints.

    The frontal-plane circle admits two hip-roll solutions (in-plane
    extension e = ±s); the reference picks whichever lands nearest the
    measured q1 (``A1Kinematics.h:44-50``, ``A1Kinematics.cpp:335-423`` —
    only the hip branch is selected there; the knee is always the backward
    fold, which we keep). Branchless: both candidates are computed and
    selected per leg with a wrapped angular distance, so the function stays
    vmap/jit-friendly.

    p: (..., 3) target foot position in body frame; q_now: (..., 3).
    """
    ox, oy, d, lt, lc = (rho_fix[..., i] for i in range(5))
    px = p[..., 0] - ox
    py = p[..., 1] - oy
    pz = p[..., 2]

    r2 = py * py + pz * pz
    s2 = jnp.maximum(r2 - d * d, 1e-12)
    s = jnp.sqrt(s2)
    base = jnp.arctan2(pz, py)
    off = jnp.arctan2(s, d)

    def wrap(a):
        return jnp.mod(a + jnp.pi, 2 * jnp.pi) - jnp.pi

    q1a = wrap(base + off)   # e = +s (foot below the hip axis — stance branch)
    q1b = wrap(base - off)   # e = -s (leg folded over the hip axis)
    q1_now = q_now[..., 0]
    pick_a = jnp.abs(wrap(q1a - q1_now)) <= jnp.abs(wrap(q1b - q1_now))
    q1 = jnp.where(pick_a, q1a, q1b)
    e = jnp.where(pick_a, s, -s)

    dist2 = jnp.clip(px * px + s2, (lt - lc) ** 2 + 1e-12, (lt + lc) ** 2 - 1e-12)
    cos_knee = (dist2 - lt * lt - lc * lc) / (2.0 * lt * lc)
    q3 = -jnp.arccos(jnp.clip(cos_knee, -1.0, 1.0))
    q2 = jnp.arctan2(-px, e) - jnp.arctan2(
        lc * jnp.sin(q3), lt + lc * jnp.cos(q3)
    )
    return jnp.stack([q1, q2, q3], axis=-1)


def foot_velocity(q, dq, rho_fix):
    """Body-frame foot velocity J(q)·dq. Shapes (..., 3) each."""
    return jnp.einsum("...ij,...j->...i", jac(q, rho_fix), dq)


def joint_torques_from_force(q, f_body, rho_fix):
    """Stance torque map τ = −Jᵀ f (BaseInterface.cpp:367-368)."""
    return -jnp.einsum("...ji,...j->...i", jac(q, rho_fix), f_body)


def foot_force_from_torques(q, tau, rho_fix):
    """Estimated foot force f = J⁻ᵀ τ (BaseInterface.cpp:253-261)."""
    JT = jnp.swapaxes(jac(q, rho_fix), -1, -2)
    return jnp.linalg.solve(JT, tau[..., None])[..., 0]


def dfk_drho(q, rho_fix):
    """∂fk/∂ρ (..., 3, 5) — calibration Jacobian (A1Kinematics::dfk_drho,
    used by the estimator for kinematic-parameter refinement)."""
    flat_q = q.reshape(-1, 3)
    flat_r = jnp.broadcast_to(rho_fix, q.shape[:-1] + (5,)).reshape(-1, 5)
    J = jax.vmap(jax.jacfwd(fk, argnums=1))(flat_q, flat_r)
    return J.reshape(q.shape[:-1] + (3, 5))


def dJ_dq(q, rho_fix):
    """∂J/∂q (..., 3, 3, 3) (A1Kinematics::dJ_dq)."""
    flat_q = q.reshape(-1, 3)
    flat_r = jnp.broadcast_to(rho_fix, q.shape[:-1] + (5,)).reshape(-1, 5)
    H = jax.vmap(jax.jacfwd(jax.jacfwd(fk)))(flat_q, flat_r)
    return H.reshape(q.shape[:-1] + (3, 3, 3))


def dJ_drho(q, rho_fix):
    """∂J/∂ρ (..., 3, 3, 5) (A1Kinematics::dJ_drho)."""
    flat_q = q.reshape(-1, 3)
    flat_r = jnp.broadcast_to(rho_fix, q.shape[:-1] + (5,)).reshape(-1, 5)
    H = jax.vmap(jax.jacfwd(jax.jacfwd(fk), argnums=1))(flat_q, flat_r)
    return H.reshape(q.shape[:-1] + (3, 3, 5))
