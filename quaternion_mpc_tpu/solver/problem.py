"""Problem/option pytrees for the batched trajectory optimizer.

The reference rebuilds an ``ALTROSolver`` object per MPC tick from closures
over mutable shared state (``QuatMpc.cpp:218-253``). Here the entire problem
is *data* — a pytree that can carry a leading scenario batch axis and be fed
to one compiled solve. The solver structure (callables, dims, iteration
counts) is static; everything numeric is traced.

API surface parity (reference call sites in ``QuatMpc.cpp``/``ConvexMpc.cpp``):
- ``SetDimension/SetErrorDimension``  -> ``ModelSpec.nx/nu/ne``
- ``SetExplicitDynamics``             -> ``ModelSpec.f/fj`` + integrator
- ``SetTimeStep``                     -> ``TrajOptProblem.h``
- ``SetLQRCost``                      -> ``CostSpec`` with ``w = 0``
- ``SetQuaternionCost(..., w, ...)``  -> ``CostSpec`` with geodesic weight ``w``
- ``SetConstraint(INEQUALITY)``       -> linear input cone ``Cu·u + cb ≤ 0``
- ``SetInitialState``                 -> ``TrajOptProblem.x0``
- ``SetState/SetInput`` warm starts   -> ``us_init`` (states re-rolled out)
- ``SetOptions``                      -> ``SolverOptions``
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax.numpy as jnp


class ModelSpec(NamedTuple):
    """Static description of the dynamics (not a pytree — closed over by jit).

    f:  continuous dynamics ``f(x, u, params) -> xdot``
    fj: continuous Jacobian ``fj(x, u, params) -> [dxdot/dx | dxdot/du]``
        (``None`` -> forward-mode autodiff of ``f``)
    quat_idx: start index of the (single) unit quaternion inside the state, or
        ``None`` for plain vector-space states.
    integrator: "midpoint" | "euler" (reference AltroUtils.cpp:9-125).
    """

    nx: int
    nu: int
    f: Callable
    fj: Optional[Callable] = None
    quat_idx: Optional[int] = None
    integrator: str = "midpoint"

    @property
    def ne(self) -> int:
        return self.nx if self.quat_idx is None else self.nx - 1


class CostSpec(NamedTuple):
    """Per-knot tracking cost: ½‖x−x_ref‖²_diag(Qd) + w·(1−|q_refᵀq|) + ½‖u−u_ref‖²_diag(Rd).

    Shapes: Qd (nx,), Rd (nu,), w scalar, x_ref (N+1, nx), u_ref (N+1, nu).
    ``w = 0`` recovers the plain LQR cost used by the Euler convex MPC.
    Qdf: optional distinct terminal state weight (None -> Qd), e.g. the
    bicycle MPC's Qdf = 1e1 vs Qd = 1e-2 (TestBicycle.cpp:50-52).
    """

    Qd: jnp.ndarray
    Rd: jnp.ndarray
    w: jnp.ndarray
    x_ref: jnp.ndarray
    u_ref: jnp.ndarray
    Qdf: Optional[jnp.ndarray] = None


class TrajOptProblem(NamedTuple):
    """One trajectory-optimization instance (a pytree; vmap over a batch axis).

    Linear inequality ``Cx @ x + Cu @ u + cb ≤ 0``:
    - Cu (nc, nu): input rows (friction pyramid + force bounds; 6 rows per
      foot in the reference, ``QuatMpc.cpp:47-52,194-215``), knots 0..N-1.
    - Cx (nc, nx) or None: state rows (e.g. the bicycle steering bound,
      ``TestBicycle.cpp:93-105``). When present the constraint is also
      enforced at the terminal knot (with u = 0).
    Use zero-row arrays for unconstrained problems.
    """

    x0: jnp.ndarray
    cost: CostSpec
    Cu: jnp.ndarray
    cb: jnp.ndarray
    h: jnp.ndarray
    params: Any
    us_init: jnp.ndarray  # (N, nu) input warm start
    Cx: Optional[jnp.ndarray] = None
    lam_init: Optional[jnp.ndarray] = None  # (N+1, nc) dual warm start
    # (the other half of the real-time-iteration scheme: carrying the
    # previous tick's AL multipliers lets ONE AL x ONE iLQR iteration
    # per tick hold closed-loop tracking — see solver/al_ilqr.py)


class SolverOptions(NamedTuple):
    """Static solver options (mirrors AltroOptions, QuatMpc.cpp:21-26)."""

    al_iterations: int = 6
    ilqr_iterations: int = 10       # inner iLQR iterations per AL step
    penalty_initial: float = 1.0
    penalty_scaling: float = 20.0   # reference: 20 (QuatMpc.cpp:26)
    max_linesearch: int = 12
    reg_initial: float = 1e-8
    reg_scale_up: float = 100.0
    reg_max: float = 1e8
    cost_tol: float = 1e-10         # |ΔJ| inner-loop convergence
    grad_tol: float = 1e-9
    constraint_tol: float = 1e-8


class SolveStats(NamedTuple):
    cost: jnp.ndarray
    constraint_violation: jnp.ndarray
    grad_norm: jnp.ndarray
    iterations: jnp.ndarray


class Solution(NamedTuple):
    xs: jnp.ndarray  # (N+1, nx)
    us: jnp.ndarray  # (N, nu)
    stats: SolveStats
    lam: Any = None  # (N+1, nc) final AL multipliers (dual warm start)
