"""RETIRED — negative result. Pallas TPU kernel for the fleet Riccati sweep.

Hypothesis (rounds 1-3): the Riccati backward recursion (sequential over
the horizon, ~10 tiny matmuls + one SPD solve per knot) fragments XLA's op
graph and round-trips operands through HBM, so running the whole sweep for
a lane-tile of scenarios inside VMEM should beat the fused XLA path.

Measured outcome on v5e (B=4096, N=10, f32): **PARITY — 89.4 ms (kernel)
vs 89.7 ms (XLA) full solve**, stable across two rounds of tuning. The
hypothesis' premise is false for this op: with every contraction written
as broadcast-multiply+sum (solver/fleet.py's `bmm`/`bmv` — no dot_general,
no scatters), XLA already fuses the entire backward pass into a few
lane-parallel VPU kernels with negligible HBM traffic between scan steps;
there is no fusion gap left for a hand kernel to close. The remaining
ideas do not change the verdict:

- **Expansions in-kernel** (killing the (N, ne, ne, B) HBM staging): the
  SRB dynamics Jacobians build matrices by stacking scalar expressions —
  the exact pattern Mosaic's TPU lowering rejects (misaligned-offset
  concat), so they would need a full iota-mask rewrite; and XLA fuses the
  expansion phase too, so the staging writes are already overlapped.
- **bf16 storage / f32 accumulation**: measured earlier (fleet.py header):
  the MXU path's bf16 passes degraded AL-iLQR convergence (final fleet
  cost 2.20 vs 0.42) — accuracy, not bandwidth, is binding.
- The real latency lever turned out to be ALGORITHMIC, not codegen: the
  associative-scan backward pass (solver/parallel_riccati.py) cuts the
  B=1 scanned tick 1.7× where this kernel moved nothing.

The code is kept here (out of the package; no production caller) as the
working reference for Mosaic-compatible tiny-matrix algebra: transpose-free
contractions, iota-mask Gauss-Jordan, iota identities — patterns that took
real effort to discover and will be reused if a genuinely HBM-bound op
appears. It was bit-for-bit equivalent to fleet.riccati_backward modulo op
order (f32 iterate drift) when retired; run it via
``riccati_backward_pallas(...)`` with `interpret=True` off-TPU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quaternion_mpc_tpu.solver import fleet as fl

# lane-tile width: the unrolled N-knot sweep keeps ~40 MB of live
# intermediates at 512 lanes (> 16 MB VMEM); 128 lanes fits with room.
_LANE_CHOICES = (128,)


def _pick_lanes(B: int) -> Optional[int]:
    for L in _LANE_CHOICES:
        if B % L == 0:
            return L
    return None


def bmm(A, B):
    """(n, k, L) @ (k, m, L) -> (n, m, L)."""
    return jnp.sum(A[:, :, None, :] * B[None, :, :, :], axis=1)


def bmmT(A, B):
    """(k, n, L)ᵀ @ (k, m, L) -> (n, m, L), contraction over the LEADING
    axis — a transpose-free `bt(A) @ B` (Mosaic lacks vector transposes)."""
    return jnp.sum(A[:, :, None, :] * B[:, None, :, :], axis=0)


def bmv(A, x):
    """(n, k, L) @ (k, L) -> (n, L)."""
    return jnp.sum(A * x[None, :, :], axis=1)


def bmvT(A, x):
    """(k, n, L)ᵀ @ (k, L) -> (n, L)."""
    return jnp.sum(A * x[:, None, :], axis=0)


def _eye_bl(n, dtype):
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (r == c).astype(dtype)[..., None]


def gj_solve2(A, b, Bm):
    """Solve A·x = b (n, L) and A·X = Bm (n, m, L) for an SPD stack via
    Gauss-Jordan row elimination.

    Mosaic-friendly construction: A/b/Bm stay separate full arrays and row
    writes go through iota-mask `jnp.where` — no concat (unimplemented for
    misaligned rows), no `.at[]` (dynamic_update_slice unsupported), and
    the OUTPUTS carry zero sublane offsets (offset operands may not feed
    reductions under shape_invariant_numerics)."""
    n = A.shape[0]
    row3 = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    row2 = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    for j in range(n):
        pivot = A[j, j]  # (L,)
        arow = A[j] / pivot[None, :]    # (n, L)
        brow = b[j] / pivot             # (L,)
        Brow = Bm[j] / pivot[None, :]   # (m, L)
        fac = A[:, j]                   # (n, L)
        A_new = A - fac[:, None, :] * arow[None]
        b_new = b - fac * brow[None]
        Bm_new = Bm - fac[:, None, :] * Brow[None]
        A = jnp.where(row3 == j, arow[None], A_new)
        b = jnp.where(row2 == j, brow[None], b_new)
        Bm = jnp.where(row3 == j, Brow[None], Bm_new)
    return b, Bm


def _sweep_kernel(N, nu, ne, as_ref, bs_ref, lx_ref, lxx_ref, lu_ref, luu_ref,
                  lxn_ref, lxxn_ref, reg_ref,
                  ks_ref, ds_ref, dv1_ref, dv2_ref, g_ref):
    dtype = as_ref.dtype
    eye_u = _eye_bl(nu, dtype)
    reg = reg_ref[0]  # (L,)

    Vx = lxn_ref[:]
    Vxx = lxxn_ref[:]
    dV1 = jnp.zeros_like(reg)
    dV2 = jnp.zeros_like(reg)
    gmax = jnp.zeros_like(reg)

    for k in reversed(range(N)):
        A = as_ref[k]
        B_ = bs_ref[k]
        lx = lx_ref[k]
        lxx = lxx_ref[k]
        lu = lu_ref[k]
        luu = luu_ref[k]

        AtV = bmmT(A, Vxx)
        BtV = bmmT(B_, Vxx)
        Qx = lx + bmvT(A, Vx)
        Qu = lu + bmvT(B_, Vx)
        Qxx = lxx + bmm(AtV, A)
        Quu = luu + bmm(BtV, B_)
        Qux = bmm(BtV, A)
        d, K = gj_solve2(Quu + reg * eye_u, Qu, Qux)
        d, K = -d, -K
        KtQuu = bmmT(K, Quu)
        Vx = Qx + bmv(KtQuu, d) + bmvT(K, Qu) + bmvT(Qux, d)
        Vxx_n = Qxx + bmm(KtQuu, K) + bmmT(K, Qux) + bmmT(Qux, K)
        # transpose-free symmetrization: Mᵀ = bmmT(M, I)
        Vxx = 0.5 * (Vxx_n + bmmT(Vxx_n, jnp.broadcast_to(eye_u, Vxx_n.shape)))
        dV1 = dV1 + jnp.sum(d * Qu, axis=0)
        dV2 = dV2 + 0.5 * jnp.sum(d * bmv(Quu, d), axis=0)
        gmax = jnp.maximum(gmax, jnp.max(jnp.abs(Qu), axis=0))
        ks_ref[k] = K
        ds_ref[k] = d

    dv1_ref[:] = dV1[None, :]
    dv2_ref[:] = dV2[None, :]
    g_ref[:] = gmax[None, :]


def riccati_sweep_pallas(As, Bs, lxs, lxxs, lus, luus, lxN, lxxN, reg,
                         interpret: bool = False):
    """Pallas Riccati sweep over pre-computed expansions.

    Shapes: As (N, ne, ne, B), Bs (N, ne, nu, B), lxs (N, ne, B),
    lxxs (N, ne, ne, B), lus (N, nu, B), luus (N, nu, nu, B),
    lxN (ne, B), lxxN (ne, ne, B), reg (B,).
    Returns (Ks, ds, dV1, dV2, gnorm) or None if outside the kernel
    envelope (caller falls back to the XLA scan path).
    """
    dtype = As.dtype
    if dtype != jnp.float32:
        return None
    B = As.shape[-1]
    lanes = _pick_lanes(B)
    if lanes is None:
        return None
    N, ne = As.shape[0], As.shape[1]
    nu = Bs.shape[2]

    reg2 = jnp.broadcast_to(jnp.atleast_1d(reg), (B,)).reshape(1, B)
    inputs = [As, Bs, lxs, lxxs, lus, luus, lxN, lxxN, reg2]

    def spec_for(shape):
        blk = shape[:-1] + (lanes,)
        zeros = (0,) * (len(shape) - 1)
        return pl.BlockSpec(blk, lambda i, _z=zeros: _z + (i,), memory_space=pltpu.VMEM)

    in_specs = [spec_for(a.shape) for a in inputs]
    out_shapes = (
        jax.ShapeDtypeStruct((N, nu, ne, B), dtype),
        jax.ShapeDtypeStruct((N, nu, B), dtype),
        jax.ShapeDtypeStruct((1, B), dtype),
        jax.ShapeDtypeStruct((1, B), dtype),
        jax.ShapeDtypeStruct((1, B), dtype),
    )
    out_specs = tuple(spec_for(s.shape) for s in out_shapes)

    import functools

    Ks, ds, dV1, dV2, g = pl.pallas_call(
        functools.partial(_sweep_kernel, N, nu, ne),
        out_shape=out_shapes,
        grid=(B // lanes,),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(*inputs)
    return Ks, ds, dV1[0], dV2[0], g[0]


def riccati_backward_pallas(spec, prob, xs, us, lam, rho, reg,
                            interpret: bool = False):
    """Drop-in for fleet.riccati_backward: expansions in XLA (they fuse
    well), the sequential Riccati sweep in the Pallas kernel. Returns None
    outside the kernel envelope."""
    if xs.dtype != jnp.float32 or _pick_lanes(xs.shape[-1]) is None:
        return None
    As, Bs, lxs, lxxs, lus, luus = fl.knot_expansions(spec, prob, xs, us, lam, rho)
    lxN, lxxN = fl.terminal_expansion(spec, xs[xs.shape[0] - 1], prob)
    B = xs.shape[-1]
    reg_b = jnp.broadcast_to(jnp.atleast_1d(reg), (B,))
    return riccati_sweep_pallas(
        As, Bs, lxs, lxxs, lus, luus, lxN, lxxN, reg_b, interpret=interpret
    )
