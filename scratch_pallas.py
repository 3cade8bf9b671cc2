"""Prototype: batch-last tiny-matmul chain as a Pallas kernel vs XLA."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ = np.asarray(jnp.zeros(()) + 1.0)  # enter sync-dispatch mode


def t(name, fn, *args, n=12):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} med {np.median(ts)*1e3:8.3f} ms", flush=True)
    return out


B = 4096
LANES = 512  # lane-tile width (multiple of 128)
key = jax.random.PRNGKey(0)
A = jax.random.normal(key, (12, 12, B), jnp.float32) * 0.1
Bm = jax.random.normal(jax.random.PRNGKey(1), (12, 12, B), jnp.float32) * 0.1


def kbmm(a, b):
    """(n,k,L) @ (k,m,L) -> (n,m,L) inside a kernel: mul+sum, no dot."""
    return jnp.sum(a[:, :, None, :] * b[None, :, :, :], axis=1)


def chain_kernel(a_ref, b_ref, o_ref):
    c = a_ref[:]
    b = b_ref[:]
    for _ in range(100):
        c = kbmm(c, b)
    o_ref[:] = c


@jax.jit
def pallas_chain(a, b):
    grid = (B // LANES,)
    spec = pl.BlockSpec((12, 12, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        chain_kernel,
        out_shape=jax.ShapeDtypeStruct((12, 12, B), jnp.float32),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
    )(a, b)


def bmm_ms(a, b):
    return jnp.sum(a[:, :, None, :] * b[None, :, :, :], axis=1)


@jax.jit
def xla_chain(a, b):
    c = a
    for _ in range(100):
        c = bmm_ms(c, b)
    return c


r_pl = t("pallas chain x100", pallas_chain, A, Bm)
r_xla = t("xla mul+sum chain x100", xla_chain, A, Bm)
print("max diff:", float(jnp.max(jnp.abs(r_pl - r_xla))))


def bmm_outer(a, b):
    K = a.shape[1]
    acc = a[:, 0, None, :] * b[None, 0, :, :]
    for k in range(1, K):
        acc = acc + a[:, k, None, :] * b[None, k, :, :]
    return acc


@jax.jit
def xla_chain_outer(a, b):
    c = a
    for _ in range(100):
        c = bmm_outer(c, b)
    return c


@jax.jit
def noop(a):
    return a[0, 0, 0] + 1.0


t("noop (sync floor)", noop, A)
r3 = t("xla outer-acc chain x100", xla_chain_outer, A, Bm)
print("outer diff:", float(jnp.max(jnp.abs(r3 - r_xla))))
