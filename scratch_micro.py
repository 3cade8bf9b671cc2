"""Microbenchmarks: tiny-matrix batch-last ops on TPU."""
import time
import jax
import jax.numpy as jnp
import numpy as np

from quaternion_mpc_tpu.solver import fleet as fl
from quaternion_mpc_tpu.control import quat_mpc
from __graft_entry__ import _example_batch

B = 4096
dtype = jnp.float32
key = jax.random.PRNGKey(0)


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:40s} {np.median(ts)*1e6:10.1f} us")
    return out


A = jax.random.normal(key, (12, 12, B), dtype)
Bm = jax.random.normal(key, (12, 12, B), dtype)
x = jax.random.normal(key, (12, B), dtype)

timeit("bmm 12x12x12 (1)", jax.jit(fl.bmm), A, Bm)
timeit("bmm chain x10", jax.jit(lambda a, b: [fl.bmm(a, b) for _ in range(10)]), A, Bm)


def bmm_chain100(a, b):
    c = a
    for _ in range(100):
        c = fl.bmm(c, b)
    return c


timeit("bmm chain x100 (dependent)", jax.jit(bmm_chain100), A, Bm)

# unrolled-scalar variant: explicit loops over i,j,k
def bmm_unrolled(a, b):
    n, k_, m = a.shape[0], a.shape[1], b.shape[1]
    rows = []
    for i in range(n):
        cols = []
        for j in range(m):
            s = a[i, 0] * b[0, j]
            for k in range(1, k_):
                s = s + a[i, k] * b[k, j]
            cols.append(s)
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def bmm_unrolled_chain100(a, b):
    c = a
    for _ in range(100):
        c = bmm_unrolled(c, b)
    return c


timeit("bmm_unrolled chain x100", jax.jit(bmm_unrolled_chain100), A, Bm)

# dot_general with batch leading (B, 12, 12)
Abf = jnp.moveaxis(A, -1, 0)
Bbf = jnp.moveaxis(Bm, -1, 0)


def bmm_bf_chain100(a, b):
    c = a
    for _ in range(100):
        c = jnp.einsum("bik,bkj->bij", c, b, precision=jax.lax.Precision.HIGHEST)
    return c


timeit("batch-first einsum chain x100", jax.jit(bmm_bf_chain100), Abf, Bbf)

# reshaped-to-MXU variant: (12, 12*B) by blocking? skip.

# f eval micro
spec = quat_mpc._fleet_spec()
fbk, cmd, wts = _example_batch(batch=B, horizon=10, dtype=dtype)
prob = jax.jit(lambda f, c, w: quat_mpc.build_fleet_problem(f, c, w, 10))(fbk, cmd, wts)
jax.block_until_ready(prob.x0)
x13 = prob.x0
u12 = prob.us_init[0]


def f_chain(x, u, params, n=50):
    for _ in range(n):
        x = x + 0.001 * spec.f(x, u, params)
    return x


timeit("f eval chain x50", jax.jit(lambda x, u: f_chain(x, u, prob.params)), x13, u12)


def fj_chain(x, u, params, n=50):
    s = jnp.zeros(())
    J = None
    for i in range(n):
        J = spec.fj(x + 0.0001 * i, u, params)
        s = s + J[0, 0, 0]
    return s


timeit("fj eval chain x50", jax.jit(lambda x, u: fj_chain(x, u, prob.params)), x13, u12)

# Gauss-Jordan SPD solve micro
Quu = fl.bmm(fl.bt(A), A) + 12 * jnp.eye(12, dtype=dtype)[..., None]
Qu = jax.random.normal(key, (12, B), dtype)
Qux = jax.random.normal(key, (12, 12, B), dtype)


def gj_chain10(Quu, Qu, Qux):
    outs = []
    for _ in range(10):
        d, K = fl.solve_spd_multi(Quu, [Qu, Qux])
        outs.append(d)
        Qu = d  # dependency chain
    return Qu, K


timeit("solve_spd_multi chain x10", jax.jit(gj_chain10), Quu, Qu, Qux)
