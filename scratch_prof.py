"""Profile solver pieces on TPU: batch=4096, N=10, f32."""
import time
import jax
import jax.numpy as jnp
import numpy as np

from quaternion_mpc_tpu.control import quat_mpc
from quaternion_mpc_tpu.models import discretize
from quaternion_mpc_tpu.solver import SolverOptions, make_solver
from quaternion_mpc_tpu.solver.al_ilqr import _discrete_jacobian, _discrete_step
from __graft_entry__ import _example_batch

B, N = 4096, 10
dtype = jnp.float32
spec = quat_mpc.MODEL_SPEC

fbk, cmd, wts = _example_batch(batch=B, horizon=N, dtype=dtype)
build = jax.vmap(lambda f, c, w: quat_mpc.build_problem(f, c, w, N))
prob = jax.jit(build)(fbk, cmd, wts)
jax.block_until_ready(prob.x0)

def timeit(name, fn, *args):
    out = fn(*args); jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); out = fn(*args); jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:30s} {np.median(ts)*1e3:8.2f} ms")
    return out

# initial rollout for xs
def init_roll(prob):
    def stepf(x, u):
        return _discrete_step(spec, x, u, prob.params, prob.h), x
    xN, xs0 = jax.lax.scan(stepf, prob.x0, prob.us_init)
    return jnp.concatenate([xs0, xN[None]], axis=0)

xs = timeit("init rollout", jax.jit(jax.vmap(init_roll)), prob)
us = prob.us_init

# (a) dynamics expansion
def dyn_exp(prob, xs, us):
    def one(k):
        Jd = _discrete_jacobian(spec, xs[k], us[k], prob.params, prob.h)
        E_k = discretize.error_projection(xs[k], spec.quat_idx, spec.ne)
        E_k1 = discretize.error_projection(xs[k + 1], spec.quat_idx, spec.ne)
        return E_k1.T @ Jd[:, : spec.nx] @ E_k, E_k1.T @ Jd[:, spec.nx :]
    return jax.vmap(one)(jnp.arange(N))

AB = timeit("dyn expansion", jax.jit(jax.vmap(dyn_exp)), prob, xs, us)
As, Bs = AB

# (b) backward pass
def backward(As, Bs):
    ne, nu = 12, 12
    lxs = jnp.zeros((N, ne), dtype); lxxs = jnp.tile(jnp.eye(ne, dtype=dtype), (N,1,1))
    lus = jnp.zeros((N, nu), dtype); luus = jnp.tile(jnp.eye(nu, dtype=dtype), (N,1,1))
    def stepb(carry, inp):
        Vx, Vxx = carry
        A, B_, lx, lxx, lu, luu = inp
        Qx = lx + A.T @ Vx
        Qu = lu + B_.T @ Vx
        Qxx = lxx + A.T @ Vxx @ A
        Quu = luu + B_.T @ Vxx @ B_
        Qux = B_.T @ Vxx @ A
        chol = jnp.linalg.cholesky(Quu + 1e-8*jnp.eye(nu, dtype=dtype))
        d = -jax.scipy.linalg.cho_solve((chol, True), Qu)
        K = -jax.scipy.linalg.cho_solve((chol, True), Qux)
        Vx_n = Qx + K.T @ Quu @ d + K.T @ Qu + Qux.T @ d
        Vxx_n = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
        return (Vx_n, 0.5*(Vxx_n+Vxx_n.T)), (K, d)
    (_, _), (Ks, ds) = jax.lax.scan(stepb, (jnp.zeros(ne, dtype), jnp.eye(ne, dtype=dtype)), (As, Bs, lxs, lxxs, lus, luus), reverse=True)
    return Ks, ds

Kd = timeit("backward pass", jax.jit(jax.vmap(backward)), As, Bs)
Ks, ds = Kd

# (c) rollout
def roll(prob, xs, us, Ks, ds):
    def stepf(x, inp):
        x_bar, u_bar, K, d = inp
        dx = discretize.state_diff(x, x_bar, spec.quat_idx)
        u = u_bar + 0.5 * d + K @ dx
        return _discrete_step(spec, x, u, prob.params, prob.h), (x, u)
    xN, (xs_o, us_o) = jax.lax.scan(stepf, xs[0], (xs[:-1], us, Ks, ds))
    return xs_o, us_o

timeit("rollout", jax.jit(jax.vmap(roll)), prob, xs, us, Ks, ds)

# (d) full solve for reference
solver = make_solver(spec, SolverOptions(al_iterations=2, ilqr_iterations=5))
timeit("full solve (2x5)", jax.jit(jax.vmap(solver)), prob)
