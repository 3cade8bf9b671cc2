"""Profile fleet-solver stages on TPU: batch=4096, N=10, f32."""
import time
import jax
import jax.numpy as jnp
import numpy as np

_ = np.asarray(jnp.zeros(()) + 1.0)  # enter sync-dispatch mode
_FLOOR = [0.0]

from quaternion_mpc_tpu.control import quat_mpc
from quaternion_mpc_tpu.solver import SolverOptions
from quaternion_mpc_tpu.solver import fleet as fl
from __graft_entry__ import _example_batch

B, N = 4096, 10
dtype = jnp.float32
spec = quat_mpc._fleet_spec()
opts = SolverOptions(al_iterations=2, ilqr_iterations=5)

fbk, cmd, wts = _example_batch(batch=B, horizon=N, dtype=dtype)
prob = jax.jit(
    lambda f, c, w: quat_mpc.build_fleet_problem(f, c, w, N)
)(fbk, cmd, wts)
jax.block_until_ready(prob.x0)


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    real = np.median(ts) * 1e3 - _FLOOR[0]
    print(f"{name:30s} {np.median(ts)*1e3:8.2f} ms   (real ~{real:8.2f} ms)")
    return out


noop = jax.jit(lambda p: p.x0[0, 0] + 1.0)
out = noop(prob); jax.block_until_ready(out)
ts = []
for _ in range(10):
    t0 = time.perf_counter(); out = noop(prob); jax.block_until_ready(out)
    ts.append(time.perf_counter() - t0)
_FLOOR[0] = np.median(ts) * 1e3
print(f"{'noop floor':30s} {_FLOOR[0]:8.2f} ms")

# Build the internal pieces the same way make_fleet_solver does.
solver = fl.make_fleet_solver(spec, opts)
timeit("FULL solve (2AL x 5iLQR)", jax.jit(solver), prob)

# initial rollout
def init_roll(prob):
    def stepf(x, u):
        return fl._fleet_step(spec, x, u, prob.params, prob.h), x
    xN, xs0 = jax.lax.scan(stepf, prob.x0, prob.us_init)
    return jnp.concatenate([xs0, xN[None]], axis=0)

xs = timeit("init rollout (N f evals x2)", jax.jit(init_roll), prob)
us = prob.us_init
lam = jnp.zeros((N, prob.cb.shape[0], B), dtype=dtype)
rho = jnp.asarray(1.0, dtype)
reg = jnp.full((B,), 1e-6, dtype=dtype)

# Recreate inner closures by poking at a fresh solver instance's internals:
# easiest is to re-derive them here using module functions.
qi, ne = spec.quat_idx, spec.ne


def expansions(prob, xs, us):
    def knot(x, x1, u, x_ref, u_ref, k_lam):
        Ad, Bd = fl._fleet_discrete_jac(spec, x, u, prob.params, prob.h)
        E0 = fl._error_proj_bl(x, qi, ne)
        E1 = fl._error_proj_bl(x1, qi, ne)
        A = fl.bmm(fl.bt(E1), fl.bmm(Ad, E0))
        B_ = fl.bmm(fl.bt(E1), Bd)
        return A, B_

    return jax.vmap(knot)(xs[:-1], xs[1:], us, prob.x_ref[:-1], prob.u_ref[:-1], lam)


AB = timeit("dyn expansion (jac+proj)", jax.jit(expansions), prob, xs, us)
As, Bs = AB

lxs = jnp.zeros((N, ne, B), dtype)
lxxs = jnp.broadcast_to(jnp.eye(ne, dtype=dtype)[None, :, :, None], (N, ne, ne, B)) * 1.0
lus = jnp.zeros((N, spec.nu, B), dtype)
luus = jnp.broadcast_to(jnp.eye(spec.nu, dtype=dtype)[None, :, :, None], (N, spec.nu, spec.nu, B)) * 1.0
lxN = jnp.zeros((ne, B), dtype)
lxxN = jnp.broadcast_to(jnp.eye(ne, dtype=dtype)[:, :, None], (ne, ne, B)) * 1.0


def backward(As, Bs, lxs, lxxs, lus, luus, lxN, lxxN):
    eye_u = jnp.eye(spec.nu, dtype=dtype)[..., None]

    def step(carry, inp):
        Vx, Vxx = carry
        A, B_, lx, lxx, lu, luu = inp
        AtV = fl.bmm(fl.bt(A), Vxx)
        BtV = fl.bmm(fl.bt(B_), Vxx)
        Qx = lx + fl.bmv(fl.bt(A), Vx)
        Qu = lu + fl.bmv(fl.bt(B_), Vx)
        Qxx = lxx + fl.bmm(AtV, A)
        Quu = luu + fl.bmm(BtV, B_)
        Qux = fl.bmm(BtV, A)
        d, K = fl.solve_spd_multi(Quu + 1e-6 * eye_u, [Qu, Qux])
        d, K = -d, -K
        KtQuu = fl.bmm(fl.bt(K), Quu)
        Vx_n = Qx + fl.bmv(KtQuu, d) + fl.bmv(fl.bt(K), Qu) + fl.bmv(fl.bt(Qux), d)
        Vxx_n = Qxx + fl.bmm(KtQuu, K) + fl.bmm(fl.bt(K), Qux) + fl.bmm(fl.bt(Qux), K)
        Vxx_n = 0.5 * (Vxx_n + fl.bt(Vxx_n))
        return (Vx_n, Vxx_n), (K, d)

    (_, _), (Ks, ds) = jax.lax.scan(
        step, (lxN, lxxN), (As, Bs, lxs, lxxs, lus, luus), reverse=True
    )
    return Ks, ds


Ks, ds = timeit("backward pass (scan N)", jax.jit(backward), As, Bs, lxs, lxxs, lus, luus, lxN, lxxN)


def rollout(prob, xs_bar, us_bar, Ks, ds):
    alpha = jnp.ones((B,), dtype)

    def step(x, inp):
        x_bar, u_bar, K, d = inp
        dx = fl._state_diff_bl(x, x_bar, qi)
        u = u_bar + alpha * d + fl.bmv(K, dx)
        return fl._fleet_step(spec, x, u, prob.params, prob.h), (x, u)

    xN, (xs2, us2) = jax.lax.scan(step, xs_bar[0], (xs_bar[:-1], us_bar, Ks, ds))
    return jnp.concatenate([xs2, xN[None]], axis=0), us2


timeit("fwd rollout (1 alpha)", jax.jit(rollout), prob, xs, us, Ks, ds)


# single dynamics + jacobian eval timing
def f_only(prob, xs, us):
    return jax.vmap(lambda x, u: spec.f(x, u, prob.params))(xs[:-1], us)


def fj_only(prob, xs, us):
    return jax.vmap(lambda x, u: spec.fj(x, u, prob.params))(xs[:-1], us)


timeit("N x f eval", jax.jit(f_only), prob, xs, us)
timeit("N x fj eval", jax.jit(fj_only), prob, xs, us)


def trivial(prob, xs, us):
    return xs[0, 0] + us[0, 0] + prob.x0[0]


timeit("TRIVIAL (same args)", jax.jit(trivial), prob, xs, us)


def trivial2(x):
    return x * 2.0


timeit("TRIVIAL (one small arg)", jax.jit(trivial2), xs)
