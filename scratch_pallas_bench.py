"""TPU: pallas backward vs xla backward, kernel-level and full-solve."""
import time
import jax, jax.numpy as jnp, numpy as np
from quaternion_mpc_tpu.control import quat_mpc
from quaternion_mpc_tpu.solver import SolverOptions
from quaternion_mpc_tpu.solver import fleet as fl
from quaternion_mpc_tpu.solver import pallas_fleet
from __graft_entry__ import _example_batch

_ = np.asarray(jnp.zeros(()) + 1.0)  # sync mode

def t(name, fn, *args, n=10):
    out = fn(*args); jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); out = fn(*args); jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} med {np.median(ts)*1e3:8.2f} ms", flush=True)
    return out

B, N = 4096, 10
spec = quat_mpc._fleet_spec()
fbk, cmd, wts = _example_batch(batch=B, horizon=N, dtype=jnp.float32)
prob = jax.jit(lambda f, c, w: quat_mpc.build_fleet_problem(f, c, w, N))(fbk, cmd, wts)

def init_roll(prob):
    def stepf(x, u):
        return fl._fleet_step(spec, x, u, prob.params, prob.h), x
    xN, xs0 = jax.lax.scan(stepf, prob.x0, prob.us_init)
    return jnp.concatenate([xs0, xN[None]], axis=0)

xs = jax.jit(init_roll)(prob)
us = prob.us_init
lam = 0.1 * jnp.ones((N, prob.cb.shape[0], B), jnp.float32)
rho = jnp.asarray(1.0, jnp.float32)
reg = jnp.full((B,), 1e-6, jnp.float32)

noop = jax.jit(lambda p: p.x0[0, 0] + 1.0)
t("noop floor", noop, prob)

bw_xla = jax.jit(lambda prob, xs, us, lam, rho, reg: fl.riccati_backward(spec, prob, xs, us, lam, rho, reg))
bw_pl = jax.jit(lambda prob, xs, us, lam, rho, reg: pallas_fleet.riccati_backward_pallas(spec, prob, xs, us, lam, rho, reg))

r1 = t("backward XLA", bw_xla, prob, xs, us, lam, rho, reg)
r2 = t("backward PALLAS", bw_pl, prob, xs, us, lam, rho, reg)
for n_, a, b in zip(["Ks","ds","dV1","dV2","g"], r1, r2):
    print(f"  {n_} max diff {float(jnp.max(jnp.abs(a-b))):.3e}")

opts = SolverOptions(al_iterations=2, ilqr_iterations=5)
solve_xla = jax.jit(fl.make_fleet_solver(spec, opts, backend="xla"))
solve_pl = jax.jit(fl.make_fleet_solver(spec, opts, backend="pallas"))
s1 = t("FULL solve XLA", solve_xla, prob)
s2 = t("FULL solve PALLAS", solve_pl, prob)
print("cost diff:", float(jnp.max(jnp.abs(s1.cost - s2.cost))))
