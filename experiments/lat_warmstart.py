"""Round-3 experiment 2: B=1 scanned-tick latency at N=20 (the online
config, gazebo_go1_quat_mpc.yaml:37) for both backends, plus a
warm-started reduced-iteration tick (reference parity: QuatMpc.cpp:250-253
carries x/u warm starts across ticks) to probe the 2 ms north star.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def p50(fn, iters=5):
    import jax

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from quaternion_mpc_tpu.control import quat_mpc
    from quaternion_mpc_tpu.solver import SolverOptions
    from quaternion_mpc_tpu.solver import fleet as fl

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    _ = np.asarray(jnp.zeros(()) + 1.0)

    dtype = jnp.float32
    K = 50

    def scanned_tick(horizon, backend, opts, warm: bool):
        solver = fl.make_fleet_solver(quat_mpc._fleet_spec(), opts, backend=backend)
        args = _example_batch(batch=1, horizon=horizon, dtype=dtype)
        args = jax.device_put(args, dev)
        fbk, cmd, wts = args

        def scan_fn(fbk, cmd, wts):
            prob0 = quat_mpc.build_fleet_problem(fbk, cmd, wts, horizon)

            def body(carry, _):
                pert, us_carry = carry
                f2 = fbk._replace(
                    torso_lin_vel_world=fbk.torso_lin_vel_world + pert * 1e-9
                )
                prob = quat_mpc.build_fleet_problem(f2, cmd, wts, horizon)
                if warm:
                    prob = prob._replace(us_init=us_carry)
                sol = solver(prob)
                return (pert + jnp.sum(sol.cost) * 1e-9, sol.us), sol.cost

            (out, _), costs = jax.lax.scan(
                body, (jnp.zeros((), dtype), prob0.us_init), None, length=K
            )
            return out, costs[-1]

        scan_jit = jax.jit(scan_fn)
        t0 = time.perf_counter()
        r = scan_jit(*args)
        jax.block_until_ready(r)
        compile_s = time.perf_counter() - t0
        tick_ms = p50(lambda: scan_jit(*args)[0]) / K * 1e3
        return tick_ms, float(np.asarray(r[1])[0]), compile_s

    full = SolverOptions(al_iterations=2, ilqr_iterations=5)
    rti = SolverOptions(al_iterations=1, ilqr_iterations=3, penalty_initial=10.0)

    for name, horizon, backend, opts, warm in [
        ("assoc-N20", 20, "assoc", full, False),
        ("seq-N20", 20, "xla", full, False),
        ("assoc-N10-warm-rti", 10, "assoc", rti, True),
        ("assoc-N10-warm-full", 10, "assoc", full, True),
    ]:
        tick_ms, last_cost, comp = scanned_tick(horizon, backend, opts, warm)
        print(
            f"[{name}] {tick_ms:.3f} ms/tick ({1000.0/tick_ms:,.0f} Hz), "
            f"final-tick cost {last_cost:.5f}  [compile {comp:.0f}s]",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
