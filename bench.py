"""Benchmark: Go1 quaternion-MPC solves/sec/chip + p50 per-solve latency.

BASELINE.md metric: "MPC solves/sec/chip + p50 per-step solve latency
(Go1 quat-MPC, horizon N=10)". Reference throughput: ≤200 solves/s (one
robot, sequential 5 ms loop, Main.cpp:101-119). North-star: <2 ms/solve,
>100k solves/s on v5e-16.

Prints ONE JSON line on stdout:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
Details go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from quaternion_mpc_tpu.control import quat_mpc
    from quaternion_mpc_tpu.solver import SolverOptions

    dev = jax.devices()[0]
    print(f"[bench] device: {dev}", file=sys.stderr)

    # enter sync-dispatch mode BEFORE timing: a fresh process on this backend
    # is in a lazy mode where block_until_ready returns without waiting
    _ = np.asarray(jnp.zeros(()) + 1.0)

    horizon = 10
    dtype = jnp.float32
    # online solver budget: iterations_max=10 (QuatMpc.cpp:22) → 2 AL × 5 iLQR
    ctrl = quat_mpc.make_fleet_controller(
        horizon, SolverOptions(al_iterations=2, ilqr_iterations=5)
    )
    step_jit = jax.jit(ctrl)

    # IMPORTANT: no device->host pulls (float()/np.asarray of jax arrays)
    # until ALL timing loops are done — on this backend a single pull
    # permanently degrades subsequent dispatches to ~25 ms.
    best = None
    costs = []
    for batch in (256, 1024, 4096, 16384):
        args = _example_batch(batch=batch, horizon=horizon, dtype=dtype)
        args = jax.device_put(args, dev)
        # compile + warmup
        grf, cost = step_jit(*args)
        jax.block_until_ready(grf)

        iters = 10
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            grf, cost = step_jit(*args)
            jax.block_until_ready(grf)
            times.append(time.perf_counter() - t0)
        p50 = float(np.median(times))
        solves_per_sec = batch / p50
        per_solve_ms = p50 / batch * 1e3
        costs.append((batch, p50, solves_per_sec, per_solve_ms, jnp.mean(cost)))
        if best is None or solves_per_sec > best[0]:
            best = (solves_per_sec, p50, batch)

    for batch, p50, solves_per_sec, per_solve_ms, mean_cost in costs:
        print(
            f"[bench] batch={batch}: p50 step {p50*1e3:.2f} ms, "
            f"{solves_per_sec:,.0f} solves/s, {per_solve_ms:.4f} ms/solve, "
            f"mean cost {float(mean_cost):.4f}",
            file=sys.stderr,
        )

    solves_per_sec, p50, batch = best
    # reference: 200 solves/s per robot controller (BASELINE.md)
    result = {
        "metric": "go1_quat_mpc_solves_per_sec_per_chip_N10",
        "value": round(solves_per_sec, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_sec / 200.0, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
