"""Round-3 experiment 3: throughput lever (linesearch width) at B=16384 and
the assoc/seq crossover at B=256 (scanned)."""

from __future__ import annotations

import sys
import time

import numpy as np


def p50(fn, iters=7):
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

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    _ = np.asarray(jnp.zeros(()) + 1.0)
    dtype = jnp.float32
    horizon = 10

    results = {}
    for name, n_alpha in (("ls12", 12), ("ls8", 8)):
        opts = SolverOptions(al_iterations=2, ilqr_iterations=5, max_linesearch=n_alpha)
        ctrl = jax.jit(quat_mpc.make_fleet_controller(horizon, opts))
        args = jax.device_put(_example_batch(16384, horizon, dtype), dev)
        g, c = ctrl(*args)
        jax.block_until_ready(g)
        t = p50(lambda: ctrl(*args)[0])
        results[name] = (16384 / t, float(jnp.mean(c)))
        print(
            f"[B=16384 {name}] {16384/t:,.0f} solves/s  mean cost "
            f"{results[name][1]:.5f}",
            file=sys.stderr,
        )

    # B=256 scanned: assoc vs xla
    K = 10
    for backend in ("xla", "assoc"):
        opts = SolverOptions(al_iterations=2, ilqr_iterations=5)
        ctrl = quat_mpc.make_fleet_controller(horizon, opts, backend=backend)
        args = jax.device_put(_example_batch(256, horizon, dtype), dev)

        def scan_fn(fbk, cmd, wts):
            def body(carry, _):
                f2 = fbk._replace(
                    torso_lin_vel_world=fbk.torso_lin_vel_world + carry * 1e-9
                )
                g, c = ctrl(f2, cmd, wts)
                return carry + jnp.sum(c) * 1e-9, None

            out, _ = jax.lax.scan(body, jnp.zeros((), dtype), None, length=K)
            return out

        sj = jax.jit(scan_fn)
        jax.block_until_ready(sj(*args))
        t = p50(lambda: sj(*args)) / K
        print(
            f"[B=256 scan {backend}] {t*1e3:.3f} ms/tick, "
            f"{256/t:,.0f} solves/s",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
