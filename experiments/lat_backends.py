"""Round-3 experiment: B=1 scanned-tick latency, seq vs assoc Riccati,
N in {10, 20}, plus a reduced-linesearch variant. Runs on the real chip.

Usage: python experiments/lat_backends.py [--quick]
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

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    _ = np.asarray(jnp.zeros(()) + 1.0)  # enter sync dispatch mode

    dtype = jnp.float32
    K = 50

    noop = jax.jit(lambda x: x + 1.0)
    xz = jnp.zeros((), dtype)
    jax.block_until_ready(noop(xz))
    floor_ms = p50(lambda: noop(xz), iters=10) * 1e3
    print(f"dispatch floor: {floor_ms:.2f} ms", file=sys.stderr)

    def bench_cfg(name, horizon, backend, opts):
        ctrl = quat_mpc.make_fleet_controller(horizon, opts, backend=backend)
        args = _example_batch(batch=1, horizon=horizon, dtype=dtype)
        args = jax.device_put(args, dev)

        def scan_fn(fbk, cmd, wts):
            def body(carry, _):
                f2 = fbk._replace(
                    torso_lin_vel_world=fbk.torso_lin_vel_world + carry * 1e-9
                )
                g, c = ctrl(f2, cmd, wts)
                return carry + jnp.sum(c) * 1e-9, None

            out, _ = jax.lax.scan(body, jnp.zeros((), dtype), None, length=K)
            return out

        scan_jit = jax.jit(scan_fn)
        t0 = time.perf_counter()
        jax.block_until_ready(scan_jit(*args))
        compile_s = time.perf_counter() - t0
        tick_ms = p50(lambda: scan_jit(*args)) / K * 1e3
        print(
            f"[{name}] N={horizon} backend={backend}: {tick_ms:.3f} ms/tick "
            f"({1000.0/tick_ms:,.0f} Hz)  [compile {compile_s:.0f}s]",
            file=sys.stderr,
        )
        return tick_ms

    opts_std = SolverOptions(al_iterations=2, ilqr_iterations=5)
    bench_cfg("seq", 10, "xla", opts_std)
    bench_cfg("assoc", 10, "assoc", opts_std)
    if "--quick" not in sys.argv:
        bench_cfg("seq", 20, "xla", opts_std)
        bench_cfg("assoc", 20, "assoc", opts_std)
        opts_ls8 = SolverOptions(
            al_iterations=2, ilqr_iterations=5, max_linesearch=8
        )
        bench_cfg("seq-ls8", 10, "xla", opts_ls8)


if __name__ == "__main__":
    main()
