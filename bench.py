"""Benchmark: Go1 quaternion-MPC solves/sec/chip + latency table + f32 guard.

BASELINE.md metric: "MPC solves/sec/chip + p50 per-step solve latency
(Go1 quat-MPC, horizon N=10)". Reference throughput: ≤200 solves/s (one
robot, sequential 5 ms loop, Main.cpp:101-119; 5 ms real-time budget =
the latency contract). North-star: <2 ms/solve, >100k solves/s on v5e-16.

Reports (stderr details, ONE JSON line on stdout):
- throughput sweep B ∈ {256..16384}, linesearch width 8 (measured +13%
  over the full 12-alpha sweep at identical converged cost — the width is
  a SolverOptions choice; 12 remains the semantics default);
- convex-MPC (Euler baseline) throughput at B=4096;
- single-robot latency, all per-TICK p50 inside one scanned 50-step
  dispatch (the deployment shape: the 200 Hz loop compiled as one
  program), associative-scan Riccati backend (the small-batch winner,
  solver/parallel_riccati.py):
    N=10 cold-start full budget   (the benchmark config),
    N=20 cold-start full budget   (the online config, yaml:37),
    N=10 warm-started 1AL×3 RTI   (us carried across ticks — the
      reference warm-starts the same way, QuatMpc.cpp:250-253);
  the per-DISPATCH floor of this tunneled backend (~25-90 ms) is
  reported separately and honestly — it bounds interactive single-solve
  use, not the compiled loop;
- on-device f32 quality guard: the f32 fleet solve of the golden standing
  fixture must match the f64 golden optimum (cost rtol 0.5%, u(0) within
  0.5 N) — fails loudly in the JSON if the accelerator f32 path degrades.
"""

from __future__ import annotations

import json
import os
import sys
import time

# must precede the first google.protobuf import anywhere in the process:
# the xplane-parsing protos in this image predate protoc 3.19 and only load
# under the pure-python protobuf backend (see experiments/profile_roofline.py)
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import numpy as np


def _p50(fn, iters=10):
    import jax

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _p50_pull(fn, iters=5):
    """p50 wall time including a device->host PULL of the (scalar) result.

    On this tunneled backend `block_until_ready` intermittently returns
    without waiting (the lazy-dispatch mode can re-engage mid-process,
    yielding fantasy sub-floor timings); an actual value pull cannot lie.
    Callers subtract a pull-based no-op floor measured the same way."""
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn())
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _enable_compile_cache():
    """Persistent XLA compilation cache (repo-local, gitignored): the
    remote-compile tunnel's latency is wildly variable (10 s to minutes per
    program on bad days); warm-cache re-runs of this bench compile in ~1 s
    per program instead. Best-effort — harmless if unsupported."""
    import pathlib

    import jax

    try:
        cache = pathlib.Path(__file__).parent / ".jax_cache"
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


_PARTIAL = {"metric": "go1_quat_mpc_solves_per_sec_per_chip_N10",
            "unit": "solves/s", "partial": True}


def _install_partial_dump():
    """If the run is killed (timeout SIGTERM on a bad-tunnel day), emit the
    metrics measured so far as the JSON line instead of nothing."""
    import signal
    import sys as _sys

    def _dump(signum, frame):
        print(json.dumps(_PARTIAL), flush=True)
        _sys.exit(124)

    try:
        signal.signal(signal.SIGTERM, _dump)
    except Exception:
        pass


# TPU v5e (lite) single-chip peaks, from the public spec table
# (cloud.google.com/tpu/docs/v5e): 197 TFLOP/s bf16, ~98.5 TFLOP/s f32
# (MXU issues f32 at half bf16 rate), 819 GB/s HBM bandwidth.
V5E_PEAK_F32 = 98.5e12
V5E_PEAK_BF16 = 197e12
V5E_HBM_GBPS = 819e9


_FLOP_COUNT_CACHE = {}


def _flops_per_solve(horizon, opts, dtype, count_batch=256):
    """True flops+bytes per MPC solve, from XLA's cost analysis of a
    fully-UNROLLED compile of the same solver program.

    XLA counts a lax.scan body ONCE regardless of trip count, so the rolled
    production program under-counts by ~the iteration product (measured 20x
    at 2AL x 5iLQR x N=10). `make_fleet_solver(unroll_scans=True)` inlines
    every horizon/iteration scan — identical math, honest count. Counted at
    B=256 (flops/solve is batch-invariant; verified across the sweep)."""
    import jax

    key = (horizon, opts, str(dtype), count_batch)
    if key in _FLOP_COUNT_CACHE:
        return _FLOP_COUNT_CACHE[key]
    from __graft_entry__ import _example_batch
    from quaternion_mpc_tpu.control import quat_mpc
    from quaternion_mpc_tpu.solver import fleet as fl

    solver = fl.make_fleet_solver(
        quat_mpc._fleet_spec(), opts, backend="xla", unroll_scans=True
    )

    def count_fn(fbk, cmd, wts):
        prob = quat_mpc.build_fleet_problem(fbk, cmd, wts, horizon)
        sol = solver(prob)
        return sol.cost

    args = _example_batch(batch=count_batch, horizon=horizon, dtype=dtype)
    try:
        ca = jax.jit(count_fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) / count_batch
        bts = float(ca.get("bytes accessed", 0.0)) / count_batch
    except Exception as e:
        print(f"[bench] mfu: flop count unavailable ({e})", file=sys.stderr)
        flops, bts = 0.0, 0.0
    _FLOP_COUNT_CACHE[key] = (flops, bts)
    return flops, bts


def _mfu_from_compiled(horizon, opts, dtype, p50_s, batch):
    """Ground the 'speed-of-light' claim in a measured roofline position.

    Derivation (the 10-line version):
    1. flops/solve from XLA cost analysis of the UNROLLED solver compile
       (scan bodies inlined — see _flops_per_solve; a rolled compile
       under-counts ~20x).
    2. One fleet step = one MPC solve per scenario: 2 AL x 5 iLQR, each =
       Riccati backward + 8-alpha rollout + cost, N=10, n=13/m=12.
    3. achieved FLOP/s = flops/solve x batch / measured p50 step time.
    4. mfu_pct = achieved / 98.5 TFLOP/s (v5e f32 peak; the solve runs f32,
       so the f32 MXU rate is the honest denominator — against the bf16
       peak the number halves).
    5. bytes/solve (same analysis) is OP-LEVEL traffic — every op's
       operands+results, whether they hit HBM or stay VMEM-resident — so
       op-GB/s can exceed the 819 GB/s HBM pipe; it still fixes the
       arithmetic intensity (flop/byte ~0.5 vs the v5e f32 ridge ~120),
       which is the roofline verdict: the solve sits 240x left of the
       compute knee — bandwidth/latency-bound. Single-digit MFU is the
       expected truth for 12/13-dim Riccati algebra: lane utilization is
       bounded by 12/128 in any non-padded layout, and padding the ne axis
       to 128 was measured slower (round-2 Pallas negative result) — the
       headline metric is solves/s, and the roofline shows which wall it
       sits against (bandwidth/latency, not compute).
    """
    flops, bts = _flops_per_solve(horizon, opts, dtype)
    if flops <= 0.0:
        return None
    achieved = flops * batch / p50_s
    opbw = bts * batch / p50_s
    intensity = flops / max(bts, 1.0)
    out = {
        "flops_per_solve": round(flops, 1),
        "bytes_per_solve": round(bts, 1),
        "achieved_tflops": round(achieved / 1e12, 3),
        "mfu_pct": round(100.0 * achieved / V5E_PEAK_F32, 2),
        "arith_intensity_flop_per_byte": round(intensity, 3),
    }
    print(
        f"[bench] roofline @ B={batch}: {out['flops_per_solve']:,.0f} "
        f"flop/solve, {out['bytes_per_solve']:,.0f} op-B/solve "
        f"(intensity {intensity:.2f} flop/B vs f32 ridge "
        f"{V5E_PEAK_F32/V5E_HBM_GBPS:.0f}), "
        f"{out['achieved_tflops']} TFLOP/s achieved = {out['mfu_pct']}% of "
        f"f32 peak ({V5E_PEAK_F32/1e12:.1f} T); op-level traffic "
        f"{opbw/1e9:.0f} GB/s (VMEM-resident reuse included)",
        file=sys.stderr,
    )
    return out


def _hbm_roofline_profiled(step_jit, args, batch, reps=3):
    """Measured (hardware-counter) roofline position via a jax.profiler
    device trace: per-op self-time and memory bandwidth as the TPU reports
    them, plus a same-trace CALIBRATION kernel (256 MB copy-scale) whose
    achieved GB/s is the practical HBM stream rate on this chip. Returns a
    dict of bench columns or None (best-effort: the xplane tooling may be
    absent). This grounds what the op-level cost-analysis numbers cannot:
    whether the dominant op is AT the memory speed-of-light (then further
    throughput must come from cutting bytes) or below it."""
    try:
        import glob
        import tempfile

        import jax
        import jax.numpy as jnp
        from xprof.convert import raw_to_tool_data as rtd

        xcal = jnp.zeros((64, 1024, 1024), jnp.float32)
        fcal = jax.jit(lambda a: a * 1.000001 + 1.0)
        np.asarray(fcal(xcal)[0, 0, 0])  # compile + sync

        tdir = tempfile.mkdtemp(prefix="qmpc_bench_prof_")
        with jax.profiler.trace(tdir):
            c = None
            for _ in range(reps):
                _g, c = step_jit(*args)
            np.asarray(c[:1])
            y = None
            for _ in range(reps):
                y = fcal(xcal)
            np.asarray(y[0, 0, 0])
        files = sorted(glob.glob(tdir + "/**/*.xplane.pb", recursive=True))
        data, _ = rtd.xspace_to_tool_data(files, "framework_op_stats", {})
        if isinstance(data, bytes):
            data = data.decode()
        tab = json.loads(data)[0]
        cols = [c_["id"] for c_ in tab["cols"]]
        rows = [
            {k: c_.get("v") for k, c_ in zip(cols, r["c"])} for r in tab["rows"]
        ]
        dev = [
            r for r in rows
            if r.get("host_or_device") == "Device" and r.get("type") != "IDLE"
        ]
        solver = [r for r in dev if "grf_update" in (r.get("operation") or "")]
        cal = [r for r in dev if "lambda" in (r.get("operation") or "")]
        if not solver:
            return None
        busy_us = sum(r["total_self_time"] for r in solver)
        top = max(solver, key=lambda r: r["total_self_time"])
        cal_bw = max(
            (r.get("measured_memory_bw") or 0.0 for r in cal), default=0.0
        )
        busy_ms = busy_us / 1e3 / reps
        return {
            "device_busy_ms_per_step": round(busy_ms, 2),
            "solves_per_sec_device": round(batch / (busy_ms / 1e3), 1),
            "dominant_op_pct_device_time": round(
                100.0 * top["total_self_time"] / busy_us, 1
            ),
            "dominant_op_gbps": round(top.get("measured_memory_bw") or 0.0, 1),
            "dominant_op_bound_by": top.get("bound_by"),
            "hbm_stream_gbps_calibration": round(cal_bw, 1),
        }
    except Exception as e:  # tooling absent / tunnel hiccup — not fatal
        print(f"[bench] hbm roofline profile unavailable ({e})", file=sys.stderr)
        return None


def main():
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()
    _install_partial_dump()

    from __graft_entry__ import _example_batch
    from quaternion_mpc_tpu import examples
    from quaternion_mpc_tpu.control import quat_mpc
    from quaternion_mpc_tpu.solver import SolverOptions
    from quaternion_mpc_tpu.solver import fleet as fl

    dev = jax.devices()[0]
    print(f"[bench] device: {dev}", file=sys.stderr)

    # enter sync-dispatch mode BEFORE timing: a fresh process on this backend
    # is in a lazy mode where block_until_ready returns without waiting
    _ = np.asarray(jnp.zeros(()) + 1.0)

    dtype = jnp.float32
    # online solver budget: iterations_max=10 (QuatMpc.cpp:22) → 2 AL × 5 iLQR
    opts_full = SolverOptions(al_iterations=2, ilqr_iterations=5)
    # throughput config: 8 backtracking alphas (see module docstring)
    opts_tp = SolverOptions(al_iterations=2, ilqr_iterations=5, max_linesearch=8)

    # dispatch floor: a no-op jit round trip (document, don't hide)
    noop = jax.jit(lambda x: x + 1.0)
    xz = jnp.zeros((), dtype)
    jax.block_until_ready(noop(xz))
    floor_ms = _p50(lambda: noop(xz)) * 1e3
    print(f"[bench] dispatch floor (no-op jit): {floor_ms:.2f} ms", file=sys.stderr)

    # IMPORTANT: no device->host pulls (float()/np.asarray of jax arrays)
    # before the THROUGHPUT loops are done — on this backend a pull degrades
    # subsequent dispatches to ~25 ms. The latency section afterwards pulls
    # DELIBERATELY (_p50_pull): block_until_ready can silently no-op when
    # the backend re-enters its lazy mode, and only a value pull is
    # guaranteed to wait for the computation.

    # ---- throughput sweep (headline, quat MPC, N=10, n_alpha=8) ----
    # compile budget: each new batch shape is a fresh XLA compile (~30-90 s
    # through the tunnel), so the sweep is kept small
    horizon = 10
    step_jit = jax.jit(quat_mpc.make_fleet_controller(horizon, opts_tp))
    best = None
    sweep = []
    mfu = None
    for batch in (256, 4096, 16384):
        args = _example_batch(batch=batch, horizon=horizon, dtype=dtype)
        args = jax.device_put(args, dev)
        grf, cost = step_jit(*args)  # compile + warmup
        jax.block_until_ready(grf)
        p50 = _p50(lambda: step_jit(*args)[0])
        sweep.append((batch, p50, batch / p50, p50 / batch * 1e3, jnp.mean(cost)))
        if best is None or batch / p50 > best[0]:
            best = (batch / p50, p50, batch)
        _PARTIAL["value"] = round(best[0], 1)
        _PARTIAL["vs_baseline"] = round(best[0] / 200.0, 2)
    mfu = _mfu_from_compiled(horizon, opts_tp, dtype, best[1], best[2])
    if mfu:
        _PARTIAL.update(mfu)

    # ---- convex MPC (Euler baseline) throughput ----
    from quaternion_mpc_tpu.control import convex_mpc

    # convex budget: iterations_max=5 (ConvexMpc.cpp:37) -> 1 AL x 5 iLQR
    convex_opts = SolverOptions(
        al_iterations=1, ilqr_iterations=5, max_linesearch=8
    )
    convex_jit = jax.jit(convex_mpc.make_fleet_controller(horizon, convex_opts))
    cargs = examples.standing_batch(4096, horizon, dtype, controller="convex")
    cargs = jax.device_put(cargs, dev)
    cg, cc = convex_jit(*cargs)
    jax.block_until_ready(cg)
    convex_p50 = _p50(lambda: convex_jit(*cargs)[0])
    convex_sps = 4096 / convex_p50
    convex_cost = jnp.mean(cc)

    # ---- ESTIMATED fleet throughput: the full sensors→KF→MPC→plant loop
    # (GazeboInterface-shaped, derived-only sensing + per-scenario Gaussian
    # sensor noise) as the data-parallel axis — solves/s with estimation
    # genuinely in the loop, not just the ground-truth SRB tier ----
    from quaternion_mpc_tpu.runtime import step as rt_step
    from quaternion_mpc_tpu.utils import config as cfg_mod

    eB = 4096
    ewts = quat_mpc.weights_from_config(cfg_mod.gazebo_go1_quat_mpc(), dtype=dtype)
    ecarry1, esp1 = rt_step.init_estimated_walking_scenario(
        ewts, dtype=dtype, kf_type=1
    )
    ejoy1 = rt_step.neutral_joy(dtype)._replace(velx=jnp.asarray(0.3, dtype))
    etile = lambda t: jax.tree.map(
        lambda a: jnp.broadcast_to(a, (eB,) + a.shape), t
    )
    ecarry, esp, ejoy = etile(ecarry1), etile(esp1), etile(ejoy1)
    ecarry = ecarry._replace(key=jax.random.split(jax.random.PRNGKey(0), eB))
    ecarry, esp, ejoy = jax.device_put((ecarry, esp, ejoy), dev)
    estep_jit = jax.jit(rt_step.make_fleet_estimated_step(
        horizon=horizon, opts=opts_tp, kf_type=1,
        noise_acc=0.2, noise_gyro=0.02, noise_foot_vel=0.02,
        noise_foot_pos=0.003,
    ))
    ecarry_w, em = estep_jit(ecarry, esp, ejoy)
    jax.block_until_ready(ecarry_w.plant.pos)
    est_p50 = _p50(lambda: estep_jit(ecarry, esp, ejoy)[0].plant.pos)
    est_sps = eB / est_p50

    # ---- fleet RTI throughput: cross-tick primal warm start through the
    # batch-last solver at the deployment budget (1 AL × 3 iLQR — the mode
    # the closed-loop tests run; the reference's own SetState/SetInput warm
    # starting taken fleet-wide). This is the realistic rate of a DEPLOYED
    # fleet, where every tick after the first is warm ----
    wcarry1, wsp1 = rt_step.init_walking_scenario(
        ewts, dtype=dtype, warm_start=True, horizon=horizon
    )
    wjoy1 = rt_step.neutral_joy(dtype)._replace(velx=jnp.asarray(0.3, dtype))
    wcarry = etile(wcarry1)
    wsp = etile(wsp1)
    wjoy = etile(wjoy1)
    wcarry, wsp, wjoy = jax.device_put((wcarry, wsp, wjoy), dev)
    wstep_jit = jax.jit(rt_step.make_fleet_walking_step(
        horizon=horizon,
        opts=SolverOptions(al_iterations=1, ilqr_iterations=3,
                           penalty_initial=10.0, max_linesearch=8),
        warm_start=True,
    ))
    # settle into the warm regime before timing
    for _ in range(3):
        wcarry, _wm = wstep_jit(wcarry, wsp, wjoy)
    jax.block_until_ready(wcarry.plant.pos)
    rti_p50 = _p50(lambda: wstep_jit(wcarry, wsp, wjoy)[0].plant.pos)
    rti_sps = eB / rti_p50

    # ---- measured HBM roofline position (device trace). Placed AFTER all
    # _p50/block_until_ready throughput timing: its device->host pulls flip
    # the backend into the ~25 ms-per-dispatch sync mode (see module
    # docstring); the latency sections below already time with _p50_pull ----
    hbm = _hbm_roofline_profiled(step_jit, args, batch=16384)
    if hbm:
        _PARTIAL.update(hbm)
        print(
            f"[bench] device roofline: busy {hbm['device_busy_ms_per_step']} "
            f"ms/step (device-only {hbm['solves_per_sec_device']:,.0f} "
            f"solves/s); dominant op {hbm['dominant_op_pct_device_time']}% of "
            f"device time at {hbm['dominant_op_gbps']} GB/s "
            f"(bound_by={hbm['dominant_op_bound_by']}) vs "
            f"{hbm['hbm_stream_gbps_calibration']} GB/s measured stream "
            f"calibration (819 spec)",
            file=sys.stderr,
        )

    # ---- single-robot latency: per-tick inside one scanned dispatch ----
    K = 50  # ticks per scanned dispatch (0.25 s of 200 Hz control)
    opts_rti = SolverOptions(
        al_iterations=1, ilqr_iterations=3, penalty_initial=10.0
    )

    def scanned_tick(h, opts, warm, dual=False):
        solver = fl.make_fleet_solver(
            quat_mpc._fleet_spec(), opts, backend="assoc"
        )
        args = _example_batch(batch=1, horizon=h, dtype=dtype)
        args = jax.device_put(args, dev)

        def scan_fn(fbk, cmd, wts):
            prob0 = quat_mpc.build_fleet_problem(fbk, cmd, wts, h)
            nc = prob0.cb.shape[-2]
            lam0 = jnp.zeros((h, nc, 1), dtype)

            def body(carry, _):
                pert, us_carry, lam_carry = carry
                # carry-dependent input perturbation keeps the solve
                # loop-carried so XLA cannot hoist it out of the scan
                f2 = fbk._replace(
                    torso_lin_vel_world=fbk.torso_lin_vel_world + pert * 1e-9
                )
                prob = quat_mpc.build_fleet_problem(f2, cmd, wts, h)
                if warm:
                    prob = prob._replace(us_init=us_carry)
                if dual:
                    prob = prob._replace(lam_init=lam_carry)
                sol = solver(prob)
                return (pert + jnp.sum(sol.cost) * 1e-9, sol.us, sol.lam), None

            (out, _, _), _ = jax.lax.scan(
                body, (jnp.zeros((), dtype), prob0.us_init, lam0),
                None, length=K,
            )
            return out

        scan_jit = jax.jit(scan_fn)
        np.asarray(scan_jit(*args))  # compile + warm
        pull_floor = _p50_pull(lambda: noop(xz))
        t = _p50_pull(lambda: scan_jit(*args))
        return max(t - pull_floor, 0.0) / K

    # dual-warm RTI: primal AND dual (AL multiplier) carry across ticks —
    # 1 AL x 2 iLQR holds closed-loop tracking (test_rti_dual_warm_tracks)
    opts_rti2 = SolverOptions(
        al_iterations=1, ilqr_iterations=2, penalty_initial=10.0
    )
    lat_rows = []
    for label, key, spec_args in [
        ("N=10 cold (benchmark cfg)", "p50_ms_per_tick_B1_scanned",
         (10, opts_full, False, False)),
        ("N=20 cold (online cfg)", "p50_ms_per_tick_B1_N20",
         (20, opts_full, False, False)),
        ("N=10 warm RTI 1ALx3", "p50_ms_per_tick_B1_rti",
         (10, opts_rti, True, False)),
        ("N=20 warm RTI 1ALx3", "p50_ms_per_tick_B1_N20_rti",
         (20, opts_rti, True, False)),
        ("N=10 dual-warm RTI 1ALx2", "p50_ms_per_tick_B1_rti_dual",
         (10, opts_rti2, True, True)),
    ]:
        t = scanned_tick(*spec_args)
        lat_rows.append((label, t))
        _PARTIAL[key] = round(t * 1e3, 3)

    # ---- on-device f32 quality guard vs the f64 golden fixture ----
    gprob, gold_us, gold_xs = examples.fixture_fleet_problem(256, dtype)
    gsolver = jax.jit(fl.make_fleet_solver(quat_mpc._fleet_spec(), SolverOptions()))
    gsol = gsolver(jax.device_put(gprob, dev))
    jax.block_until_ready(gsol.cost)

    # ---- timing done: pulls are safe now ----
    for batch, p50, sps, per_ms, mean_cost in sweep:
        print(
            f"[bench] quat batch={batch}: p50 step {p50*1e3:.2f} ms, "
            f"{sps:,.0f} solves/s, {per_ms:.4f} ms/solve, "
            f"mean cost {float(mean_cost):.4f}",
            file=sys.stderr,
        )
    print(
        f"[bench] convex batch=4096: p50 step {convex_p50*1e3:.2f} ms, "
        f"{convex_sps:,.0f} solves/s, mean cost {float(convex_cost):.4f}",
        file=sys.stderr,
    )
    print(
        f"[bench] estimated fleet (KF+noise in loop) batch={eB}: p50 step "
        f"{est_p50*1e3:.2f} ms, {est_sps:,.0f} solves/s",
        file=sys.stderr,
    )
    print(
        f"[bench] fleet RTI (warm 1ALx3, walking loop) batch={eB}: p50 step "
        f"{rti_p50*1e3:.2f} ms, {rti_sps:,.0f} solves/s",
        file=sys.stderr,
    )
    for label, tick_s in lat_rows:
        print(
            f"[bench] latency B=1 {label}: {tick_s*1e3:.3f} ms/tick "
            f"({1.0/tick_s:,.0f} Hz control rate) [assoc backend, "
            f"{K}-step scan]",
            file=sys.stderr,
        )

    # quality: compare against the golden optimum in f64 ON HOST (numpy —
    # the TPU has no f64 ALU, jnp would silently truncate)
    g_us = np.asarray(gsol.us, np.float64)  # (20, 12, 256)
    g_cost = np.asarray(gsol.cost, np.float64)
    gold_cost = examples.fixture_gold_cost(gold_us, gold_xs)
    u0_err = float(np.max(np.abs(g_us[0].T - gold_us[0][None, :])))
    cost_err = float(np.max(np.abs(g_cost - gold_cost)))
    f32_ok = bool(
        np.all(np.isfinite(g_cost))
        and cost_err <= 5e-3 * max(abs(gold_cost), 1e-6) + 1e-6
        and u0_err <= 0.5
    )
    print(
        f"[bench] f32 quality guard: u0_err {u0_err:.2e} N (tol 0.5), "
        f"cost_err {cost_err:.2e} vs golden {gold_cost:.6f} -> "
        f"{'OK' if f32_ok else 'DEGRADED'}",
        file=sys.stderr,
    )

    solves_per_sec, p50, batch = best
    # reference: 200 solves/s per robot controller (BASELINE.md); the 5 ms
    # latency contract is Main.cpp:115
    result = {
        "metric": "go1_quat_mpc_solves_per_sec_per_chip_N10",
        "value": round(solves_per_sec, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_sec / 200.0, 2),
        "n_alpha": 8,
        "p50_ms_per_tick_B1_scanned": round(lat_rows[0][1] * 1e3, 3),
        "p50_ms_per_tick_B1_N20": round(lat_rows[1][1] * 1e3, 3),
        "p50_ms_per_tick_B1_rti": round(lat_rows[2][1] * 1e3, 3),
        "p50_ms_per_tick_B1_N20_rti": round(lat_rows[3][1] * 1e3, 3),
        "p50_ms_per_tick_B1_rti_dual": round(lat_rows[4][1] * 1e3, 3),
        # keyed to the ONLINE config (N=20, the reference's deployed horizon,
        # gazebo_go1_quat_mpc.yaml:37) COLD — the honest reading of the 5 ms
        # real-time contract (Main.cpp:115); N=10 is the benchmark config
        "meets_5ms_contract": bool(lat_rows[1][1] * 1e3 < 5.0),
        "meets_5ms_contract_N10": bool(lat_rows[0][1] * 1e3 < 5.0),
        # BASELINE north star: <2 ms/solve on one chip — keyed to the
        # N=10 warm-RTI row (the deployment mode the reference's own
        # SetState/SetInput warm starting implies); the _cold variant is
        # the same budget with NO cross-tick warm start (full 2AL×5 solve)
        "meets_2ms_north_star": bool(lat_rows[2][1] * 1e3 < 2.0),
        "meets_2ms_north_star_cold": bool(lat_rows[0][1] * 1e3 < 2.0),
        "convex_solves_per_sec": round(convex_sps, 1),
        "estimated_fleet_solves_per_sec": round(est_sps, 1),
        "fleet_rti_solves_per_sec": round(rti_sps, 1),
        "dispatch_floor_ms": round(floor_ms, 2),
        "f32_fixture_ok": f32_ok,
        # >16k batch collapse mechanism (measured, r5 device profile):
        # compute reduce_sum scales exactly linearly 16k→32k while
        # slice/concat/while-bookkeeping ops blow up 3-6× with apparent BW
        # dropping 5.2→1.3 TB/s — a VMEM capacity cliff: past B≈16k the
        # (12,12,B) slabs no longer stay VMEM-resident across fusion
        # boundaries and layout ops become HBM copies.
        "batch_cliff_mechanism": "vmem-capacity: layout ops spill past B~16k",
    }
    if mfu:
        result.update(mfu)
    if hbm:
        result.update(hbm)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
