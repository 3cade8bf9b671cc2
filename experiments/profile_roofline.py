"""Device-level roofline measurement for the fleet solver (VERDICT r4 #1).

Captures a `jax.profiler` trace of the B=16384 fleet MPC step on the real
TPU and aggregates the per-op stats the TPU profiler measures directly —
device self-time, HBM bandwidth, operational intensity, bound-by verdict —
into the numbers the bench needs:

- total device busy time per step (vs the wall p50, which includes the
  ~30-40 ms host dispatch floor of this tunneled backend);
- REAL HBM bytes/step = Σ_ops self_time × measured_memory_bw (the op-level
  cost-analysis bytes in bench.py conflate VMEM-resident reuse; these are
  the DRAM-port numbers the hardware counters report);
- achieved HBM GB/s over device-busy time, vs the 819 GB/s v5e pipe;
- the top ops by self-time, each with its bound_by verdict.

Usage:  python experiments/profile_roofline.py [batch] [reps]
Writes JSON to stdout; human table to stderr.

Parsing path: xprof's raw_to_tool_data (standalone profiler package; the
tensorboard_plugin_profile copy in this image has a mismatched TF wrapper).
Requires PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python on this image (the
generated _pb2s predate protoc 3.19) — set before any proto import.
"""

from __future__ import annotations

import glob
import json
import os
import pathlib
import sys
import tempfile

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def parse_framework_op_stats(xplane_files):
    """-> (rows, cols) from the profiler's framework_op_stats tool."""
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(xplane_files, "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    tables = json.loads(data)
    tab = tables[0]  # device table first
    cols = [c["id"] for c in tab["cols"]]
    rows = []
    for r in tab["rows"]:
        rows.append({k: c.get("v") for k, c in zip(cols, r["c"])})
    return rows


def aggregate(rows, reps):
    """Aggregate device rows into per-step roofline numbers."""
    dev = [r for r in rows if r.get("host_or_device") == "Device"
           and r.get("type") != "IDLE"]
    idle = [r for r in rows if r.get("host_or_device") == "Device"
            and r.get("type") == "IDLE"]
    busy_us = sum(r["total_self_time"] for r in dev)
    idle_us = sum(r["total_self_time"] for r in idle)
    # bytes per op: self-time (us) x measured BW (GB/s) = 1e3 bytes
    hbm_bytes = sum(
        r["total_self_time"] * (r.get("measured_memory_bw") or 0.0) * 1e3
        for r in dev
    )
    flops = sum(
        r["total_self_time"] * (r.get("measured_flop_rate") or 0.0) * 1e-6
        for r in dev
    )
    # bucket by jax.named_scope region (substring of the op name)
    scopes = {}
    for r in dev:
        name = r["operation"]
        key = "other"
        # inner scopes first: a nested op name contains both scope strings
        for s in ("gj_solve", "riccati_backward", "linesearch_rollouts",
                  "ls_select"):
            if s in name:
                key = s
                break
        d = scopes.setdefault(key, {"ms": 0.0, "bytes": 0.0})
        d["ms"] += r["total_self_time"] / 1e3
        d["bytes"] += (
            r["total_self_time"] * (r.get("measured_memory_bw") or 0.0) * 1e3
        )
    top = sorted(dev, key=lambda r: -r["total_self_time"])[:12]
    return {
        "scopes": {
            k: {"ms_per_step": round(v["ms"] / reps, 2),
                "gb_per_step": round(v["bytes"] / reps / 1e9, 2)}
            for k, v in sorted(scopes.items(), key=lambda kv: -kv[1]["ms"])
        },
        "device_busy_ms_per_step": busy_us / 1e3 / reps,
        "device_idle_ms_total": idle_us / 1e3,
        "hbm_bytes_per_step": hbm_bytes / reps,
        "hbm_gbps_achieved": hbm_bytes / max(busy_us, 1e-9) / 1e3,
        "flops_per_step_measured": flops / reps,
        "top_ops": [
            {
                "op": r["operation"][-90:],
                "self_ms_per_step": round(r["total_self_time"] / 1e3 / reps, 3),
                "pct": round(100.0 * r["total_self_time"] / busy_us, 1),
                "gbps": round(r.get("measured_memory_bw") or 0.0, 1),
                "intensity": round(r.get("operational_intensity") or 0.0, 2),
                "bound_by": r.get("bound_by"),
            }
            for r in top
        ],
    }


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _enable_compile_cache, _example_batch
    from quaternion_mpc_tpu.control import quat_mpc
    from quaternion_mpc_tpu.solver import SolverOptions

    if not os.environ.get("QMPC_PROFILE_NO_CACHE"):
        # NOTE: the persistent cache key ignores op-name metadata — after
        # adding/moving jax.named_scope annotations, run once with
        # QMPC_PROFILE_NO_CACHE=1 or the profile shows the cached (old) names.
        _enable_compile_cache()
    _ = np.asarray(jnp.zeros(()) + 1.0)  # sync-dispatch mode
    dtype = jnp.float32
    horizon = 10
    opts = SolverOptions(al_iterations=2, ilqr_iterations=5, max_linesearch=8)
    step = jax.jit(quat_mpc.make_fleet_controller(horizon, opts))
    args = _example_batch(batch=batch, horizon=horizon, dtype=dtype)
    args = jax.device_put(args, jax.devices()[0])
    np.asarray(step(*args)[1][:1])  # compile + pull-warm

    tdir = tempfile.mkdtemp(prefix="qmpc_prof_")
    with jax.profiler.trace(tdir):
        for _ in range(reps):
            g, c = step(*args)
        np.asarray(c[:1])
    files = sorted(glob.glob(tdir + "/**/*.xplane.pb", recursive=True))
    rows = parse_framework_op_stats(files)
    agg = aggregate(rows, reps)
    agg["batch"] = batch
    agg["reps"] = reps
    agg["hbm_bytes_per_solve"] = agg["hbm_bytes_per_step"] / batch
    agg["solves_per_sec_device"] = batch / (agg["device_busy_ms_per_step"] / 1e3)

    print(
        f"[roofline] B={batch}: device busy {agg['device_busy_ms_per_step']:.1f} "
        f"ms/step, HBM {agg['hbm_bytes_per_step']/1e9:.2f} GB/step "
        f"({agg['hbm_bytes_per_solve']/1e3:.1f} KB/solve), achieved "
        f"{agg['hbm_gbps_achieved']:.0f} GB/s of 819; device-only "
        f"{agg['solves_per_sec_device']:,.0f} solves/s",
        file=sys.stderr,
    )
    for k, v in agg["scopes"].items():
        print(
            f"[roofline] scope {k:22s} {v['ms_per_step']:8.2f} ms/step "
            f"{v['gb_per_step']:8.2f} GB/step",
            file=sys.stderr,
        )
    for t in agg["top_ops"]:
        print(
            f"[roofline]   {t['pct']:5.1f}%  {t['self_ms_per_step']:8.3f} ms  "
            f"{t['gbps']:7.1f} GB/s  int {t['intensity']:7.2f}  "
            f"{t['bound_by']:>8}  {t['op']}",
            file=sys.stderr,
        )
    print(json.dumps(agg))


if __name__ == "__main__":
    main()
