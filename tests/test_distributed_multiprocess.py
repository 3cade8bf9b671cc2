"""Two-process jax.distributed bring-up (VERDICT r2 missing #5): spawn two
OS processes, join them with ``jax.distributed.initialize`` over a local
coordinator, shard the fleet standing step across the 4-device global mesh
(2 virtual CPU devices per process), and assert the psum-reduced fleet
metrics (a) agree between the processes and (b) match a single-process
run of the same batch.

This executes the actual multi-host code path — cross-process collective
init, global-mesh shard_map, cross-process psum — at CI scale (SURVEY.md
§2.3; the ≥80% BASELINE scaling axis is measured on real chips, this pins
correctness of the mechanism).
"""

import json
import os
import socket
import subprocess
import sys
import pathlib

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
WORKER = pathlib.Path(__file__).parent / "_distributed_worker.py"


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_psum_matches_single_process():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{ROOT}{os.pathsep}" + env.get("PYTHONPATH", "")
    # a clean slate for the child runtimes (the parent pytest process has
    # its own jax initialized single-process)
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), coordinator, "2", str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=540)
        assert p.returncode == 0, f"worker failed:\nstdout={out}\nstderr={err}"
        line = [ln for ln in out.strip().splitlines() if ln.startswith("{")][-1]
        outs.append(json.loads(line))

    by_pid = {o["pid"]: o for o in outs}
    assert set(by_pid) == {0, 1}

    # psum'd fleet totals are replicated: both processes must report the
    # SAME number (this is the cross-process collective actually working)
    s0, s1 = by_pid[0]["sharded"], by_pid[1]["sharded"]
    np.testing.assert_allclose(s0["mpc_cost"], s1["mpc_cost"], rtol=1e-6)
    assert s0["alive"] == s1["alive"] == 8.0

    # and they match the single-process reference on the identical batch
    ref = by_pid[0]["local_ref"]
    np.testing.assert_allclose(s0["mpc_cost"], ref["mpc_cost"], rtol=1e-5)
    assert s0["alive"] == ref["alive"]
