"""Worker process for the two-process jax.distributed test.

Invoked as:  python tests/_distributed_worker.py <coordinator> <num_procs> <pid>

Each process owns 2 virtual CPU devices; the fleet standing step is sharded
over the global ('scenario',) mesh spanning both processes, with metrics
psum-reduced across processes. Prints one JSON line:
{"sharded": {...fleet totals...}, "local_ref": {...same computed
single-process...}} — the parent asserts they match across processes.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    coordinator, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from quaternion_mpc_tpu.parallel import distributed

    info = distributed.init(
        coordinator_address=coordinator, num_processes=num_procs, process_id=pid
    )
    assert info["process_count"] == num_procs, info
    assert info["global_devices"] == 2 * num_procs, info

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from quaternion_mpc_tpu.control import quat_mpc
    from quaternion_mpc_tpu.models import srb
    from quaternion_mpc_tpu.parallel import mesh as mesh_mod
    from quaternion_mpc_tpu.runtime import step as rt
    from quaternion_mpc_tpu.solver import SolverOptions
    from quaternion_mpc_tpu.utils import config as cfg_mod

    dtype = jnp.float32
    batch = 4 * num_procs  # 2 per device
    horizon = 4

    wts = quat_mpc.weights_from_config(cfg_mod.gazebo_go1_quat_mpc(), dtype=dtype)
    carry1, sp1 = rt.init_scenario(wts, srb.go1_params().foot_pos, dtype=dtype)
    joy1 = rt.neutral_joy(dtype)

    def tile(tree, n):
        return jax.tree.map(
            lambda a: jnp.broadcast_to(a, (n,) + a.shape), tree
        )

    # deterministic identical global batch in every process
    carry_g, sp_g, joy_g = tile(carry1, batch), tile(sp1, batch), tile(joy1, batch)

    step_fn = rt.make_fleet_standing_step(
        horizon=horizon,
        opts=SolverOptions(al_iterations=1, ilqr_iterations=2),
        plant_substeps=1,
    )

    # ---- local single-process reference on the full batch (no mesh)
    ref_carry, ref_metrics = jax.jit(step_fn)(carry_g, sp_g, joy_g)
    local_ref = {
        "mpc_cost": float(jnp.sum(ref_metrics.mpc_cost)),
        "alive": float(jnp.sum(ref_metrics.alive)),
    }

    # ---- sharded over the global 2-process mesh
    mesh = mesh_mod.scenario_mesh(jax.devices())

    def to_global(tree):
        import numpy as np

        def put(x):
            x = np.asarray(x)
            spec = P() if x.ndim == 0 else P(mesh_mod.SCENARIO_AXIS)
            sh = NamedSharding(mesh, spec)
            # every process holds the full batch; the callback hands each
            # device its addressable shard
            return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

        return jax.tree.map(put, tree)

    carry_s = to_global(carry_g)
    sp_s = to_global(sp_g)
    joy_s = to_global(joy_g)

    fleet = jax.jit(mesh_mod.fleet_shard(step_fn, mesh))
    out_carry, metrics = fleet(carry_s, sp_s, joy_s)
    jax.block_until_ready(metrics.mpc_cost)
    sharded = {
        # psum'd totals: replicated, identical on every process
        "mpc_cost": float(metrics.mpc_cost),
        "alive": float(metrics.alive),
    }
    print(json.dumps({"pid": pid, "sharded": sharded, "local_ref": local_ref}))


if __name__ == "__main__":
    main()
