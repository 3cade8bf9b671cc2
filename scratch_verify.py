"""Verification drive for the scatter-free fleet path + probes."""
import jax, jax.numpy as jnp, numpy as np
from __graft_entry__ import entry, _example_batch
from quaternion_mpc_tpu.control import quat_mpc
from quaternion_mpc_tpu.solver import SolverOptions

# 1. driver entry surface: jitted forward step on B=8
fn, args = entry()
grf, cost = jax.jit(fn)(*args)
grf = np.asarray(grf); cost = np.asarray(cost)
print("entry grf shape:", grf.shape, "cost:", np.round(cost, 4), flush=True)
fz = grf[:, :, 2].sum(axis=1)
print("sum Fz per scenario:", np.round(fz, 2), " (mg=125.96; deviations = corrective accel)")
assert np.all(np.isfinite(grf)), "non-finite GRFs"

# shared fleet controller, B=8 (one compile for probes 2-4)
ctrl = quat_mpc.make_fleet_controller(10, SolverOptions(al_iterations=2, ilqr_iterations=5))
ctrl_jit = jax.jit(ctrl)
fbk, cmd, wts = _example_batch(batch=8, horizon=10, dtype=jnp.float32)

# 2. unperturbed scenarios: Fz must equal weight almost exactly
fbk_n = fbk._replace(
    torso_quat=np.tile(np.array([1, 0, 0, 0], np.float32), (8, 1)),
    torso_lin_vel_world=np.zeros((8, 3), np.float32),
    torso_ang_vel_body=np.zeros((8, 3), np.float32),
)
gn, cn = ctrl_jit(fbk_n, cmd, wts)
fz_n = np.asarray(gn)[:, :, 2].sum(axis=1)
print("unperturbed sum Fz:", np.round(fz_n, 3), "(mg=125.96)", flush=True)
assert np.all(np.abs(fz_n - 12.84 * 9.81) < 1.0), "neutral GRFs don't support weight"

# 3. probe: zero contacts (falling-cat style) -> no NaN, bounded forces
cmd0 = cmd._replace(contacts=jnp.zeros_like(cmd.contacts))
g0, c0 = ctrl_jit(fbk, cmd0, wts)
g0 = np.asarray(g0)
print("zero-contact: max |F| =", float(np.abs(g0).max()), "cost finite:", bool(np.isfinite(np.asarray(c0)).all()), flush=True)
assert np.isfinite(g0).all()

# 4. probe: unbatched (1,1)-mass fleet params (the shape bug that was fixed)
from quaternion_mpc_tpu.models import srb
p_bl = srb.params_to_fleet(srb.go1_params(dtype=jnp.float32), batch_axis=False)
x = jnp.zeros((13, 5), jnp.float32).at[3].set(1.0).at[2].set(0.3)
u = jnp.tile(jnp.asarray([0, 0, 12.84 * 9.81 / 4], jnp.float32), (4,))[:, None] * jnp.ones((1, 5))
J = srb.quat_srb_jacobian_fleet(x, u, p_bl)
print("unbatched-params jacobian shape:", J.shape, "finite:", bool(np.isfinite(np.asarray(J)).all()))
print("VERIFY-DRIVE PASS")
