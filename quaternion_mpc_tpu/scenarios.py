"""Named scenario builders for the reference's four branch configs.

`README.md:20-25` of the reference documents four branches — `main` (Go1
walking), `falling_cat` (airborne attitude reorientation), `spider_dog`
(chimney climb between two walls), `humanoid` (MIT-humanoid biped balance).
Only `main` is code in the reference snapshot; the others differ solely in
contact geometry, schedule, and references (SURVEY.md branch note), so here
each is a *data* builder returning (ModelSpec, TrajOptProblem, SolverOptions)
for the shared quaternion solver core.

Used by the CLI (`run_scenario --name falling_cat`) and the test suite.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from quaternion_mpc_tpu.control.quat_mpc import cone_matrix, cone_matrix_with_normal
from quaternion_mpc_tpu.models import attitude, srb
from quaternion_mpc_tpu.ops import lie
from quaternion_mpc_tpu.solver import (
    CostSpec,
    ModelSpec,
    SolverOptions,
    TrajOptProblem,
)

GRAVITY = 9.81


def falling_cat(angle_deg: float = 160.0, N: int = 40, h: float = 0.02):
    """Contact-free large-angle reorientation under torque limits — the
    singularity-free selling point of the quaternion formulation."""
    spec = ModelSpec(
        nx=7, nu=3, f=attitude.attitude_dynamics, quat_idx=0, integrator="midpoint"
    )
    params = attitude.go1_attitude_params()
    axis = jnp.array([1.0, 0.5, 0.2])
    axis = axis / jnp.linalg.norm(axis)
    ang = jnp.deg2rad(angle_deg)
    q0 = jnp.concatenate([jnp.cos(ang / 2)[None], jnp.sin(ang / 2) * axis])
    x0 = jnp.concatenate([q0, jnp.zeros(3)])
    x_goal = jnp.array([1.0, 0, 0, 0, 0, 0, 0.0])
    Cu, cb = attitude.torque_box(8.0)
    w = jnp.full((N + 1,), 50.0).at[-1].set(10000.0)
    prob = TrajOptProblem(
        x0=x0,
        cost=CostSpec(
            Qd=jnp.array([0.0, 0, 0, 0, 1.0, 1.0, 1.0]),
            Rd=1e-3 * jnp.ones(3),
            w=w,
            x_ref=jnp.tile(x_goal, (N + 1, 1)),
            u_ref=jnp.zeros((N + 1, 3)),
            Qdf=jnp.array([0.0, 0, 0, 0, 10.0, 10.0, 10.0]),
        ),
        Cu=Cu, cb=cb, h=jnp.asarray(h), params=params,
        us_init=jnp.zeros((N, 3)),
    )
    return spec, prob, SolverOptions(al_iterations=3, ilqr_iterations=25)


def humanoid(N: int = 20, h: float = 0.02):
    """Biped balance: the same quat SRB with 2 contact feet (MIT humanoid)."""
    mass = 24.0
    foot_pos = [[0.0, 0.12, -0.8], [0.0, -0.12, -0.8]]
    params = srb.go1_params(foot_pos=foot_pos, inertia_scale=1.0, mass=mass)
    params = params._replace(
        inertia=jnp.asarray(np.diag([0.3, 0.25, 0.1])),
        com_offset=jnp.zeros(3),
        com_mass=jnp.asarray(0.0),
    )
    spec = ModelSpec(
        nx=13, nu=6, f=srb.quat_srb_dynamics, fj=srb.quat_srb_jacobian, quat_idx=3
    )
    C1 = cone_matrix(0.6, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    Cu = jax.scipy.linalg.block_diag(C1, C1)
    cb = jnp.zeros((12,)).at[4::6].set(-400.0)
    q0 = lie.euler_to_quat(jnp.array([0.1, -0.08, 0.0]))
    x0 = jnp.concatenate([jnp.zeros(3), q0, jnp.array([0.1, 0.0, 0.0]), jnp.zeros(3)])
    u_ref = jnp.tile(jnp.array([0.0, 0, mass * GRAVITY / 2] * 2), (N + 1, 1))
    prob = TrajOptProblem(
        x0=x0,
        cost=CostSpec(
            Qd=jnp.array([2.5, 2.5, 10, 0, 0, 0, 0, 0.5, 0.5, 0.5, 0.2, 0.2, 0.2]),
            Rd=1e-6 * jnp.ones(6),
            w=jnp.asarray(50.0),
            x_ref=jnp.tile(
                jnp.array([0.0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0.0]), (N + 1, 1)
            ),
            u_ref=u_ref,
        ),
        Cu=Cu, cb=cb, h=jnp.asarray(h), params=params, us_init=u_ref[:N],
    )
    return spec, prob, SolverOptions()


def spider_dog(N: int = 15, h: float = 0.02):
    """Chimney brace: 4 feet on opposing walls, weight carried entirely by
    friction (rotated cone normals ∓ŷ)."""
    mu, mass = 0.7, 12.84
    foot_pos = jnp.asarray(
        [[0.2, 0.2, -0.1], [0.2, -0.2, -0.1], [-0.2, 0.2, -0.1], [-0.2, -0.2, -0.1]]
    )
    normals = jnp.asarray(
        [[0.0, -1.0, 0], [0.0, 1.0, 0], [0.0, -1.0, 0], [0.0, 1.0, 0.0]]
    )
    params = srb.go1_params(foot_pos=foot_pos, inertia_scale=1.0, mass=mass)
    params = params._replace(com_offset=jnp.zeros(3), com_mass=jnp.asarray(0.0))
    spec = ModelSpec(
        nx=13, nu=12, f=srb.quat_srb_dynamics, fj=srb.quat_srb_jacobian, quat_idx=3
    )
    cones = jax.vmap(lambda nrm: cone_matrix_with_normal(mu, nrm))(normals)
    Cu = jax.scipy.linalg.block_diag(*[cones[i] for i in range(4)])
    cb = jnp.zeros((24,)).at[4::6].set(-200.0)
    press = 60.0
    u0 = jnp.asarray(
        [[0.0, -press, mass * GRAVITY / 4], [0.0, press, mass * GRAVITY / 4],
         [0.0, -press, mass * GRAVITY / 4], [0.0, press, mass * GRAVITY / 4]]
    ).reshape(-1)
    x_hover = jnp.array([0.0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0.0])
    prob = TrajOptProblem(
        x0=x_hover,
        cost=CostSpec(
            Qd=jnp.array([2.5, 2.5, 10, 0, 0, 0, 0, 1.0, 1.0, 1.0, 0.5, 0.5, 0.5]),
            Rd=1e-5 * jnp.ones(12),
            w=jnp.asarray(50.0),
            x_ref=jnp.tile(x_hover, (N + 1, 1)),
            u_ref=jnp.tile(u0, (N + 1, 1)),
        ),
        Cu=Cu, cb=cb, h=jnp.asarray(h), params=params,
        us_init=jnp.tile(u0, (N, 1)),
    )
    return spec, prob, SolverOptions()


SCENARIOS = {
    "falling_cat": falling_cat,
    "humanoid": humanoid,
    "spider_dog": spider_dog,
}


def solve_scenario(name: str, **kwargs):
    """Build + solve a named branch scenario; returns (solution, summary)."""
    from quaternion_mpc_tpu.solver import make_solver

    spec, prob, opts = SCENARIOS[name](**kwargs)
    sol = jax.jit(make_solver(spec, opts))(prob)
    qi = spec.quat_idx
    q_end = sol.xs[-1, qi : qi + 4]
    q_ref = prob.cost.x_ref[-1, qi : qi + 4]
    summary = {
        "final_cost": float(sol.stats.cost),
        "constraint_violation": float(sol.stats.constraint_violation),
        "attitude_error": float(1.0 - jnp.abs(jnp.sum(q_end * q_ref))),
        "max_input": float(jnp.max(jnp.abs(sol.us))),
    }
    return sol, summary


# ---------------------------------------------------------------------------
# Closed-loop (receding-horizon) tiers — the reference branches were
# closed-loop CONTROLLERS (README.md:20-25), not single trajectory solves.
# ---------------------------------------------------------------------------


def make_receding_step(name: str, opts: SolverOptions = None, **scenario_kw):
    """Receding-horizon closed loop for a branch scenario.

    Re-solves the scenario's trajectory problem FROM THE CURRENT PLANT
    STATE every tick (primal warm start shifted one knot — the RTI scheme
    the online Go1 controller uses) and applies u(0) to the scenario's
    plant:

    - falling_cat: the airborne attitude plant (quat + body rates, full
      gyroscopic term);
    - humanoid / spider_dog: the full SRB plant (`sim.plant` — world-frame
      integration WITH the gyroscopic term the MPC model drops, so the
      loop sees genuine model mismatch) with the scenario's contact feet;
      disturbances inject through `sim.plant.ExtWrench`.

    Returns (step, carry0) where step(carry, ext_wrench=None) ->
    (carry, metrics_dict); carry = (x, us_warm).
    """
    from quaternion_mpc_tpu.sim import plant as plant_mod
    from quaternion_mpc_tpu.solver import make_solver

    # the scenario's own opts are the OFFLINE budget; the receding loop
    # uses a per-tick budget (below) since warm starts carry convergence
    spec, prob0, _offline_opts = SCENARIOS[name](**scenario_kw)
    if opts is None:
        # per-tick budget: a few AL rounds; warm start carries convergence
        opts = SolverOptions(
            al_iterations=2,
            ilqr_iterations=8 if name == "falling_cat" else 4,
        )
    solver = make_solver(spec, opts)
    qi = spec.quat_idx
    h = prob0.h
    q_ref_end = prob0.cost.x_ref[-1, qi:qi + 4]

    if name == "falling_cat":
        def plant_step(x, u, ext):
            tq = jnp.zeros(3, x.dtype) if ext is None else ext.torque_body

            def f(xx):
                return attitude.attitude_dynamics(
                    xx, u + tq, prob0.params
                )

            xm = x + 0.5 * h * f(x)
            x_new = x + h * f(xm)
            return x_new.at[0:4].set(lie.quat_normalize(x_new[0:4]))
    else:
        pp = plant_mod.PlantParams(
            mass=prob0.params.mass,
            inertia=prob0.params.inertia,
            com_offset=jnp.zeros(3),
            com_mass=jnp.asarray(0.0),
            foot_pos_body=jnp.asarray(prob0.params.foot_pos),
        )

        def plant_step(x, u, ext):
            ps = plant_mod.PlantState(
                pos=x[0:3], quat=x[3:7], vel=x[7:10], omega=x[10:13]
            )
            n_feet = u.shape[0] // 3
            ps = plant_mod.step(ps, u.reshape(n_feet, 3), pp, h, ext)
            return jnp.concatenate([ps.pos, ps.quat, ps.vel, ps.omega])

    def step(carry, ext_wrench=None):
        x, us_warm = carry
        prob = prob0._replace(x0=x, us_init=us_warm)
        sol = solver(prob)
        u0 = sol.us[0]
        x_new = plant_step(x, u0, ext_wrench)
        us_next = jnp.concatenate([sol.us[1:], sol.us[-1:]], axis=0)
        q = x_new[qi:qi + 4]
        metrics = {
            "att_err": 1.0 - jnp.abs(jnp.sum(q * q_ref_end)),
            "cost": sol.stats.cost,
            "u_max": jnp.max(jnp.abs(u0)),
            "omega_max": jnp.max(jnp.abs(x_new[-3:])),
        }
        return (x_new, us_next), metrics

    carry0 = (prob0.x0, prob0.us_init)
    return step, carry0


def run_closed_loop(name: str, n_ticks: int = 100, opts: SolverOptions = None,
                    **scenario_kw):
    """Drive a branch scenario's receding-horizon loop; returns a summary."""
    step, carry = make_receding_step(name, opts=opts, **scenario_kw)
    step_jit = jax.jit(step)
    u_hi = 0.0
    m = None
    for _ in range(max(1, n_ticks)):
        carry, m = step_jit(carry)
        u_hi = max(u_hi, float(m["u_max"]))
    return {
        "final_att_err": float(m["att_err"]),
        "final_omega_max": float(m["omega_max"]),
        "max_input": u_hi,
        "ticks": n_ticks,
    }
