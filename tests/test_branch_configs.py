"""The reference's non-main branch configs as *data* (SURVEY.md branch note:
falling_cat / spider_dog / humanoid share the solver core and differ only in
contact geometry, schedule, and references — README.md:20-25).

- falling_cat: contact-free large-angle attitude reorientation (the
  singularity-free selling point of the quaternion formulation);
- humanoid: biped balance = the same quat SRB with 2 contact feet;
- spider_dog: chimney brace with horizontal contact normals (rotated
  friction cones)."""

import jax
import jax.numpy as jnp
import numpy as np

from quaternion_mpc_tpu.control.quat_mpc import cone_matrix_with_normal
from quaternion_mpc_tpu.models import attitude, srb
from quaternion_mpc_tpu.ops import lie
from quaternion_mpc_tpu.solver import (
    CostSpec,
    ModelSpec,
    SolverOptions,
    TrajOptProblem,
    make_solver,
)


def test_falling_cat_large_angle_reorientation():
    """Airborne attitude: reorient from ~160° error to identity under torque
    limits. An Euler-angle controller would pass through a singularity; the
    quaternion error-state solver handles it in one solve."""
    n, m, N, h = 7, 3, 40, 0.02
    spec = ModelSpec(
        nx=n, nu=m, f=attitude.attitude_dynamics, quat_idx=0, integrator="midpoint"
    )
    params = attitude.go1_attitude_params()

    # initial attitude: 160° about a skew axis
    axis = jnp.array([1.0, 0.5, 0.2])
    axis = axis / jnp.linalg.norm(axis)
    angle = jnp.deg2rad(160.0)
    q0 = jnp.concatenate([jnp.cos(angle / 2)[None], jnp.sin(angle / 2) * axis])
    x0 = jnp.concatenate([q0, jnp.zeros(3)])

    x_goal = jnp.array([1.0, 0, 0, 0, 0, 0, 0.0])
    x_ref = jnp.tile(x_goal, (N + 1, 1))
    u_ref = jnp.zeros((N + 1, m))
    Cu, cb = attitude.torque_box(8.0)

    # per-knot geodesic weights (SetQuaternionCost is per-knot): strong
    # terminal pin so the optimum reaches the goal attitude
    w = jnp.full((N + 1,), 50.0).at[-1].set(10000.0)
    prob = TrajOptProblem(
        x0=x0,
        cost=CostSpec(
            Qd=jnp.array([0.0, 0, 0, 0, 1.0, 1.0, 1.0]),
            Rd=1e-3 * jnp.ones(m),
            w=w,
            x_ref=x_ref,
            u_ref=u_ref,
            Qdf=jnp.array([0.0, 0, 0, 0, 10.0, 10.0, 10.0]),
        ),
        Cu=Cu,
        cb=cb,
        h=jnp.asarray(h),
        params=params,
        us_init=jnp.zeros((N, m)),
    )
    sol = jax.jit(
        make_solver(spec, SolverOptions(al_iterations=3, ilqr_iterations=25))
    )(prob)
    qN = sol.xs[-1, 0:4]
    geodesic = 1.0 - abs(float(jnp.sum(qN * x_goal[0:4])))
    assert geodesic < 1e-3, f"final attitude error {geodesic}"
    # torque limits respected along the whole trajectory
    assert float(jnp.max(jnp.abs(sol.us))) <= 8.0 + 1e-4
    # quaternion stays normalized through the rollout (midpoint drift is tiny)
    norms = jnp.linalg.norm(sol.xs[:, 0:4], axis=-1)
    np.testing.assert_allclose(np.array(norms), 1.0, atol=5e-3)


def test_humanoid_biped_balance_solve():
    """MIT-humanoid-style biped stance: same quat SRB, 2 feet."""
    mass = 24.0
    inertia = np.diag([0.3, 0.25, 0.1])
    foot_pos = [[0.0, 0.12, -0.8], [0.0, -0.12, -0.8]]
    params = srb.go1_params(foot_pos=foot_pos, inertia_scale=1.0, mass=mass)
    params = params._replace(
        inertia=jnp.asarray(inertia),
        com_offset=jnp.zeros(3),
        com_mass=jnp.asarray(0.0),
    )
    spec = ModelSpec(
        nx=13, nu=6, f=srb.quat_srb_dynamics, fj=srb.quat_srb_jacobian, quat_idx=3
    )
    from tests.test_solver_fixtures import friction_pyramid

    Cu, cb = friction_pyramid(mu=0.6, fz_max=400.0, contacts=[1, 1], n_feet=2)
    N, h = 20, 0.02
    x_ref = jnp.tile(
        jnp.array([0.0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0.0]), (N + 1, 1)
    )
    u_ref = jnp.tile(jnp.array([0.0, 0, mass * 9.81 / 2] * 2), (N + 1, 1))
    # tilted + drifting start
    q0 = lie.euler_to_quat(jnp.array([0.1, -0.08, 0.0]))
    x0 = jnp.concatenate([jnp.zeros(3), q0, jnp.array([0.1, 0.0, 0.0]), jnp.zeros(3)])
    prob = TrajOptProblem(
        x0=x0,
        cost=CostSpec(
            Qd=jnp.array([2.5, 2.5, 10, 0, 0, 0, 0, 0.5, 0.5, 0.5, 0.2, 0.2, 0.2]),
            Rd=1e-6 * jnp.ones(6),
            w=jnp.asarray(50.0),
            x_ref=x_ref,
            u_ref=u_ref,
        ),
        Cu=Cu,
        cb=cb,
        h=jnp.asarray(h),
        params=params,
        us_init=u_ref[:N],
    )
    sol = jax.jit(make_solver(spec, SolverOptions()))(prob)
    # attitude recovered by end of horizon
    geodesic = 1.0 - abs(float(jnp.sum(sol.xs[-1, 3:7] * x_ref[0, 3:7])))
    assert geodesic < 2e-4
    assert float(sol.stats.constraint_violation) < 1e-6
    # biped: lateral (y) moment balance forces differ front/back of CoM? both
    # feet symmetric → near-equal vertical loads
    fz = np.array(sol.us[0]).reshape(2, 3)[:, 2]
    np.testing.assert_allclose(fz[0], fz[1], rtol=0.2)


def test_spider_dog_chimney_brace():
    """Chimney climb stance: 4 feet on two opposing walls (normals ∓ŷ),
    weight carried entirely by friction — infeasible with flat-ground cones,
    feasible with rotated cones."""
    mu = 0.7
    mass = 12.84
    # feet brace walls at y = ±0.2; normals point INTO the body (∓ŷ)
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
    cones = jax.vmap(lambda nrm: cone_matrix_with_normal(mu, nrm))(normals)  # (4,6,3)
    Cu = jax.scipy.linalg.block_diag(*[cones[i] for i in range(4)])
    cb = jnp.zeros((24,))
    cb = cb.at[4::6].set(-200.0)  # n·f ≤ 200 N press limit

    N, h = 15, 0.02
    press = 60.0  # feasible wall press force
    u0 = jnp.asarray(
        [
            [0.0, -press, mass * 9.81 / 4],
            [0.0, press, mass * 9.81 / 4],
            [0.0, -press, mass * 9.81 / 4],
            [0.0, press, mass * 9.81 / 4],
        ]
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
        Cu=Cu,
        cb=cb,
        h=jnp.asarray(h),
        params=params,
        us_init=jnp.tile(u0, (N, 1)),
    )
    sol = jax.jit(make_solver(spec, SolverOptions()))(prob)
    assert float(sol.stats.constraint_violation) < 1e-6
    f = np.array(sol.us[0]).reshape(4, 3)
    # total vertical force balances gravity via friction on the walls
    np.testing.assert_allclose(f[:, 2].sum(), mass * 9.81, rtol=1e-3)
    # wall presses are inward and each vertical force within its cone
    press_forces = -f[:, 1] * np.array([1, -1, 1, -1])  # n·f per foot
    assert (press_forces > 1.0).all()
    assert (np.abs(f[:, 2]) <= mu * press_forces + 1e-5).all()
    # the body does not drift over the horizon
    np.testing.assert_allclose(np.array(sol.xs[-1, 7:13]), 0.0, atol=1e-3)


# ---------------------------------------------------------------------------
# Closed-loop (receding-horizon) branch tiers — VERDICT r3 #6: the reference
# branches were closed-loop controllers, not single open-loop solves.
# ---------------------------------------------------------------------------


def test_falling_cat_closed_loop_reorients():
    """Receding-horizon attitude loop: re-solve from the current state each
    tick, apply u(0) to the airborne attitude plant, until the 160-degree
    reorientation completes under the 8 N*m torque box."""
    from quaternion_mpc_tpu import scenarios

    step, carry = scenarios.make_receding_step("falling_cat")
    step_jit = jax.jit(step)
    u_hi, errs = 0.0, []
    for _ in range(100):  # 2 s at h=20 ms
        carry, m = step_jit(carry)
        u_hi = max(u_hi, float(m["u_max"]))
        errs.append(float(m["att_err"]))
    assert errs[-1] < 1e-4, f"did not reorient (att_err {errs[-1]:.2e})"
    assert float(m["omega_max"]) < 0.05, "still tumbling at the end"
    assert u_hi <= 8.2, f"torque box violated ({u_hi:.2f} N*m)"
    # convergence is monotone-ish: halfway error well below start
    assert errs[50] < 0.05


def test_humanoid_closed_loop_balances_from_tilt():
    """Two-contact biped balance loop from a tilted, laterally-moving start:
    the receding-horizon loop brings the MIT-humanoid-mass SRB upright on
    the full plant (gyroscopic term included)."""
    from quaternion_mpc_tpu import scenarios

    step, carry = scenarios.make_receding_step("humanoid")
    step_jit = jax.jit(step)
    for _ in range(150):  # 3 s
        carry, m = step_jit(carry)
    x = carry[0]
    assert bool(jnp.all(jnp.isfinite(x)))
    assert float(m["att_err"]) < 1e-6, "did not level out"
    np.testing.assert_allclose(np.asarray(x[7:13]), 0.0, atol=0.02)  # at rest
    np.testing.assert_allclose(np.asarray(x[0:3]), 0.0, atol=0.05)   # near anchor


def test_spider_dog_closed_loop_brace_survives_push():
    """Chimney brace hold on the SRB plant (weight carried entirely by
    friction against vertical walls), perturbed mid-hold by a 3-tick
    lateral+vertical shove: the loop re-braces and returns to the anchor.
    Also asserts the wall physics: every foot presses INTO its wall and
    the stance carries the full weight through friction."""
    from quaternion_mpc_tpu import scenarios
    from quaternion_mpc_tpu.sim import plant as plant_mod

    step, carry = scenarios.make_receding_step("spider_dog")
    step_jit = jax.jit(step)
    dtype = carry[0].dtype
    push = plant_mod.ExtWrench(
        force_world=jnp.asarray([0.0, 30.0, -40.0], dtype),
        torque_body=jnp.asarray([1.0, 0.0, 0.0], dtype),
    )
    zero = plant_mod.zero_wrench(dtype)
    us_seen = []
    for k in range(160):
        ext = push if 40 <= k < 43 else zero
        carry, m = step_jit(carry, ext_wrench=ext)
        us_seen.append(np.asarray(carry[1][0]))
    x = carry[0]
    assert bool(jnp.all(jnp.isfinite(x)))
    # re-braced: back near the hover anchor, attitude level, at rest
    np.testing.assert_allclose(np.asarray(x[0:3]), 0.0, atol=0.03)
    assert float(m["att_err"]) < 1e-5
    np.testing.assert_allclose(np.asarray(x[7:13]), 0.0, atol=0.01)
    # wall physics at the final hold: normal components press into walls
    u_end = us_seen[-1].reshape(4, 3)
    wall_sign = np.array([-1.0, 1.0, -1.0, 1.0])  # feet at +y,-y,+y,-y walls
    press = u_end[:, 1] * wall_sign
    assert (press > 5.0).all(), f"feet not pressing into walls: {u_end[:, 1]}"
    # friction carries the weight: total vertical force ~ m*g
    np.testing.assert_allclose(u_end[:, 2].sum(), 12.84 * 9.81, rtol=0.05)
