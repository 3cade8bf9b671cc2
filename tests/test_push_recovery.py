"""Disturbance injection / push recovery (reference analog: the operator
push tool ``unitree_controller/src/external_force.cpp``, used to test
robustness by wrenching the trunk).

The push is a world-frame force applied at a point above the CoM (a
"shoulder shove"): force + the induced body torque, injected through
`sim.plant.ExtWrench` for a fixed window of control ticks. Tests quantify
the recovery envelope in impulse (N·s over the window) and assert both
sides of it: moderate pushes recover, a large one trips the safety kill.
"""

import jax
import jax.numpy as jnp
import numpy as np

from quaternion_mpc_tpu.control import quat_mpc
from quaternion_mpc_tpu.models import srb
from quaternion_mpc_tpu.runtime import step as rt
from quaternion_mpc_tpu.sim import plant as plant_mod
from quaternion_mpc_tpu.solver import SolverOptions
from quaternion_mpc_tpu.utils import config as cfg_mod

DTYPE = jnp.float64


def shoulder_wrench(force_y, lever_z=0.1, dtype=DTYPE):
    """Lateral push at a point ``lever_z`` above the CoM: world force plus
    the induced body torque r x F."""
    f = np.array([0.0, float(force_y), 0.0])
    tq = np.cross(np.array([0.0, 0.0, float(lever_z)]), f)
    return plant_mod.ExtWrench(jnp.asarray(f, dtype), jnp.asarray(tq, dtype))


def windowed(ext_on, t, t0, nticks, dtype=DTYPE):
    on = (t >= t0) & (t < t0 + nticks)
    off = plant_mod.zero_wrench(dtype)
    return jax.tree.map(lambda a, b: jnp.where(on, a, b), ext_on, off)


def test_standing_impulse_recovery_envelope():
    """Standing balance survives shoulder-push impulses up to ~7.5 N*s over
    50 ms and is killed by 20 N*s — both sides asserted so the envelope is a
    measured number, not an assumption."""
    wts = quat_mpc.weights_from_config(cfg_mod.gazebo_go1_quat_mpc(), dtype=DTYPE)
    carry0, sp = rt.init_scenario(wts, srb.go1_params().foot_pos, dtype=DTYPE)
    joy = rt.neutral_joy(DTYPE)
    step = rt.make_standing_step(
        horizon=10, opts=SolverOptions(al_iterations=2, ilqr_iterations=4)
    )
    push_ticks = 5  # 50 ms at h=10 ms

    @jax.jit
    def sim(c, ext_on):
        def body(cc, t):
            return step(cc, sp, joy,
                        ext_wrench=windowed(ext_on, t, 0, push_ticks))
        # the push excites a slow (~3 s period) position-restoring swing;
        # full settling takes ~4.5 s of sim time
        return jax.lax.scan(body, c, jnp.arange(450))

    def recovered(force_n):
        c, ms = sim(carry0, shoulder_wrench(force_n))
        settled = (
            bool(c.alive)
            and float(ms.height_err[-1]) < 0.01
            and float(ms.att_err[-1]) < 1e-2
            and float(jnp.max(jnp.abs(c.plant.vel))) < 0.05
        )
        return settled

    # impulse grid: force N over 50 ms -> N*s
    assert recovered(50.0)        # 2.5 N*s
    assert recovered(150.0)       # 7.5 N*s  <- measured envelope
    assert not recovered(400.0)   # 20 N*s: roll-rate safety kill
    # quantified envelope for the record: >= 7.5 N*s survived
    envelope_ns = 150.0 * push_ticks * float(sp.wts.h)
    assert envelope_ns >= 7.5


def test_trot_push_recovery():
    """A lateral 8 N*s shove mid-trot (80 N for 100 ms at tick 40) is
    absorbed: the walk survives and velocity tracking recovers."""
    wts = quat_mpc.weights_from_config(cfg_mod.gazebo_go1_quat_mpc(), dtype=DTYPE)
    carry0, sp = rt.init_walking_scenario(wts, dtype=DTYPE)
    step = rt.make_walking_step(horizon=10)
    joy = rt.neutral_joy(DTYPE)._replace(velx=jnp.asarray(0.4, DTYPE))
    ext_on = shoulder_wrench(80.0)

    @jax.jit
    def sim(c):
        def body(cc, t):
            return step(cc, sp, joy, ext_wrench=windowed(ext_on, t, 40, 10))
        return jax.lax.scan(body, c, jnp.arange(130))

    c, ms = sim(carry0)
    assert bool(c.alive)
    # the push visibly perturbs (peak vel error during/after the window) ...
    assert float(jnp.max(ms.vel_err[40:60])) > 0.05
    # ... and tracking recovers afterwards
    assert float(ms.vel_err[-1]) < 0.15
    assert float(ms.height_err[-1]) < 0.02


def test_fleet_random_push_sweep_masks_failures():
    """Per-scenario random pushes on the walking FLEET: moderate pushes all
    survive; one deliberately hopeless shove (400 N for 100 ms = 40 N*s)
    dies and is masked without poisoning the others."""
    B = 6
    wts = quat_mpc.weights_from_config(cfg_mod.gazebo_go1_quat_mpc(), dtype=DTYPE)
    carry1, sp1 = rt.init_walking_scenario(wts, dtype=DTYPE, warm_start=False)
    joy1 = rt.neutral_joy(DTYPE)._replace(velx=jnp.asarray(0.3, DTYPE))
    tile = lambda t: jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), t
    )
    carry, sp, joy = tile(carry1), tile(sp1), tile(joy1)

    # per-scenario lateral push forces: 5 moderate (random in +-60 N), 1 hopeless
    rng = np.random.default_rng(0)
    forces = np.concatenate([rng.uniform(-60.0, 60.0, size=5), [400.0]])
    exts = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[shoulder_wrench(f) for f in forces]
    )

    fleet_step = rt.make_fleet_walking_step(horizon=10)

    @jax.jit
    def sim(c):
        def body(cc, t):
            ext = jax.tree.map(
                lambda on: jnp.where((t >= 40) & (t < 50), on, 0.0), exts
            )
            return fleet_step(cc, sp, joy, ext_wrench=ext)
        return jax.lax.scan(body, c, jnp.arange(110))

    c, ms = sim(carry)
    alive = np.asarray(c.alive)
    assert alive[:5].all(), f"moderate pushes should survive, got {alive}"
    assert not alive[5], "40 N*s shove should trip the safety mask"
    # masked scenario froze at its last healthy state: all finite
    assert np.all(np.isfinite(np.asarray(c.plant.pos)))
    # survivors keep tracking
    assert float(np.max(np.asarray(ms.vel_err)[-1, :5])) < 0.2


def test_actuated_stand_push_on_articulated_plant():
    """Push injection reaches the joint-level plant too: a 2.5 N*s shove on
    the articulated stand (stance trot-with-stand pattern at zero velocity)
    is absorbed through the torque layer."""
    from quaternion_mpc_tpu.gait import schedule as sched_mod

    wts = quat_mpc.weights_from_config(cfg_mod.gazebo_go1_quat_mpc(), dtype=DTYPE)
    carry0, sp = rt.init_actuated_scenario(
        wts, dtype=DTYPE, pattern=sched_mod.stand_pattern()
    )
    step = rt.make_actuated_walking_step(
        horizon=10, pattern=sched_mod.stand_pattern(), n_sub=80
    )
    joy = rt.neutral_joy(DTYPE)
    ext_on = shoulder_wrench(50.0)

    @jax.jit
    def sim(c):
        def body(cc, t):
            return step(cc, sp, joy, ext_wrench=windowed(ext_on, t, 10, 5))
        return jax.lax.scan(body, c, jnp.arange(60))

    c, ms = sim(carry0)
    assert bool(c.alive)
    assert float(ms.height_err[-1]) < 0.03
