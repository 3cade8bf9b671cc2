"""Stand-up state machine + multi-host scaling harness (virtual CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from quaternion_mpc_tpu.control import standup
from quaternion_mpc_tpu.parallel import distributed
from quaternion_mpc_tpu.sim import plant


def test_standup_ramp_reaches_pose():
    q0 = jnp.asarray(np.full(12, 0.3), jnp.float32)
    st = standup.init_standup(q0)
    dt = 0.01
    done = jnp.asarray(False)
    for _ in range(250):  # 2.5 s > 2 s ramp
        st, q_tgt, done = standup.standup_targets(st, dt)
    assert bool(done)
    np.testing.assert_allclose(
        np.asarray(q_tgt), np.asarray(standup.STAND_POSE), atol=1e-5
    )
    # midway the target is strictly between start and stand pose
    st2 = standup.init_standup(q0)
    st2, q_mid, _ = standup.standup_targets(st2, 1.0)  # 50% phase
    assert 0.3 < float(q_mid[1]) < 0.84


def test_servo_torques_sign():
    q = jnp.zeros(12)
    tau = standup.servo_torques(jnp.ones(12), q, jnp.zeros(12))
    assert float(tau[0]) > 0  # pulls toward target


def test_reset_pose_teleports_and_zeros_rates():
    ps = plant.init_state(height=0.1)
    ps = ps._replace(vel=jnp.ones(3), omega=jnp.ones(3))
    out = standup.reset_pose(ps, pos=[0, 0, 0.3], quat=[2.0, 0, 0, 0])
    np.testing.assert_allclose(np.asarray(out.pos), [0, 0, 0.3])
    np.testing.assert_allclose(np.asarray(out.quat), [1, 0, 0, 0])
    np.testing.assert_allclose(np.asarray(out.vel), 0.0)


def test_init_single_process_noop():
    info = distributed.init()
    assert info["process_count"] == 1
    assert info["global_devices"] >= 1


def test_scaling_report_on_virtual_mesh():
    """Weak scaling on the 8-device CPU mesh with a toy step."""

    def make_step():
        def step(carry, inp):
            # enough flops to not be pure overhead
            x = carry
            for _ in range(4):
                x = jnp.tanh(x @ jnp.eye(16, dtype=x.dtype) + inp)
            return x, jnp.sum(x)

        return step

    def make_batch(B):
        carry = jnp.ones((B, 16, 16), jnp.float32)
        inp = 0.1 * jnp.ones((B, 16, 16), jnp.float32)
        return carry, inp

    rep = distributed.scaling_report(
        make_step, make_batch, device_counts=(1, 2, 4), per_device_batch=32, iters=2
    )
    assert set(rep) == {1, 2, 4}
    for n, row in rep.items():
        assert row["steps_per_sec"] > 0
        assert row["efficiency"] > 0.1
