"""Hardware transport layer: unitree codecs, swap tables, force processing,
loopback bridge over the native UDP endpoint; robot description registry."""

import numpy as np
import pytest

from quaternion_mpc_tpu.runtime import unitree as ut
from quaternion_mpc_tpu.utils import config as cfg_mod


def test_swap_tables_are_involutions():
    sj = ut.SWAP_JOINT_INDICES
    sf = ut.SWAP_FOOT_INDICES
    np.testing.assert_array_equal(sj[sj], np.arange(12))
    np.testing.assert_array_equal(sf[sf], np.arange(4))


def test_low_cmd_roundtrip_with_swap():
    cmd = ut.LowCmd()
    for i, m in enumerate(cmd.motor_cmd):
        m.q = 0.1 * i
        m.tau = -0.5 * i
        m.Kp = 20.0
        m.Kd = 1.5
    wire = ut.pack_low_cmd(cmd)
    back = ut.unpack_low_cmd(wire)
    for a, b in zip(cmd.motor_cmd, back.motor_cmd):
        assert abs(a.q - b.q) < 1e-6 and abs(a.tau - b.tau) < 1e-6


def test_low_state_roundtrip_and_leg_order():
    st = ut.LowState()
    st.quaternion = np.array([0.9, 0.1, 0.2, 0.3])
    st.foot_force = np.array([10.0, 20.0, 30.0, 40.0])  # FL, FR, RL, RR
    for i, m in enumerate(st.motor_state):
        m.q = 0.05 * i
    wire = ut.pack_low_state(st)
    # on the wire, foot order is unitree (FR, FL, RR, RL)
    back = ut.unpack_low_state(wire)
    np.testing.assert_allclose(back.foot_force, st.foot_force)
    np.testing.assert_allclose(
        [m.q for m in back.motor_state], [m.q for m in st.motor_state], atol=1e-6
    )


def test_safety_clamps():
    cmd = ut.LowCmd()
    cmd.motor_cmd[1].q = 99.0       # thigh
    cmd.motor_cmd[2].tau = -999.0   # calf
    ut.apply_safety(cmd)
    assert cmd.motor_cmd[1].q == pytest.approx(4.501)
    assert cmd.motor_cmd[2].tau == pytest.approx(-35.55)


def test_foot_force_bias_and_filter():
    proc = ut.FootForceProcessor(bias_samples=5, window=4)
    for _ in range(5):
        out = proc.update(np.full(4, 7.0))
        np.testing.assert_allclose(out, 0.0)  # bias capture phase
    out = proc.update(np.full(4, 17.0))
    np.testing.assert_allclose(out, 10.0)     # bias removed
    out = proc.update(np.full(4, 7.0))
    np.testing.assert_allclose(out, 5.0)      # windowed average of {10, 0}


def test_hardware_link_loopback():
    a = ut.HardwareLink(peer_ip="127.0.0.1", peer_port=0, bind_port=0)
    b = ut.HardwareLink(peer_ip="127.0.0.1", peer_port=a.local_port, bind_port=0)
    # point a at b now that b's port exists
    a2 = ut.HardwareLink(peer_ip="127.0.0.1", peer_port=b.local_port,
                         bind_port=0)
    cmd = ut.LowCmd()
    cmd.motor_cmd[0].q = 0.42
    n = b.send_cmd(cmd)  # b -> a? b's peer is a.local_port
    assert n > 0
    import time
    time.sleep(0.05)
    data = a._udp.recv()
    assert data is not None
    back = ut.unpack_low_cmd(data)
    assert back.motor_cmd[0].q == pytest.approx(0.42)


def test_robot_descriptions_registry():
    regs = cfg_mod.robot_descriptions()
    assert set(regs) == {"go1", "a1", "aliengo", "aliengoZ1", "b1", "laikago"}
    go1 = regs["go1"].rho_fix()
    # matches kin.leg.GO1_RHO_FIX signs/legs ordering
    from quaternion_mpc_tpu.kin.leg import GO1_RHO_FIX

    np.testing.assert_allclose(go1[:, :2], GO1_RHO_FIX[:, :2], atol=1e-6)
    np.testing.assert_allclose(np.sign(go1[:, 2]), np.sign(GO1_RHO_FIX[:, 2]))
    assert regs["b1"].trunk_mass > regs["a1"].trunk_mass


def test_hardware_convex_preset():
    cfg = cfg_mod.hardware_go1_convex_mpc()
    assert cfg.mpc.horizon == 30 and cfg.mpc.update_period_ms == 8.0
    assert cfg.mpc.fz_max == 500.0 and cfg.estimator.kf_type == 1
