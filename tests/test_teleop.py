"""High-level bridge + teleop parity (unitree_legged_real):
HighCmd/HighState codec round-trips, the Twist/keyboard teleop maps
(twist_sub.cpp / control_via_keyboard roles), the HighCmd-mode ↔
edge-toggled-joystick bridge, and a full teleop smoke driving the threaded
UDP loopback walk through HighCmd datagrams only."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from quaternion_mpc_tpu.control import goals
from quaternion_mpc_tpu.runtime import hardware_loop as hw
from quaternion_mpc_tpu.runtime import native, teleop, unitree


def test_high_cmd_round_trip():
    cmd = unitree.HighCmd(
        mode=unitree.HIGH_MODE_WALK, gait_type=1, body_height=0.31,
        foot_raise_height=0.09, position=np.array([1.5, -0.5]),
        euler=np.array([0.01, -0.02, 0.3]), velocity=np.array([0.4, -0.1]),
        yaw_speed=0.25, tick=1234,
    )
    out = unitree.unpack_high_cmd(unitree.pack_high_cmd(cmd))
    assert out.mode == cmd.mode and out.gait_type == cmd.gait_type
    assert out.tick == 1234
    np.testing.assert_allclose(out.velocity, cmd.velocity, rtol=1e-6)
    np.testing.assert_allclose(out.euler, cmd.euler, rtol=1e-6)
    np.testing.assert_allclose(out.body_height, cmd.body_height, rtol=1e-6)
    np.testing.assert_allclose(out.yaw_speed, cmd.yaw_speed, rtol=1e-6)


def test_high_state_round_trip():
    st = unitree.HighState(
        mode=2, progress=0.5, gait_type=1,
        position=np.array([0.7, 0.1, 0.29]), body_height=0.29,
        velocity=np.array([0.3, 0.0, 0.01]), yaw_speed=-0.1,
        quaternion=np.array([0.99, 0.01, 0.02, 0.1]),
        gyroscope=np.array([0.0, 0.1, -0.1]),
        foot_force=np.array([30.0, 45.0, 50.0, 25.0]),
        foot_position_body=np.arange(12).reshape(4, 3) * 0.02,
        tick=77,
    )
    out = unitree.unpack_high_state(unitree.pack_high_state(st))
    assert out.mode == 2 and out.tick == 77
    np.testing.assert_allclose(out.position, st.position, rtol=1e-6)
    np.testing.assert_allclose(out.foot_position_body, st.foot_position_body,
                               rtol=1e-6)
    np.testing.assert_allclose(out.foot_force, st.foot_force, rtol=1e-6)


def test_twist_and_keyboard_maps():
    cmd = teleop.twist_to_high_cmd(0.4, -0.1, 0.2)
    assert cmd.mode == unitree.HIGH_MODE_WALK
    np.testing.assert_allclose(cmd.velocity, [0.4, -0.1], rtol=1e-6)
    assert abs(cmd.yaw_speed - 0.2) < 1e-6
    fwd = teleop.key_to_high_cmd("w")
    assert fwd.velocity[0] > 0 and fwd.mode == unitree.HIGH_MODE_WALK
    stop = teleop.key_to_high_cmd(" ")
    assert stop.mode == unitree.HIGH_MODE_STAND
    assert np.all(stop.velocity == 0.0)


def test_bridge_mode_edges_drive_joy_machine():
    """The bridge's synthesized button edges must actually move the loop's
    joystick mode machine: idle -> (B, prime, B) -> MPC stand -> (A) ->
    walk with velocity passthrough -> (A) -> stand."""
    bridge = teleop.HighLevelBridge(mpc_rate=50.0, prime_s=0.1)  # 5-tick prime
    mode = goals.init_mode_state(0.3, jnp.float32)
    dt = 0.02

    def tick(cmd):
        joy = bridge.joy_from_high(cmd)
        nonlocal mode
        mode, joycmd, movement = goals.joy_mode_update(mode, joy, dt)
        return joy, joycmd, int(movement)

    # command STAND from idle: B edge, default-pose engages
    joy, _, _ = tick(unitree.HighCmd(mode=unitree.HIGH_MODE_STAND))
    assert bool(joy.default_pos)
    assert bool(mode.set_default_pos)
    # prime window: neutral joys, servo keeps holding
    for _ in range(4):
        joy, _, _ = tick(None)
        assert not bool(joy.default_pos) and not bool(joy.mode_switch)
    # prime over: second B hands over to MPC standing
    joy, _, movement = tick(None)
    assert bool(joy.default_pos)
    assert not bool(mode.set_default_pos)
    assert bridge.loop_mode == unitree.HIGH_MODE_STAND

    # command WALK: one A edge + velocity passthrough
    joy, joycmd, movement = tick(teleop.twist_to_high_cmd(0.35, 0.0, 0.1))
    assert bool(joy.mode_switch)
    assert movement == 1
    assert abs(float(joy.velx) - 0.35) < 1e-6
    # steady walking: no more edges, velocity still mapped
    joy, _, movement = tick(None)
    assert not bool(joy.mode_switch) and movement == 1
    assert abs(float(joy.velx) - 0.35) < 1e-6

    # command STAND: one A edge back, velocity zeroed
    joy, _, movement = tick(unitree.HighCmd(mode=unitree.HIGH_MODE_STAND))
    assert bool(joy.mode_switch)
    assert movement == 0
    joy, _, _ = tick(None)
    assert float(joy.velx) == 0.0


def _teleop_loopback_once():
    from quaternion_mpc_tpu.kin import leg as leg_mod

    bridge = teleop.HighLevelBridge(mpc_rate=50.0, prime_s=0.6)
    server = teleop.HighUdpServer(bridge)
    server.start()
    client = native.UdpLink("127.0.0.1", server.local_port)
    # server learns the client address from this first datagram
    client.send(unitree.pack_high_cmd(
        unitree.HighCmd(mode=unitree.HIGH_MODE_STAND, tick=0)))
    t0 = time.time()
    while server.cmds_received == 0 and time.time() - t0 < 2.0:
        time.sleep(0.005)
    assert server.cmds_received > 0, "bridge never received the teleop cmd"

    rho = leg_mod.go1_rho_fix(jnp.float32)
    # jitted once: an EAGER fk call dispatches ~30 ops per tick and the
    # sink's latency then overruns the 50 Hz RateLoop by itself
    fk_jit = jax.jit(leg_mod.fk)
    fk_jit(jnp.zeros((4, 3)), rho)  # warm the compile outside the loop
    states = []

    schedule = {
        60: teleop.twist_to_high_cmd(0.3, 0.0, 0.0, tick=1),
        120: unitree.HighCmd(mode=unitree.HIGH_MODE_STAND, tick=2),
    }

    def joy_provider(k, scripted):
        cmd = schedule.get(k)
        if cmd is not None:
            client.send(unitree.pack_high_cmd(cmd))
            time.sleep(0.01)  # let the server thread ingest it
        return bridge.joy_from_high(None)

    def state_sink(k, info, sensors):
        foot_body = fk_jit(sensors.q.reshape(4, 3), rho)
        st = bridge.high_state_from(
            info["est_pos"], info["est_vel"], sensors.quat, sensors.gyro,
            sensors.foot_force, foot_body,
            int(info["movement_mode"]), tick=k,
        )
        server.publish(st)
        states.append((k, np.asarray(info["est_pos"]).copy(),
                       int(info["movement_mode"])))

    s = hw.run_hardware_loopback(
        duration_s=2.8, prime_s=0.6, walk_s=0.0, est_rate=150.0,
        joy_provider=joy_provider, state_sink=state_sink,
    )
    server.stop()

    # client received HighState datagrams back over the wire
    got = 0
    while True:
        data = client.recv(2048)
        if data is None:
            break
        st = unitree.unpack_high_state(data)
        got += 1
    assert got > 10, f"client only saw {got} HighState frames"

    # MECHANISM asserts (every attempt): the twist engaged walk mode, the
    # STAND command disengaged it, and the bridge tracked the loop
    pos_by_k = {k: p for k, p, _ in states}
    modes = {k: m for k, _, m in states}
    assert any(m == 1 for m in modes.values()), "walk mode never engaged"
    last_k = max(pos_by_k)
    assert modes[last_k] == 0, "loop still walking after STAND command"
    assert bridge.loop_mode == unitree.HIGH_MODE_STAND
    assert s["three_tier"] and s["est_updates"] > 0

    x_walk = pos_by_k[70][0] if 70 in pos_by_k else 0.0
    k_stop = max(k for k in pos_by_k if k <= 121)
    x_end = pos_by_k[k_stop][0]
    return float(x_end - x_walk)


def test_teleop_drives_loopback_walk():
    """Full teleop smoke over REAL UDP: a teleop client sends HighCmd
    datagrams (stand -> forward twist -> stand) into HighUdpServer; the
    bridge synthesizes the operator's button edges for the threaded
    loopback loop; HighState frames stream back to the client. The
    MECHANISM (codec -> bridge -> mode machine -> HighState stream) is
    asserted on every attempt; walk PROGRESS gets two attempts — the
    50 Hz trot's thin margin under OS scheduling nondeterminism is a
    documented property of this loop (test_threaded_loopback_walk_phase),
    not of the bridge under test."""
    progress = _teleop_loopback_once()
    if progress <= 0.1:
        progress = _teleop_loopback_once()
    assert progress > 0.1, f"teleop walk advanced only {progress:.3f} m"
