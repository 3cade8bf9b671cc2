"""High-level bridge + teleop (unitree_legged_real parity).

The reference bridges BOTH protocol levels over UDP (``ros_udp.cpp:13-50``,
ports 8090/8091) and ships velocity-twist and keyboard teleop examples
(``twist_sub.cpp:74-101``, ``control_via_keyboard.cpp``) that fill a HighCmd
with mode / velocity / yawSpeed. Here the low-level leg already exists
(`runtime.unitree` LowCmd/LowState + `hardware_loop.HardwareLink`); this
module adds the high-level leg:

- `twist_to_high_cmd` — the Twist→HighCmd mapping of twist_sub.cpp;
- `KEYBOARD_TWISTS` / `key_to_high_cmd` — the keyboard teleop map
  (control_via_keyboard role: w/s surge, a/d strafe, q/e yaw, space stop);
- `HighLevelBridge` — the stateful adapter between the HighCmd mode model
  (absolute: 0 idle / 1 stand / 2 walk) and the loop's EDGE-toggled
  joystick machine (`goals.joy_mode_update`: A toggles stand↔walk, B
  toggles the default-pose servo): it tracks the loop's current mode and
  synthesizes exactly the button edges that move it toward the commanded
  mode, while mapping velocity/yaw/height commands through; and the
  reverse direction, building a `unitree.HighState` from the loop's
  estimates each tick;
- `HighUdpServer` — serves the bridge over a real UDP socket
  (`native.UdpLink`): HighCmd datagrams in, HighState datagrams out.
"""

from __future__ import annotations

import threading
import time
from typing import Optional

import jax.numpy as jnp
import numpy as np

from quaternion_mpc_tpu.control import goals
from quaternion_mpc_tpu.runtime import native, unitree


def twist_to_high_cmd(
    vx: float = 0.0, vy: float = 0.0, wz: float = 0.0,
    body_height: float = 0.3, tick: int = 0,
) -> unitree.HighCmd:
    """geometry_msgs/Twist → HighCmd (twist_sub.cpp:74-90: linear.x →
    velocity[0], linear.y → velocity[1], angular.z → yawSpeed, mode=2)."""
    return unitree.HighCmd(
        mode=unitree.HIGH_MODE_WALK,
        velocity=np.array([vx, vy], np.float32),
        yaw_speed=float(wz),
        body_height=float(body_height),
        tick=tick,
    )


# keyboard teleop map (control_via_keyboard role): key -> (vx, vy, wz)
KEYBOARD_TWISTS = {
    "w": (0.3, 0.0, 0.0),
    "s": (-0.3, 0.0, 0.0),
    "a": (0.0, 0.3, 0.0),
    "d": (0.0, -0.3, 0.0),
    "q": (0.0, 0.0, 0.5),
    "e": (0.0, 0.0, -0.5),
    " ": (0.0, 0.0, 0.0),
}


def key_to_high_cmd(key: str, body_height: float = 0.3,
                    tick: int = 0) -> unitree.HighCmd:
    vx, vy, wz = KEYBOARD_TWISTS.get(key, (0.0, 0.0, 0.0))
    cmd = twist_to_high_cmd(vx, vy, wz, body_height, tick)
    if key == " ":
        cmd.mode = unitree.HIGH_MODE_STAND
    return cmd


class HighLevelBridge:
    """HighCmd (absolute mode) ↔ the loop's edge-toggled joystick machine.

    `joy_from_high(cmd)` returns the `goals.JoySample` for THIS control
    tick: velocity axes pass through; a mode mismatch between the command
    and the tracked loop mode emits one A/B button edge per tick until the
    loop catches up (mirroring what a human operator does with the
    physical buttons). Height commands integrate through the velz axis.

    `high_state_from(...)` builds the upstream HighState from loop
    estimates (ros_udp's state direction)."""

    def __init__(self, dtype=jnp.float32, mpc_rate: float = 50.0,
                 prime_s: float = 0.6):
        self._dtype = dtype
        self._mpc_rate = mpc_rate
        self._prime_ticks = max(1, int(round(prime_s * mpc_rate)))
        self._prime_left = 0
        self._loop_mode = unitree.HIGH_MODE_IDLE  # what the LOOP is doing
        self.last_cmd = unitree.HighCmd()

    @property
    def loop_mode(self) -> int:
        return self._loop_mode

    def joy_from_high(self, cmd: Optional[unitree.HighCmd]) -> goals.JoySample:
        if cmd is not None:
            self.last_cmd = cmd
        cmd = self.last_cmd
        dtype = self._dtype
        joy = goals.neutral_joy_sample(dtype)

        # idle → stand is a two-press sequence like the human operator's:
        # B engages the default-pose/stand-up servo, the estimator primes
        # for prime_s, a second B hands over to MPC standing balance
        if self._prime_left > 0:
            self._prime_left -= 1
            if self._prime_left == 0:
                joy = joy._replace(default_pos=jnp.asarray(True))
                self._loop_mode = unitree.HIGH_MODE_STAND
            return joy

        want = cmd.mode
        have = self._loop_mode
        if want != have:
            if have == unitree.HIGH_MODE_IDLE and want != unitree.HIGH_MODE_IDLE:
                joy = joy._replace(default_pos=jnp.asarray(True))
                self._prime_left = self._prime_ticks
                return joy
            if have == unitree.HIGH_MODE_STAND and want == unitree.HIGH_MODE_WALK:
                joy = joy._replace(mode_switch=jnp.asarray(True))
                self._loop_mode = unitree.HIGH_MODE_WALK
            elif have == unitree.HIGH_MODE_WALK and want != unitree.HIGH_MODE_WALK:
                joy = joy._replace(mode_switch=jnp.asarray(True))
                self._loop_mode = unitree.HIGH_MODE_STAND

        if self._loop_mode == unitree.HIGH_MODE_WALK:
            joy = joy._replace(
                velx=jnp.asarray(float(cmd.velocity[0]), dtype),
                vely=jnp.asarray(float(cmd.velocity[1]), dtype),
                yaw_rate=jnp.asarray(float(cmd.yaw_speed), dtype),
            )
        return joy

    def high_state_from(self, pos, vel, quat, gyro, foot_force,
                        foot_pos_body, movement_mode: int,
                        tick: int = 0) -> unitree.HighState:
        pos = np.asarray(pos, np.float32)
        vel = np.asarray(vel, np.float32)
        return unitree.HighState(
            mode=(unitree.HIGH_MODE_WALK if movement_mode == 1
                  else self._loop_mode),
            position=pos,
            body_height=float(pos[2]),
            velocity=vel,
            yaw_speed=float(np.asarray(gyro)[2]),
            quaternion=np.asarray(quat, np.float32),
            gyroscope=np.asarray(gyro, np.float32),
            foot_force=np.asarray(foot_force, np.float32),
            foot_position_body=np.asarray(foot_pos_body, np.float32),
            tick=tick,
        )


class HighUdpServer(threading.Thread):
    """Serve the high-level bridge over a real UDP socket: unpacks HighCmd
    datagrams into the bridge's command slot; `publish` sends a HighState
    back to the teleop peer (the 8090-port direction of ros_udp.cpp)."""

    def __init__(self, bridge: HighLevelBridge):
        super().__init__(daemon=True)
        self.bridge = bridge
        self.udp = native.UdpLink()  # learns the peer from its first datagram
        self._stop = threading.Event()
        self.cmds_received = 0

    @property
    def local_port(self) -> int:
        return self.udp.local_port

    def stop(self):
        self._stop.set()

    def run(self):
        while not self._stop.is_set():
            data = self.udp.recv(2048)
            if data is None:
                time.sleep(0.0005)
                continue
            try:
                cmd = unitree.unpack_high_cmd(data)
            except ValueError:
                continue
            self.bridge.last_cmd = cmd
            self.cmds_received += 1

    def publish(self, state: unitree.HighState) -> None:
        self.udp.send(unitree.pack_high_state(state))
