"""Unitree low-level wire protocol: message codecs, index remapping, safety.

Role parity with the reference's hardware transport stack:
- message structs (``unitree_legged_msgs/msg/{MotorCmd,MotorState,LowCmd,
  LowState}.msg`` — mode/q/dq/tau/Kp/Kd per motor, IMU + 20 motors + 4 foot
  forces per state frame);
- the FL↔FR index remap between the controller's leg order (FL, FR, RL, RR)
  and Unitree's (FR, FL, RR, RL) — ``HardwareInterface.cpp:28-29``:
  swap_joint = [3,4,5,0,1,2,9,10,11,6,7,8], swap_foot = [1,0,3,2];
- foot-force bias capture + windowed filtering (``:32,139-152``);
- PositionLimit/PowerProtect-style clamping before send (``:93-94``).

The wire format here is the framework's own little-endian layout (the real
Unitree SDK's binary is proprietary and linked from a vendored .a in the
reference); framing is explicit and versioned so the C++ runtime
(native/qmpc_runtime.cpp UdpLink) and Python agree byte-for-byte.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

NUM_DOF = 12
NUM_LEG = 4
FOOT_FILTER_WINDOW = 40  # HardwareInterface.cpp:32

# controller (FL,FR,RL,RR) <-> unitree (FR,FL,RR,RL) index maps
SWAP_JOINT_INDICES = np.array([3, 4, 5, 0, 1, 2, 9, 10, 11, 6, 7, 8])
SWAP_FOOT_INDICES = np.array([1, 0, 3, 2])

# Go1 joint position limits (hip, thigh, calf) and torque ceiling — the
# Safety::PositionLimit / PowerProtect role (HardwareInterface.cpp:93-94)
JOINT_POS_MIN = np.tile([-0.863, -0.686, -2.818], NUM_LEG)
JOINT_POS_MAX = np.tile([0.863, 4.501, -0.888], NUM_LEG)
TAU_MAX = np.tile([23.7, 23.7, 35.55], NUM_LEG)

_MAGIC = 0x51C0
_VERSION = 1

# per-motor cmd: mode(u8) q dq tau Kp Kd (5 f32)
_MOTOR_CMD_FMT = "<B5f"
# per-motor state: mode(u8) q dq ddq tauEst (4 f32)
_MOTOR_STATE_FMT = "<B4f"
# header: magic(u16) version(u8) kind(u8) tick(u32)
_HDR_FMT = "<HBBI"
KIND_LOW_CMD = 1
KIND_LOW_STATE = 2


@dataclass
class MotorCmd:
    mode: int = 0x0A  # servo mode
    q: float = 0.0
    dq: float = 0.0
    tau: float = 0.0
    Kp: float = 0.0
    Kd: float = 0.0


@dataclass
class MotorState:
    mode: int = 0
    q: float = 0.0
    dq: float = 0.0
    ddq: float = 0.0
    tauEst: float = 0.0


@dataclass
class LowCmd:
    """12 motor commands, controller leg order."""

    motor_cmd: List[MotorCmd] = field(
        default_factory=lambda: [MotorCmd() for _ in range(NUM_DOF)]
    )
    tick: int = 0


@dataclass
class LowState:
    """IMU + 12 motors + 4 foot forces, controller leg order."""

    quaternion: np.ndarray = field(default_factory=lambda: np.array([1.0, 0, 0, 0]))
    gyroscope: np.ndarray = field(default_factory=lambda: np.zeros(3))
    accelerometer: np.ndarray = field(default_factory=lambda: np.zeros(3))
    motor_state: List[MotorState] = field(
        default_factory=lambda: [MotorState() for _ in range(NUM_DOF)]
    )
    foot_force: np.ndarray = field(default_factory=lambda: np.zeros(4))
    tick: int = 0


def apply_safety(cmd: LowCmd) -> LowCmd:
    """Clamp q targets to joint limits and tau to the torque ceiling
    (Safety::PositionLimit + PowerProtect role)."""
    for i, m in enumerate(cmd.motor_cmd):
        m.q = float(np.clip(m.q, JOINT_POS_MIN[i], JOINT_POS_MAX[i]))
        m.tau = float(np.clip(m.tau, -TAU_MAX[i], TAU_MAX[i]))
    return cmd


def pack_low_cmd(cmd: LowCmd, swap: bool = True) -> bytes:
    """Serialize; swap=True reorders into Unitree joint order on the wire
    (HardwareInterface.cpp:82-92)."""
    out = [struct.pack(_HDR_FMT, _MAGIC, _VERSION, KIND_LOW_CMD, cmd.tick)]
    order = SWAP_JOINT_INDICES if swap else np.arange(NUM_DOF)
    for i in range(NUM_DOF):
        m = cmd.motor_cmd[order[i]]
        out.append(struct.pack(_MOTOR_CMD_FMT, m.mode, m.q, m.dq, m.tau, m.Kp, m.Kd))
    return b"".join(out)


def unpack_low_cmd(data: bytes, swap: bool = True) -> LowCmd:
    magic, ver, kind, tick = struct.unpack_from(_HDR_FMT, data, 0)
    if magic != _MAGIC or kind != KIND_LOW_CMD:
        raise ValueError("not a LowCmd frame")
    sz = struct.calcsize(_MOTOR_CMD_FMT)
    ofs = struct.calcsize(_HDR_FMT)
    wire = []
    for i in range(NUM_DOF):
        vals = struct.unpack_from(_MOTOR_CMD_FMT, data, ofs + i * sz)
        wire.append(MotorCmd(*[int(vals[0])] + list(vals[1:])))
    cmd = LowCmd(tick=tick)
    order = SWAP_JOINT_INDICES if swap else np.arange(NUM_DOF)
    for i in range(NUM_DOF):
        cmd.motor_cmd[order[i]] = wire[i]
    return cmd


def pack_low_state(st: LowState, swap: bool = True) -> bytes:
    out = [struct.pack(_HDR_FMT, _MAGIC, _VERSION, KIND_LOW_STATE, st.tick)]
    out.append(struct.pack("<4f", *np.asarray(st.quaternion, np.float32)))
    out.append(struct.pack("<3f", *np.asarray(st.gyroscope, np.float32)))
    out.append(struct.pack("<3f", *np.asarray(st.accelerometer, np.float32)))
    j_order = SWAP_JOINT_INDICES if swap else np.arange(NUM_DOF)
    for i in range(NUM_DOF):
        m = st.motor_state[j_order[i]]
        out.append(struct.pack(_MOTOR_STATE_FMT, m.mode, m.q, m.dq, m.ddq, m.tauEst))
    f_order = SWAP_FOOT_INDICES if swap else np.arange(NUM_LEG)
    out.append(struct.pack("<4f", *np.asarray(st.foot_force, np.float32)[f_order]))
    return b"".join(out)


def unpack_low_state(data: bytes, swap: bool = True) -> LowState:
    """Deserialize a LowState frame, remapping BACK into controller order
    (HardwareInterface.cpp:131-137)."""
    magic, ver, kind, tick = struct.unpack_from(_HDR_FMT, data, 0)
    if magic != _MAGIC or kind != KIND_LOW_STATE:
        raise ValueError("not a LowState frame")
    ofs = struct.calcsize(_HDR_FMT)
    quat = np.array(struct.unpack_from("<4f", data, ofs)); ofs += 16
    gyro = np.array(struct.unpack_from("<3f", data, ofs)); ofs += 12
    acc = np.array(struct.unpack_from("<3f", data, ofs)); ofs += 12
    st = LowState(quaternion=quat, gyroscope=gyro, accelerometer=acc, tick=tick)
    sz = struct.calcsize(_MOTOR_STATE_FMT)
    j_order = SWAP_JOINT_INDICES if swap else np.arange(NUM_DOF)
    for i in range(NUM_DOF):
        vals = struct.unpack_from(_MOTOR_STATE_FMT, data, ofs + i * sz)
        st.motor_state[j_order[i]] = MotorState(int(vals[0]), *vals[1:])
    ofs += NUM_DOF * sz
    forces = np.array(struct.unpack_from("<4f", data, ofs))
    f_order = SWAP_FOOT_INDICES if swap else np.arange(NUM_LEG)
    st.foot_force[f_order] = forces
    return st


class FootForceProcessor:
    """Bias capture + moving-average filtering of raw foot-force readings
    (HardwareInterface.cpp:32,139-152): the first `bias_samples` frames set
    the zero offset; subsequent frames are filtered over a 40-sample window."""

    def __init__(self, bias_samples: int = 10, window: int = FOOT_FILTER_WINDOW):
        self._bias_samples = bias_samples
        self._seen = 0
        self._bias = np.zeros(NUM_LEG)
        self._buf = np.zeros((NUM_LEG, window))
        self._idx = 0
        self._count = 0

    def update(self, raw: np.ndarray) -> np.ndarray:
        raw = np.asarray(raw, dtype=float)
        if self._seen < self._bias_samples:
            self._bias = (self._bias * self._seen + raw) / (self._seen + 1)
            self._seen += 1
            return np.zeros(NUM_LEG)
        self._buf[:, self._idx] = raw - self._bias
        self._idx = (self._idx + 1) % self._buf.shape[1]
        self._count = min(self._count + 1, self._buf.shape[1])
        return self._buf[:, : self._count].mean(axis=1)


class HardwareLink:
    """LowCmd/LowState bridge over the native non-blocking UDP endpoint
    (HardwareInterface.cpp:7 targets 192.168.123.10:8007; the sim side of
    tests loops back on localhost)."""

    def __init__(self, peer_ip: str = "192.168.123.10", peer_port: int = 8007,
                 bind_port: int = 0):
        from quaternion_mpc_tpu.runtime import native

        self._udp = native.UdpLink(peer_ip, peer_port, bind_port)
        self.force_proc = FootForceProcessor()
        self._tick = 0

    @property
    def local_port(self) -> int:
        return self._udp.local_port

    def send_cmd(self, cmd: LowCmd) -> int:
        cmd.tick = self._tick
        self._tick += 1
        return self._udp.send(pack_low_cmd(apply_safety(cmd)))

    def recv_state(self) -> Optional[LowState]:
        data = self._udp.recv()
        if data is None:
            return None
        st = unpack_low_state(data)
        st.foot_force = self.force_proc.update(st.foot_force)
        return st


# ---------------------------------------------------------------------------
# High-level protocol (unitree_legged_real parity: the 8090/8091 bridge
# carries BOTH levels, ros_udp.cpp:13-50). Controller-relevant surface of
# unitree_legged_msgs/msg/High{Cmd,State}.msg — mode/gait/velocity command
# down, pose/velocity/foot state up; SN/BMS/LED/wirelessRemote padding is
# dropped exactly as the Low codecs drop it.
# ---------------------------------------------------------------------------

KIND_HIGH_CMD = 3
KIND_HIGH_STATE = 4

# high-level modes (HighCmd.msg mode semantics used by the examples:
# example_walk.cpp cycles 0=idle, 1=force stand, 2=velocity walk)
HIGH_MODE_IDLE = 0
HIGH_MODE_STAND = 1
HIGH_MODE_WALK = 2


@dataclass
class HighCmd:
    mode: int = HIGH_MODE_IDLE
    gait_type: int = 0
    body_height: float = 0.3       # absolute target height [m]
    foot_raise_height: float = 0.1
    position: np.ndarray = field(default_factory=lambda: np.zeros(2))
    euler: np.ndarray = field(default_factory=lambda: np.zeros(3))
    velocity: np.ndarray = field(default_factory=lambda: np.zeros(2))
    yaw_speed: float = 0.0
    tick: int = 0


@dataclass
class HighState:
    mode: int = HIGH_MODE_IDLE
    progress: float = 0.0
    gait_type: int = 0
    position: np.ndarray = field(default_factory=lambda: np.zeros(3))
    body_height: float = 0.0
    velocity: np.ndarray = field(default_factory=lambda: np.zeros(3))
    yaw_speed: float = 0.0
    quaternion: np.ndarray = field(default_factory=lambda: np.array([1.0, 0, 0, 0]))
    gyroscope: np.ndarray = field(default_factory=lambda: np.zeros(3))
    foot_force: np.ndarray = field(default_factory=lambda: np.zeros(4))
    foot_position_body: np.ndarray = field(default_factory=lambda: np.zeros((4, 3)))
    tick: int = 0


_HIGH_CMD_FMT = "<BB2f2f3f2ff"   # mode gait bodyH footH pos[2] eul[3] vel[2] yawSp
_HIGH_STATE_FMT = "<BfB3ff3ff4f3f4f12f"


def pack_high_cmd(cmd: HighCmd) -> bytes:
    body = struct.pack(
        _HIGH_CMD_FMT,
        cmd.mode & 0xFF, cmd.gait_type & 0xFF,
        cmd.body_height, cmd.foot_raise_height,
        *np.asarray(cmd.position, np.float32),
        *np.asarray(cmd.euler, np.float32),
        *np.asarray(cmd.velocity, np.float32),
        cmd.yaw_speed,
    )
    return struct.pack(_HDR_FMT, _MAGIC, _VERSION, KIND_HIGH_CMD, cmd.tick) + body


def unpack_high_cmd(data: bytes) -> HighCmd:
    hdr = struct.calcsize(_HDR_FMT)
    magic, ver, kind, tick = struct.unpack_from(_HDR_FMT, data)
    if magic != _MAGIC or kind != KIND_HIGH_CMD:
        raise ValueError("not a HighCmd frame")
    v = struct.unpack_from(_HIGH_CMD_FMT, data, hdr)
    return HighCmd(
        mode=v[0], gait_type=v[1], body_height=v[2], foot_raise_height=v[3],
        position=np.asarray(v[4:6]), euler=np.asarray(v[6:9]),
        velocity=np.asarray(v[9:11]), yaw_speed=v[11], tick=tick,
    )


def pack_high_state(st: HighState) -> bytes:
    body = struct.pack(
        _HIGH_STATE_FMT,
        st.mode & 0xFF, st.progress, st.gait_type & 0xFF,
        *np.asarray(st.position, np.float32),
        st.body_height,
        *np.asarray(st.velocity, np.float32),
        st.yaw_speed,
        *np.asarray(st.quaternion, np.float32),
        *np.asarray(st.gyroscope, np.float32),
        *np.asarray(st.foot_force, np.float32),
        *np.asarray(st.foot_position_body, np.float32).reshape(-1),
    )
    return struct.pack(_HDR_FMT, _MAGIC, _VERSION, KIND_HIGH_STATE, st.tick) + body


def unpack_high_state(data: bytes) -> HighState:
    hdr = struct.calcsize(_HDR_FMT)
    magic, ver, kind, tick = struct.unpack_from(_HDR_FMT, data)
    if magic != _MAGIC or kind != KIND_HIGH_STATE:
        raise ValueError("not a HighState frame")
    v = struct.unpack_from(_HIGH_STATE_FMT, data, hdr)
    return HighState(
        mode=v[0], progress=v[1], gait_type=v[2],
        position=np.asarray(v[3:6]), body_height=v[6],
        velocity=np.asarray(v[7:10]), yaw_speed=v[10],
        quaternion=np.asarray(v[11:15]), gyroscope=np.asarray(v[15:18]),
        foot_force=np.asarray(v[18:22]),
        foot_position_body=np.asarray(v[22:34]).reshape(4, 3),
        tick=tick,
    )
