"""Config presets: the reference's (env × robot × controller × estimator) YAML
axes (``legged_ctrl/config/*.yaml``, loaded by ``LeggedState.cpp:66-259``) as
frozen dataclasses with the same values. Everything numeric that enters jitted
code is converted to arrays at problem-build time.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

# control periods (LeggedParams.h:4-6), in seconds
MPC_PERIOD = 5.0e-3
LOW_LEVEL_PERIOD = 0.25e-3
FEEDBACK_PERIOD = 1.0e-3
NUM_LEG = 4
FOOT_DELTA_X_LIMIT = 0.5
FOOT_DELTA_Y_LIMIT = 0.3


@dataclasses.dataclass(frozen=True)
class RobotConfig:
    """Go1 physical constants (gazebo_go1_quat_mpc.yaml:114-122, go1.urdf:436-437)."""

    mass: float = 12.84
    trunk_mass: float = 5.204
    trunk_inertia: Tuple[float, float, float] = (0.0168128557, 0.063009565, 0.0716547275)
    com_offset: Tuple[float, float, float] = (0.0223, 0.002, -0.0005)
    # default foothold, relative frame (gazebo_go1_quat_mpc.yaml:16-30)
    default_foot_pos: Tuple[Tuple[float, float, float], ...] = (
        (0.20, 0.14, -0.3),
        (0.20, -0.14, -0.3),
        (-0.20, 0.14, -0.3),
        (-0.20, -0.14, -0.3),
    )


@dataclasses.dataclass(frozen=True)
class MpcConfig:
    """Controller parameters; defaults = gazebo Go1 quaternion MPC."""

    controller: str = "quat"          # "quat" | "convex"
    horizon: int = 20                 # mpc_horizon
    update_period_ms: float = 10.0    # mpc_update_period (= solver h in ms)
    q_weights: Tuple[float, ...] = (
        2.5, 2.5, 10.0,
        0.0, 0.0, 0.0, 0.0,
        0.1, 0.1, 0.1,
        0.15, 0.15, 0.15,
    )
    r_weights: Tuple[float, ...] = (1e-6,) * 12
    w: float = 50.0                   # quaternion geodesic weight
    mu: float = 0.7
    fz_max: float = 100.0
    iterations_max: int = 10
    # reference quirk (QuatMpc.cpp:242 comma-typo): the initial MPC state
    # always carries ω = 0. Kept as the default HERE (config presets =
    # reference parity; this is what the fixture tests exercise). NOTE the
    # closed-loop steps in runtime/step.py deliberately default the OPPOSITE
    # (False = corrected ω feedback): their idealized force-tracking plant
    # has no joint-level impedance to damp attitude, so the parity quirk
    # tips the trot over. Entry points that take a FrameworkConfig thread
    # THIS value through; hand-built steps use the corrected default.
    zero_initial_omega: bool = True


@dataclasses.dataclass(frozen=True)
class GaitConfig:
    gait_freq: float = 2.2            # cycles/s (gazebo quat yaml:33)
    pattern: str = "trot"             # trot | trot_with_stand | crawl | stand


@dataclasses.dataclass(frozen=True)
class SwingConfig:
    kp: Tuple[float, float, float] = (20.0, 20.0, 20.0)   # hip/thigh/calf
    kd: Tuple[float, float, float] = (1.5, 1.5, 1.5)
    foot_sensor_max: float = 200.0
    foot_sensor_min: float = 0.0
    foot_sensor_ratio: float = 0.5


@dataclasses.dataclass(frozen=True)
class EstimatorConfig:
    kf_type: int = 0                  # 0 ground truth, 1 linear KF, 2 EKF


@dataclasses.dataclass(frozen=True)
class FrameworkConfig:
    robot: RobotConfig = dataclasses.field(default_factory=RobotConfig)
    mpc: MpcConfig = dataclasses.field(default_factory=MpcConfig)
    gait: GaitConfig = dataclasses.field(default_factory=GaitConfig)
    swing: SwingConfig = dataclasses.field(default_factory=SwingConfig)
    estimator: EstimatorConfig = dataclasses.field(default_factory=EstimatorConfig)


def gazebo_go1_quat_mpc() -> FrameworkConfig:
    """config/gazebo_go1_quat_mpc.yaml"""
    return FrameworkConfig()


def gazebo_go1_convex_mpc() -> FrameworkConfig:
    """config/gazebo_go1_convex_mpc.yaml (diffs vs quat preset)"""
    return FrameworkConfig(
        robot=RobotConfig(
            default_foot_pos=(
                (0.2104, 0.13, -0.325),
                (0.2104, -0.13, -0.325),
                (-0.1658, 0.13, -0.325),
                (-0.1658, -0.13, -0.325),
            )
        ),
        mpc=MpcConfig(
            controller="convex",
            update_period_ms=5.0,
            q_weights=(3.0, 3.0, 3.0, 1.0, 1.0, 20.0, 0.0, 0.0, 3.0, 2.0, 3.0, 2.0),
            w=0.0,
            mu=0.6,
            fz_max=200.0,
            iterations_max=5,
        ),
        swing=SwingConfig(kp=(5.0, 5.0, 5.0), kd=(0.5, 0.5, 0.5)),
    )


def hardware_go1_quat_mpc() -> FrameworkConfig:
    """config/hardware_go1_quat_mpc.yaml (diffs vs gazebo quat preset)"""
    return FrameworkConfig(
        mpc=MpcConfig(
            w=35.0,
            q_weights=(
                2.5, 2.5, 10.0,
                0.0, 0.0, 0.0, 0.0,
                0.1, 0.1, 0.1,
                0.1, 0.1, 1.0,
            ),
        ),
        gait=GaitConfig(gait_freq=2.0),
        swing=SwingConfig(kp=(25.0, 25.0, 25.0), kd=(2.0, 2.0, 2.0), foot_sensor_max=150.0),
        estimator=EstimatorConfig(kf_type=1),
    )


def hardware_go1_convex_mpc() -> FrameworkConfig:
    """config/hardware_go1_convex_mpc.yaml (diffs vs gazebo convex preset)"""
    return FrameworkConfig(
        robot=RobotConfig(mass=12.0),
        mpc=MpcConfig(
            controller="convex",
            horizon=30,
            update_period_ms=8.0,
            q_weights=(15.0, 70.0, 10.0, 5.0, 5.0, 150.0,
                       0.02, 0.02, 10.0, 2.5, 7.0, 20.0),
            r_weights=(1e-4,) * 12,
            w=0.0,
            mu=0.7,
            fz_max=500.0,
            iterations_max=5,
        ),
        gait=GaitConfig(gait_freq=1.7),
        swing=SwingConfig(kp=(25.0, 25.0, 25.0), kd=(2.0, 2.0, 2.0)),
        estimator=EstimatorConfig(kf_type=1),
    )


def q_weights_array(cfg: MpcConfig):
    return np.asarray(cfg.q_weights)


def presets():
    return {
        "gazebo_go1_quat_mpc": gazebo_go1_quat_mpc,
        "gazebo_go1_convex_mpc": gazebo_go1_convex_mpc,
        "hardware_go1_quat_mpc": hardware_go1_quat_mpc,
        "hardware_go1_convex_mpc": hardware_go1_convex_mpc,
    }


@dataclasses.dataclass(frozen=True)
class RobotDescription:
    """Physical description of one robot family — the `robots/*_description`
    URDF layer as data (trunk inertials + leg geometry for FK/IK/dynamics).

    leg_offset: hip origin (x, y) from trunk center; thigh_offset: signed
    hip-link length; thigh/calf_length: link lengths (xacro const files).
    """

    name: str
    trunk_mass: float
    trunk_inertia: Tuple[float, float, float]
    leg_offset_x: float
    leg_offset_y: float
    thigh_offset: float
    thigh_length: float
    calf_length: float

    def rho_fix(self) -> np.ndarray:
        """Per-leg [offset_x, offset_y, hip_len, l_thigh, l_calf] in FL, FR,
        RL, RR order (kin.leg convention; BaseInterface.cpp:12-34)."""
        rows = []
        for sx in (1.0, -1.0):
            for sy in (1.0, -1.0):
                rows.append([
                    sx * self.leg_offset_x,
                    sy * self.leg_offset_y,
                    sy * self.thigh_offset,
                    self.thigh_length,
                    self.calf_length,
                ])
        # generated order: FL, FR, RL, RR (x {+,+,-,-}, y {+,-,+,-})
        return np.asarray(rows)


def robot_descriptions():
    """All robot families the reference ships URDFs for
    (`robots/{go1,a1,aliengo,aliengoZ1,b1,laikago}_description`), values from
    each family's `xacro/const.xacro`."""
    return {
        "go1": RobotDescription(
            "go1", 5.204, (0.0168128557, 0.063009565, 0.0716547275),
            0.1881, 0.04675, 0.08, 0.213, 0.213,
        ),
        "a1": RobotDescription(
            "a1", 6.0, (0.0158533, 0.0377999, 0.0456542),
            0.1805, 0.047, 0.0838, 0.2, 0.2,
        ),
        "aliengo": RobotDescription(
            "aliengo", 11.644, (0.051944892, 0.24693924, 0.270948307),
            0.2407, 0.051, 0.0868, 0.25, 0.25,
        ),
        "aliengoZ1": RobotDescription(
            # aliengo base carrying the Z1 arm; trunk inertials identical
            "aliengoZ1", 11.644, (0.051944892, 0.24693924, 0.270948307),
            0.2407, 0.051, 0.0868, 0.25, 0.25,
        ),
        "b1": RobotDescription(
            "b1", 25.0, (0.183142146, 0.756327752, 0.783777558),
            0.3455, 0.072, 0.12675, 0.35, 0.35,
        ),
        "laikago": RobotDescription(
            "laikago", 13.733, (0.073348887, 0.250684593, 0.254469458),
            0.21935, 0.0875, 0.037, 0.25, 0.25,
        ),
    }


def config_for_robot(name: str, base: "FrameworkConfig" = None) -> FrameworkConfig:
    """A FrameworkConfig for any robot family in the registry — the
    reference only ships Go1 YAMLs, but its URDF layer covers six robots
    (`robots/*_description`); this derives the controller-relevant physical
    constants the same way the reference's own solver tests do:

    - trunk inertia straight from the URDF registry values;
    - total mass scaled by the Go1 robot/trunk ratio (12.84/5.204 — the
      scaling TestAltroQuatMpc.cpp:41-55 applies to build a whole-robot
      model from trunk inertials);
    - default stance footprint from the family's leg geometry (hips ±
      thigh offset, feet under the hips at standing height);
    - CoM offset zeroed (the Go1 numbers are measured calibration, not
      URDF data — other families have no measurement to port).
    """
    base = base or gazebo_go1_quat_mpc()
    desc = robot_descriptions()[name]
    go1 = RobotConfig()
    mass_ratio = go1.mass / go1.trunk_mass
    foot_y = desc.leg_offset_y + abs(desc.thigh_offset)
    # standing height ~70% of full leg extension (Go1: 0.3/0.426 ≈ 0.70)
    height = 0.7 * (desc.thigh_length + desc.calf_length)
    feet = tuple(
        (sx * desc.leg_offset_x, sy * foot_y, -height)
        for sx in (1.0, -1.0)
        for sy in (1.0, -1.0)
    )
    robot = RobotConfig(
        mass=desc.trunk_mass * mass_ratio,
        trunk_mass=desc.trunk_mass,
        trunk_inertia=desc.trunk_inertia,
        com_offset=(0.0, 0.0, 0.0),
        default_foot_pos=feet,
    )
    # heavier robots need a proportionally higher per-foot force ceiling
    fz_max = base.mpc.fz_max * (desc.trunk_mass * mass_ratio) / go1.mass
    mpc = dataclasses.replace(base.mpc, fz_max=fz_max)
    return dataclasses.replace(base, robot=robot, mpc=mpc)
