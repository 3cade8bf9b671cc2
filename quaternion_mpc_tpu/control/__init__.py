from quaternion_mpc_tpu.control import convex_mpc, goals, quat_mpc, safety, torque  # noqa: F401
