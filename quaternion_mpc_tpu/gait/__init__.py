from quaternion_mpc_tpu.gait import raibert, schedule, swing  # noqa: F401
