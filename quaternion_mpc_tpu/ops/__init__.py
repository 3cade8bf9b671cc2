from quaternion_mpc_tpu.ops import lie  # noqa: F401
