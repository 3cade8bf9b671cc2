from quaternion_mpc_tpu.parallel import mesh  # noqa: F401
