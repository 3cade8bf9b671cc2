from quaternion_mpc_tpu.sim import plant  # noqa: F401
