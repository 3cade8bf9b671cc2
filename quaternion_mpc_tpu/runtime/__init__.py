from quaternion_mpc_tpu.runtime import step  # noqa: F401
