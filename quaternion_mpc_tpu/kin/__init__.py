from quaternion_mpc_tpu.kin import leg  # noqa: F401
