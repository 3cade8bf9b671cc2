from quaternion_mpc_tpu.est import ekf, kf  # noqa: F401
