from quaternion_mpc_tpu.utils import config, filters  # noqa: F401
