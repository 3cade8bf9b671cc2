from quaternion_mpc_tpu.models import srb, discretize  # noqa: F401
