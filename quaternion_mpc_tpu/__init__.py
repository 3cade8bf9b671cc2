"""quaternion_mpc_tpu — a TPU-native quaternion model-predictive-control framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
``zixinz990/quaternion-mpc`` C++/ROS quadruped control stack (singularity-free
quaternion MPC, Euler convex-MPC baseline, gait/swing/kinematics/estimation
layers), built TPU-first:

- pure, batched, jittable functions over pytrees (no threads, no mutexes),
- a batched quaternion AL-iLQR trajectory optimizer (`solver/`),
- scenario fleets via `jax.vmap` + `jax.sharding` meshes (`parallel/`),
- an in-framework batched SRB plant replacing Gazebo (`sim/`).

Reference layer map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"

from quaternion_mpc_tpu.ops import lie  # noqa: F401
