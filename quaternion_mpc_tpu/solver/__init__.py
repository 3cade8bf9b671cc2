from quaternion_mpc_tpu.solver.problem import (  # noqa: F401
    CostSpec,
    ModelSpec,
    SolverOptions,
    TrajOptProblem,
)
from quaternion_mpc_tpu.solver.al_ilqr import make_solver, solve  # noqa: F401
