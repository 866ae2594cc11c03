from .unroll import UnrolledSolver, build_unrolled_solver
from .deq import DEQSolver, deq_fixed_point, train_deq
from .fixed_point import anderson, broyden, FIXED_POINT_SOLVERS
from .rl import AutoTuneSolver
from .training import train_supervised, save_checkpoint, load_checkpoint

SPECIALIZATIONS = {
    "unroll": build_unrolled_solver,
    "deq": DEQSolver,
    "rl": AutoTuneSolver,
}
