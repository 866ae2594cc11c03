from .solvers import LPProblem, LPSolverADMM, LPConvergenceLoss, solve_lp
from .utils import ruiz_equilibration_sparse, scipy_to_bcoo
