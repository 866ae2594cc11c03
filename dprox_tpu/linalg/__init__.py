from .solvers import SOLVERS, bdot, cg, cg2, pcg, plss, plssw, minres, cg_unrolled
from .solve import LinearSolveConfig, linear_solve, pcg_solve
