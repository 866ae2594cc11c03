from .solvers import SOLVERS, bdot, cg, cg2, pcg, plss, plssw, minres, cg_unrolled
from .solve import LinearSolveConfig, linear_solve, pcg_solve

# reference-compat name: the torch.autograd.Function `LinearSolve`
# (reference linalg/custom.py:39-62) is realized here as the
# implicit-gradient `linear_solve` entry point.
LinearSolve = linear_solve
