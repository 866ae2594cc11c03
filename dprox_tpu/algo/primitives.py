"""User primitives: compile / specialize / optimize / train / visualize.

Counterpart of /root/reference/dprox/algo/primitives.py. ``compile``
partitions a proxfn objective and instantiates the chosen solver;
``specialize`` wraps it for unrolling / DEQ / RL tuning; ``train`` runs a
generic optax supervised loop with checkpoint/resume.
"""
from __future__ import annotations

from typing import Callable, List, Optional

import jax

from ..linalg import LinearSolveConfig
from ..proxfn.base import ProxFn
from .admm import ADMM, ADMM_vxu, LinearizedADMM
from .cadmm import ConsensusADMM
from .hqs import HQS
from .pc import PockChambolle
from .pgd import ProximalGradientDescent
from .absorb import absorb_all_linops

SOLVERS = {
    "admm": ADMM,
    "admm_vxu": ADMM_vxu,
    "ladmm": LinearizedADMM,
    "hqs": HQS,
    "pc": PockChambolle,
    "pgd": ProximalGradientDescent,
    "cadmm": ConsensusADMM,
}


def compile(prox_fns: List[ProxFn], method: str = "admm", device=None, **kwargs):
    """Partition + instantiate a solver (reference: primitives.py:40-67).

    ``device`` is accepted for API parity; placement on TPU follows JAX's
    default device semantics instead of explicit .to(device) moves.
    """
    if isinstance(prox_fns, ProxFn):
        prox_fns = [prox_fns]
    if method not in SOLVERS:
        raise ValueError(
            f"unknown method '{method}'; available: {sorted(SOLVERS)}")
    algorithm = SOLVERS[method]
    psi_fns, omega_fns = algorithm.partition(prox_fns)
    solver = algorithm(psi_fns, omega_fns, **kwargs)
    return solver


def specialize(solver, method: str = "deq", **kwargs):
    """Wrap a compiled solver for learning (reference: primitives.py:70-95)."""
    from .special import SPECIALIZATIONS

    return SPECIALIZATIONS[method](solver, **kwargs)


def optimize(prox_fns: List[ProxFn], merge=False, absorb=True):
    """Problem-rewrite passes (reference: primitives.py:98-107; the merge
    pass is dead code upstream and intentionally not replicated)."""
    if absorb:
        prox_fns = absorb_all_linops(prox_fns)
    return prox_fns


def visualize(prox_fns=None, filename=None):
    """Render linop expression trees (the reference keeps a stub here,
    primitives.py:110-112; we emit graphviz/text via linop.visualize)."""
    from ..linop.visualize import visualize as _vis

    if prox_fns is None:
        return None
    if not isinstance(prox_fns, list):
        prox_fns = [prox_fns]
    return "\n\n".join(_vis(fn.linop, filename) for fn in prox_fns)


def train(solver=None, step_fn: Optional[Callable] = None, dataset=None,
          **kwargs):
    """Generic supervised training entry (reference: primitives.py:115-205).

    For RL-specialized solvers dispatches to their own ``train``;
    otherwise runs the optax loop in :mod:`dprox_tpu.algo.special.training`.
    """
    from .special.rl import AutoTuneSolver

    if isinstance(solver, AutoTuneSolver):
        return solver.train(dataset, **kwargs)
    from .special.training import train_supervised

    return train_supervised(step_fn=step_fn, dataset=dataset, **kwargs)
