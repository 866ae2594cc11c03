"""Structural communication-count guards for the parallel layer.

Real multi-chip hardware is not available in CI, so the scaling story
is locked in structurally instead (VERDICT r1 next-round #9): walk the
jaxpr and assert the exact collective count per loop iteration —
consensus loops pay exactly ONE psum (the pmean) per iteration, the
batch-sharded solve pays ZERO collectives in its compiled HLO, and the
distributed FFT pays exactly ONE all_to_all per transform. Any change
that sneaks an extra all-reduce/gather into a hot loop fails here long
before it would show up as an ICI bottleneck on a real slice.
"""
from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

import dprox_tpu as dp
from dprox_tpu.parallel import consensus_admm, create_mesh
from dprox_tpu.utils import imaging

COLLECTIVES = ("psum", "pmin", "pmax", "ppermute", "all_to_all",
               "all_gather", "reduce_scatter")
_LOOPS = ("scan", "while")


def _sub_jaxprs(eqn):
    for v in eqn.params.values():
        if isinstance(v, jax.extend.core.ClosedJaxpr):
            yield v.jaxpr
        elif hasattr(v, "eqns"):  # bare Jaxpr
            yield v
        elif isinstance(v, (tuple, list)):
            for item in v:
                if isinstance(item, jax.extend.core.ClosedJaxpr):
                    yield item.jaxpr
                elif hasattr(item, "eqns"):
                    yield item


def count_collectives(jaxpr, in_loop=False):
    """{(prim_base_name, in_loop): count} over the whole jaxpr tree.

    A loop body (scan/while) is counted ONCE — each collective there
    costs once per iteration at runtime, which is what the guard pins.
    """
    counts = {}

    def walk(jx, loop):
        for eqn in jx.eqns:
            name = eqn.primitive.name
            base = next((c for c in COLLECTIVES
                         if name == c or name.startswith(c)), None)
            if base is not None:
                key = (base, loop)
                counts[key] = counts.get(key, 0) + 1
            child_loop = loop or any(name.startswith(l) for l in _LOOPS)
            for sub in _sub_jaxprs(eqn):
                walk(sub, child_loop)

    walk(jaxpr.jaxpr if hasattr(jaxpr, "jaxpr") else jaxpr, in_loop)
    return counts


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8
    return create_mesh(("batch",))


def test_consensus_admm_exactly_one_pmean_per_iteration(mesh):
    a = jnp.asarray(np.random.RandomState(0).rand(8, 4, 4), jnp.float32)

    def local_prox(v, rho, a_i):
        return (2 * a_i + rho * v) / (2 + rho)

    jaxpr = jax.make_jaxpr(
        lambda z, aa: consensus_admm(local_prox, z, aa, mesh, max_iter=7))(
            jnp.zeros((4, 4)), a)
    c = count_collectives(jaxpr)
    assert c == {("psum", True): 1}, c  # ONE pmean inside the loop, else 0


def test_consensus_lp_one_pmean_per_outer_iteration(mesh):
    """Scenario progressive hedging: the outer loop body carries exactly
    one psum (the probability-weighted consensus pmean); the per-chunk
    diagnostics outside the loop add one psum (objective) + two pmax
    (residual maxima) — constant per chunk, NOT per iteration."""
    from dprox_tpu.algo.lp.consensus import ConsensusLPSolver, ScenarioLP
    from dprox_tpu.contrib.energy_system import synthetic_cep_scenarios

    c_, A_ub, A_eq, b_ub, b_eq_s, sh = synthetic_cep_scenarios(8, 3, 8)
    smesh = create_mesh(("scenario",))
    p = ScenarioLP(c_, A_ub, b_ub, A_eq, b_eq_s, sh)
    solver = ConsensusLPSolver(dtype=jnp.float32)
    chunk_body = solver._build(p, solver.init_params(), 20, 1e-4)
    axis = "scenario"
    gmean = lambda v: jax.lax.pmean(jnp.mean(v, axis=0), axis)
    gmax = lambda v: jax.lax.pmax(v, axis)
    vary, repl = P(axis), P()
    S, n, m = p.S, p.n, p.lb.shape[1]
    k_sh = p.shared_idx.shape[0]
    dt = jnp.float32
    f = shard_map(
        partial(lambda *a, steps: chunk_body(*a, steps, gmean, gmax),
                steps=5),
        mesh=smesh, in_specs=(vary,) * 5 + (repl, vary, vary, vary, repl),
        out_specs=((vary,) * 5 + (repl,), (repl,) * 4))
    args = (jnp.zeros((S, n), dt), jnp.zeros((S, m), dt),
            jnp.zeros((S, m), dt), jnp.zeros((S, n), dt),
            jnp.zeros((S, k_sh), dt), jnp.zeros(k_sh, dt),
            p.lb, p.ub, p.pn, jnp.asarray(1.0, dt))
    c = count_collectives(jax.make_jaxpr(f)(*args))
    assert c[("psum", True)] == 1, c          # the consensus pmean
    assert ("pmax", True) not in c, c          # no per-iter max-reduce
    assert c.get(("psum", False), 0) <= 1, c   # objective (per chunk)
    assert c.get(("pmax", False), 0) <= 2, c   # residual diagnostics


def test_batch_sharded_solve_zero_collectives(mesh):
    """Data-parallel solve: the explicit-SPMD shard_map program contains
    no cross-device communication at all — every FFT/prox step is
    device-local (linear scaling by construction). Guarded at the jaxpr
    level AND in the compiled HLO (a partitioner without a sharded-fft
    rule — XLA CPU — would all-gather at every loop FFT if the solve
    relied on GSPMD propagation instead of shard_map)."""
    from dprox_tpu.algo.base import encode_complex
    from dprox_tpu.parallel import solve_batched_sharded

    img = imaging.sample("face")[:, :, :32, :32]
    psf = imaging.point_spread_function(5, 2)
    b = jnp.tile(imaging.blurring(img, psf), (8, 1, 1, 1))
    x = dp.Variable()
    data = dp.sum_squares(dp.conv(x, psf) - b[:1])
    solver = dp.compile([data, dp.nonneg(x)], method="admm")

    # jaxpr-level: zero collective primitives anywhere in the program
    c = count_collectives(jax.make_jaxpr(
        lambda bb: solve_batched_sharded(solver, bb, mesh, max_iter=6,
                                         rhos=0.05, lams=0.01))(b))
    assert c == {}, c

    # HLO-level: the compiled partitioned module has no comm ops either
    run = solver._get_jitted(False)
    rhos, lams = solver.defaults(0.05, 0.01, 6)
    from jax import shard_map as _sm
    fn = _sm(lambda v: run(v, rhos, lams, {}), mesh=mesh,
             in_specs=P("batch"), out_specs=P("batch"))
    bs = jax.device_put(encode_complex(jnp.asarray(b)),
                        NamedSharding(mesh, P("batch")))
    with mesh:
        hlo = jax.jit(fn).lower(bs).compile().as_text()
    for op in ("all-reduce", "all-gather", "collective-permute",
               "all-to-all", "reduce-scatter"):
        assert op not in hlo, f"unexpected {op} in batch-sharded HLO"


def test_distributed_fft2_exactly_one_all_to_all_each_way():
    from dprox_tpu.parallel.fft import make_distributed_fft2

    smesh = create_mesh(("space",))
    fft2, ifft2 = make_distributed_fft2(smesh, "space")
    x = jnp.zeros((1, 3, 64, 64), jnp.complex64)
    c_fwd = count_collectives(jax.make_jaxpr(fft2)(x))
    assert c_fwd == {("all_to_all", False): 1}, c_fwd
    c_rt = count_collectives(jax.make_jaxpr(lambda v: ifft2(fft2(v)))(x))
    assert c_rt == {("all_to_all", False): 2}, c_rt
