"""Benchmark: ADMM iterations/sec/chip on the deconvolution problem.

Measures the BASELINE.json metric — jitted ADMM iteration throughput and
wall-clock to primal-dual residual 1e-4 on image deconvolution
(sum_squares(conv(x,psf)-b) + nonneg(x), 512x512) — and prints ONE JSON
line. The PyTorch reference publishes no its/s figures
(BASELINE.md), so vs_baseline is measured against a torch-CPU/GPU run of
the same math when torch is available, else reported vs the recorded
reference A100-class estimate.

The JSON line also carries a ``paths`` object covering ALL FIVE solver
execution paths (VERDICT r2 #6) so cross-path regressions are
driver-visible, with the round-2 measured values as floors:
  deconv_fft    FFT-diagonal x-update (the headline above)
  pnp_deep      PnP deep-prior ADMM at the FLAGSHIP quality config
  joint_dd_cg   non-diagonalizable joint demosaic+deconv, PCG x-update
  csmri_fast    fused k-space prox, complex state
  lp_fused      energy-planning LP, fused while_loop OSQP-style ADMM
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def build_problem(B=1, H=512, W=512, C=3, max_iter=24):
    import dprox_tpu as dp
    from dprox_tpu.utils import imaging

    rng = np.random.RandomState(0)
    img = imaging.sample("face")
    img = jnp.tile(img[:, :, :H, :W], (B, 1, 1, 1))
    psf = imaging.point_spread_function(15, 5)
    b = imaging.blurring(img, psf)

    x = dp.Variable()
    data = dp.sum_squares(dp.conv(x, psf) - b)
    reg = dp.nonneg(x)
    solver = dp.compile([data, reg], method="admm")
    return solver, img, b


def bench_admm(B=1, iters_lo=24, iters_hi=224, reps=5):
    """Marginal iteration throughput.

    NOTE: jax.block_until_ready returns early on the axon backend, so
    timings are forced by a host fetch, and the per-solve fixed overhead
    (dispatch + transfer) is cancelled by differencing two iteration
    counts: its/s = (hi - lo) / (t_hi - t_lo).
    """
    solver, img, b = build_problem(B=B)

    def timed(iters):
        out = solver.solve(x0=b, max_iter=iters, rhos=0.05, lams=0.01)
        float(jnp.mean(out))  # warmup incl. fetch
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = solver.solve(x0=b, max_iter=iters, rhos=0.05, lams=0.01)
            float(jnp.mean(out))  # force completion
            best = min(best, time.perf_counter() - t0)
        return best, out

    t_lo, _ = timed(iters_lo)
    t_hi, out = timed(iters_hi)
    its_per_sec = (iters_hi - iters_lo) / max(t_hi - t_lo, 1e-9)
    return its_per_sec, out, img


def reference_dprox_its_per_sec(iters=24):
    """Run the ACTUAL reference implementation (/root/reference/dprox,
    PyTorch) on the same problem, via tests/reference_harness."""
    try:
        import sys

        sys.path.insert(0, "tests")
        from reference_harness import load_reference

        ref = load_reference()
        if ref is None:
            return None
        import torch

        H = W = 512
        img = np.random.RandomState(0).rand(1, 3, H, W).astype(np.float32)
        from dprox_tpu.utils.imaging import point_spread_function

        psf = point_spread_function(15, 5)
        x = ref.Variable()
        b = ref.conv(ref.Variable(), psf).forward(torch.from_numpy(img))
        data = ref.sum_squares(ref.conv(x, psf) - b)
        reg = ref.nonneg(x)
        solver = ref.compile(data + reg, method="admm", device="cpu")
        with torch.no_grad():
            solver.solve(x0=b, rhos=0.05, lams=0.01, max_iter=2)  # warmup
            t0 = time.perf_counter()
            solver.solve(x0=b, rhos=0.05, lams=0.01, max_iter=iters)
            dt = time.perf_counter() - t0
        return iters / dt
    except Exception:
        return None


def torch_reference_its_per_sec(iters=50):
    """Same ADMM math in torch (the reference's execution model) on this
    host, as the measured baseline."""
    try:
        import torch

        torch.set_num_threads(max(1, torch.get_num_threads()))
        dev = "cuda" if torch.cuda.is_available() else "cpu"
        H = W = 512
        rng = np.random.RandomState(0)
        img = torch.rand(1, 3, H, W, device=dev)
        from dprox_tpu.utils.fft import psf2otf
        from dprox_tpu.utils.imaging import point_spread_function

        psf = point_spread_function(15, 5)
        otf = torch.from_numpy(
            np.transpose(psf2otf(psf.squeeze(), (H, W, 3)), (2, 0, 1))[None]
        ).to(dev)
        b = torch.real(torch.fft.ifftn(otf * torch.fft.fftn(img, dim=[-2, -1]), dim=[-2, -1]))
        diag = torch.abs(torch.conj(otf) * otf)
        Ktb0 = torch.real(torch.fft.ifftn(torch.conj(otf) * torch.fft.fftn(b, dim=[-2, -1]), dim=[-2, -1]))
        rho = 0.05

        def run(iters):
            x = b.clone()
            v = x.clone()
            u = torch.zeros_like(x)
            for _ in range(iters):
                rhs = Ktb0 + rho * (v - u)
                F = torch.fft.fftn(rhs, dim=[-2, -1])
                x = torch.real(torch.fft.ifftn(F / (diag + rho), dim=[-2, -1]))
                v = torch.clamp(x + u, min=0)
                u = u + x - v
            return x

        run(2)
        if dev == "cuda":
            torch.cuda.synchronize()
        t0 = time.perf_counter()
        run(iters)
        if dev == "cuda":
            torch.cuda.synchronize()
        dt = time.perf_counter() - t0
        return iters / dt
    except Exception:
        return None


def iters_to_pd_residual(tol=1e-4, cap=512):
    """Iterations until relative primal AND dual residuals < tol (the
    second half of the BASELINE.json metric). The iteration count is a
    property of the math (identical for any correct implementation), so
    baseline wall-clock = count / baseline its/s."""
    solver, img, b = build_problem()
    out, res = solver.solve_with_residuals(x0=b, max_iter=cap,
                                           rhos=0.05, lams=0.01)
    rp = np.asarray(res["r_primal"])
    rd = np.asarray(res["r_dual"])
    ok = np.where((rp < tol) & (rd < tol))[0]
    return (int(ok[0]) + 1) if len(ok) else None


def _marginal_its(solve, lo, hi, reps=3, estimates=1):
    """Marginal its/s = (hi-lo)/(t_hi-t_lo) with per-solve overhead
    cancelled by differencing.

    ``estimates`` > 1 repeats the whole differenced measurement and
    returns the MEDIAN: on the remote-dispatch relay a single marginal
    estimate on the CG/fast paths swings +/-20-50% run-to-run
    (benchmarks/floor_recal.py r5: joint_dd_cg 3090..6289 over 6 runs,
    csmri_fast 12.4k..15.0k), which is what made BENCH_r04's joint
    2600.1 read as a floor breach while the path was healthy. The
    median of 5 estimates is stable to a few percent and costs <1 s
    warm per extra estimate.
    """
    def timed(iters):
        out = solve(iters)
        float(jnp.mean(jnp.abs(out)))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = solve(iters)
            float(jnp.mean(jnp.abs(out)))
            best = min(best, time.perf_counter() - t0)
        return best

    obs = []
    attempts = 0
    while len(obs) < max(1, estimates) and attempts < 2 * max(1, estimates):
        attempts += 1
        t_lo, t_hi = timed(lo), timed(hi)
        # discard non-physical estimates: relay jitter can make the
        # best-of hi-timing come out <= the lo-timing, which the clamp
        # would turn into a 1e11-class garbage observation (seen on
        # csmri_fast, whose whole marginal span is ~30 ms)
        if t_hi - t_lo < 1e-5:
            continue
        obs.append((hi - lo) / (t_hi - t_lo))
    if not obs:
        obs = [float("nan")]
    if estimates <= 1:
        return obs[0]
    return float(np.median(obs)), [round(o, 1) for o in obs]


# --------------------------------------------------------------------------
# Floor protocol (VERDICT r4 #1 — floors are derived from a STATED
# statistic, never ad-hoc tightened):
#
#   floor = min(history) * (1 - 2 * jitter)
#
# where `history` is the list of recorded per-round values of the
# path's MEASUREMENT STATISTIC and `jitter` is the observed relative
# spread of that statistic across back-to-back same-session runs
# (benchmarks/floor_recal.py). The statistic per path:
#   deconv_fft   single 200-iteration-span differenced estimate,
#                best-of-5 (r3 back-to-back spread ~2%: 2764/2717/2658)
#   joint_dd_cg  MEDIAN of 5 differenced 60-it-span estimates (r5: a
#                single estimate swings 3090..6289 on the relay — that
#                jitter, not a regression, produced BENCH_r04's 2600.1
#                "breach"; bisect vs d606e71 was negative: that commit
#                only touched the direct-FFT branch the CG path never
#                runs. Median-of-5 of the r5 session: 3948)
#   csmri_fast   MEDIAN of 5 differenced 400-it-span estimates (r5
#                session: 12.4k..15.0k singles, median 13.3k; the r4
#                30.5k single was the same class of outlier as the
#                discarded r3 27.5k)
#   pnp_deep     MEDIAN of 3 (history 305.9/318.6/313.6/320.2, ~3%)
#   lp_fused     warm wall-clock, lower=better: bound is
#                max(history) * (1 + 2 * jitter)
#                (history 1.38/1.381/1.396/1.423, jitter ~2%)
# History values feeding the formula (rounds r2..r5):
_FLOOR_DATA = {
    "deconv_fft": {"history": [2764.0, 2717.0, 2658.0, 2701.8, 2716.5,
                               2755.4],
                   "jitter": 0.02},
    # jitter of the MEDIAN-OF-5 statistic measured from three r5
    # same-day runs (floor_recal + two full bench runs):
    # joint 3948/3300/3577 (rel spread 0.18), csmri 13319/15045/15209
    # (rel spread 0.13). Those three predate the TV lane-layout fix
    # (models/tv.py, r5): both paths run the TV prior, and post-fix
    # medians measure joint 5116/5083 and csmri 23768/22370 (+45%/+68%)
    # — the floors keep the pre-fix minima, i.e. they are conservative
    # by design (min over ALL recorded history).
    "joint_dd_cg": {"history": [3948.0, 3300.3, 3577.1, 5115.9, 5083.2],
                    "jitter": 0.18},
    "csmri_fast": {"history": [13318.7, 15044.8, 15209.3, 23767.9,
                               22369.5],
                   "jitter": 0.13},
    # 534.7 is the first post-FFDNet-boundary-fusion capture and 563.6
    # adds the fused-TV Pallas kernel (r5, models/ffdnet.py::fused_apply
    # + ops/pallas_kernels.py::tv_denoise_chw_pallas); the floor stays
    # min-of-history by the formula, i.e. conservative across the step
    # changes.
    "pnp_deep": {"history": [305.9, 318.6, 313.6, 320.2, 326.2, 319.6,
                             406.6, 415.0, 404.9, 534.7, 563.6],
                 "jitter": 0.03},
}
R2_FLOORS = {k: round(min(v["history"]) * (1 - 2 * v["jitter"]), 1)
             for k, v in _FLOOR_DATA.items()}
R2_FLOORS["lp_fused_warm_s"] = round(1.423 * (1 + 2 * 0.02), 2)


def bench_paths():
    """its/s for the non-headline execution paths, each isolated so one
    failure doesn't hide the others' numbers."""
    import dprox_tpu as dp
    from dprox_tpu.contrib import csmri
    from dprox_tpu.utils import imaging

    paths = {}

    # PnP deep prior at the flagship quality config (single-net student
    # distilled from the x8 ensemble; falls back if weights missing)
    try:
        from dprox_tpu.proxfn.pnp.hub import find_weights
        flagship = ("distilled_color_tv"
                    if find_weights("distilled_ffdnet_color.msgpack")
                    else "res_ffdnet_color_tv")
        img = imaging.sample("face")[:, :, :512, :512]
        psf = imaging.point_spread_function(15, 5)
        b = imaging.blurring(img, psf)
        x = dp.Variable()
        solver = dp.compile([dp.sum_squares(dp.conv(x, psf) - b),
                             dp.deep_prior(x, flagship)], "admm")
        rhos, sigmas = dp.log_descent(80, 30, 48)
        med, obs = _marginal_its(
            lambda n: solver.solve(x0=b, max_iter=n, rhos=rhos[:n],
                                   lams=sigmas[:n]), 8, 48, estimates=3)
        paths["pnp_deep"] = {
            "config": flagship,
            "its_per_sec": round(med, 1), "obs": obs,
            "r2_floor": R2_FLOORS["pnp_deep"]}
    except Exception as e:
        paths["pnp_deep"] = {"error": repr(e)}

    # joint demosaic+deconv via preconditioned CG (40 inner iters)
    try:
        img2 = imaging.sample("face")[:, :, :256, :256]
        psf2 = imaging.point_spread_function(9, 2)
        b2 = imaging.mosaicing(imaging.blurring(img2, psf2))
        x2 = dp.Variable()
        data = dp.sum_squares(dp.mosaic(dp.conv(x2, psf2))
                              - dp.Placeholder("b"))
        solver = dp.compile(
            data + dp.deep_prior(x2, "tv"), "admm",
            linear_solve_config=dp.LinearSolveConfig(max_iters=40))
        init = dp.utils.demosaic_from_mosaiced(b2)
        rhos_j, sig_j = dp.log_descent(35, 10, 64)
        med, obs = _marginal_its(
            lambda n: solver.solve(x0=init, max_iter=n, rhos=rhos_j[:n],
                                   lams=sig_j[:n], params={"b": b2}),
            4, 64, estimates=5)
        paths["joint_dd_cg"] = {
            "its_per_sec": round(med, 1), "obs": obs,
            "span": "4-64", "statistic": "median_of_5",
            "r2_floor": R2_FLOORS["joint_dd_cg"]}
    except Exception as e:
        paths["joint_dd_cg"] = {"error": repr(e)}

    # CSMRI fused k-space prox (complex state). Per-iteration cost at
    # 256^2 is ~75us — a 40-iteration span is BELOW the relay's
    # call-to-call jitter (r2's 1737 and an early r3 155k were both
    # noise); the span must be wide enough that the marginal work
    # (~30 ms over 400 iters) dominates. Floor re-pinned accordingly.
    try:
        s = csmri.generate_sample(size=256, num_lines=60)
        xm = dp.Variable()
        y = dp.Placeholder("y")
        mask = dp.Placeholder("mask", batch=False)
        solver = dp.compile(dp.csmri(xm, mask, y)
                            + dp.deep_prior(xm, "tv", sqrt=True), "admm")
        rhos_c, sig_c = dp.log_descent(30, 5, 448, sigma=0.01)
        med, obs = _marginal_its(
            lambda n: solver.solve(x0=s["x0"], max_iter=n,
                                   rhos=rhos_c[:n], lams=sig_c[:n],
                                   params=s["params"],
                                   real_output=True), 48, 448, estimates=5)
        paths["csmri_fast"] = {
            "its_per_sec": round(med, 1), "obs": obs,
            "span": "48-448", "statistic": "median_of_5",
            "r2_floor": R2_FLOORS["csmri_fast"]}
    except Exception as e:
        paths["csmri_fast"] = {"error": repr(e)}

    # fused LP on the synthetic capacity-expansion instance
    try:
        from dprox_tpu.algo.lp import LPProblem, LPSolverADMM
        from dprox_tpu.contrib.energy_system import synthetic_cep_model

        c, A_ub, A_eq, b_ub, b_eq = synthetic_cep_model(512, 16)
        p = LPProblem(c, A_ub, b_ub, A_eq, b_eq, dtype=jnp.float32)
        sv = LPSolverADMM(dtype=jnp.float32, verbose=False)
        xlp, res_f = sv.solve_fused(p, max_iters=20000)  # compile+run
        float(np.asarray(xlp)[0])
        t0 = time.perf_counter()
        xlp, res_f = sv.solve_fused(p, max_iters=20000)
        float(np.asarray(xlp)[0])
        warm = time.perf_counter() - t0
        paths["lp_fused"] = {"warm_s": round(warm, 3),
                             "iters": int(res_f["iters"]),
                             "r2_floor_warm_s": R2_FLOORS["lp_fused_warm_s"]}
    except Exception as e:
        paths["lp_fused"] = {"error": repr(e)}
    return paths


def main():
    its_per_sec, out, img = bench_admm()
    k_star = iters_to_pd_residual()
    paths = bench_paths()
    # back-to-back r3 runs on the 100-iteration span measured 2764 /
    # 2717 / 2658 — ~2% relay jitter; the span is now 200 iterations and
    # values within 3% of the floor are run noise, not regression
    paths["deconv_fft"] = {"its_per_sec": round(its_per_sec, 1),
                           "r2_floor": R2_FLOORS["deconv_fft"],
                           "floor_jitter_pct": 3}
    baseline = reference_dprox_its_per_sec()
    baseline_kind = "reference_dprox_cpu"
    if baseline is None:
        baseline = torch_reference_its_per_sec()
        baseline_kind = "torch_equivalent_cpu"
    vs_baseline = its_per_sec / baseline if baseline else None
    print(json.dumps({
        "metric": "admm_iterations_per_sec_512x512_deconv",
        "value": round(its_per_sec, 2),
        "unit": "iters/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "baseline_its_per_sec": round(baseline, 2) if baseline else None,
        "baseline_kind": baseline_kind,
        "iters_to_pd_residual_1e-4": k_star,
        "wallclock_to_pd_residual_1e-4_s":
            round(k_star / its_per_sec, 4) if k_star else None,
        "baseline_wallclock_to_pd_residual_1e-4_s":
            round(k_star / baseline, 4) if (k_star and baseline) else None,
        "paths": paths,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
