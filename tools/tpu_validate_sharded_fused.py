"""On-chip (interpret=False) validation of the fused-sharded compositions.

VERDICT r4 item 4: parallel/sharded_fused.py's three composed half-step
programs — the fused dense-grid, fused channel-major gather, and fused
multi-component kernels each run per-device between the two per-step
all_gathers — had only ever compiled in Pallas interpret mode on virtual
CPU devices (tests/test_parallel.py, dryrun_multichip). This codebase has
twice seen interpret-exact kernels be Mosaic-WRONG on hardware (the
lane-axis dynamic-slice miscompile and the scoped-VMEM terminal-compile
failures, CLAUDE.md), so each composition deserves one real-TPU run.

On a 1-device ('chains'=1, 'walkers'=1, 'lines'=1) mesh the collectives
are degenerate but the Pallas half-step programs are the REAL per-device
programs any mesh runs — this validates the Mosaic compilation and
numerics of the composition; multi-device execution semantics are gated
by the CPU-mesh tests and the driver's dryrun_multichip.

Per composition, against the general sharded runner (the same mesh
program the sharded pipeline uses, XLA ops only) on the same PRNG stream:

  gate A (lnp parity): final-state lnp within 1e-4 relative — entry
      formulations are shared, so in-chain lnp disagreement beyond ulp
      scale is the miscompile signature (the r4 lane-axis bug showed
      lnp rel dev 16.5 from step 0).
  gate B (acceptance): total accepted moves within 3% of steps*walkers.
  gate C (posterior smoke): per-dim mean/std of the 256-step chain
      within 10% of the general sharded chain's (different ulp streams
      may diverge trajectories; same posterior).
  diagnostic: first divergent step of the walker trajectories (bitwise
      equality is expected for the HC5N-size kernels, which matched
      bitwise on-chip in rounds 2-4; ulp-level late-step divergence is
      healthy, step-0 divergence is not).

Also records the composed step time at two run lengths (slope, CLAUDE.md
methodology) — the upper bound on what the composition costs vs the
single-device fused chain.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site timeout 5400 \
      python tools/tpu_validate_sharded_fused.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NWALKERS = 128
N1, N2 = 64, 256


def _slope(run, n_pairs=3):
    """Per-step seconds from two fixed-length runners (N1, N2 steps)."""
    import jax

    run1, run2 = run
    jax.block_until_ready(run1(0))
    jax.block_until_ready(run2(0))
    t1 = t2 = float("inf")
    for rep in range(n_pairs):
        t0 = time.perf_counter()
        jax.block_until_ready(run1(2 * rep + 1))
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(run2(2 * rep + 2))
        t2 = min(t2, time.perf_counter() - t0)
    return (t2 - t1) / (N2 - N1)


def _gate(name, out, run_general, run_fused, pos0, key, ndim):
    """Run general + fused composed runners at N2 steps; apply gates."""
    import jax

    res = {}
    cg, lg, ag, (pg, lpg) = run_general(pos0, key)
    jax.block_until_ready(cg)
    t0 = time.perf_counter()
    cf, lf, af, (pf, lpf) = run_fused(pos0, key)
    jax.block_until_ready(cf)
    res["first_run_seconds"] = round(time.perf_counter() - t0, 1)

    lpg_, lpf_ = np.asarray(lpg, np.float64), np.asarray(lpf, np.float64)
    rel = np.abs(lpf_ - lpg_) / np.maximum(np.abs(lpg_), 1e-30)
    res["final_lnp_max_rel_dev"] = float(rel.max())
    gate_a = bool(rel.max() < 1e-4)

    acc_g = float(np.asarray(ag, np.float64).sum())
    acc_f = float(np.asarray(af, np.float64).sum())
    denom = N2 * NWALKERS
    res["general_acceptance"] = round(acc_g / denom, 4)
    res["fused_acceptance"] = round(acc_f / denom, 4)
    gate_b = bool(abs(acc_g - acc_f) / denom < 0.03)

    g = np.asarray(cg)[:, N2 // 4:, :].reshape(-1, ndim).astype(np.float64)
    f = np.asarray(cf)[:, N2 // 4:, :].reshape(-1, ndim).astype(np.float64)
    mean_rel = np.abs(f.mean(0) - g.mean(0)) / np.maximum(
        np.abs(g.mean(0)), 1e-30)
    std_rel = np.abs(f.std(0) - g.std(0)) / np.maximum(g.std(0), 1e-30)
    res["posterior_mean_max_rel_dev"] = float(mean_rel.max())
    res["posterior_std_max_rel_dev"] = float(std_rel.max())
    gate_c = bool(mean_rel.max() < 0.10 and std_rel.max() < 0.10)

    e, fch = np.asarray(cg), np.asarray(cf)
    if np.array_equal(e, fch):
        res["trajectory"] = "bitwise-identical"
    else:
        div = (e != fch).any(axis=(0, 2))
        res["trajectory"] = "diverged"
        res["first_divergent_step"] = int(np.argmax(div))
        res["divergent_steps"] = int(div.sum())

    res["gate_a_lnp_parity"] = gate_a
    res["gate_b_acceptance"] = gate_b
    res["gate_c_posterior_smoke"] = gate_c
    res["ok"] = gate_a and gate_b and gate_c
    out[name] = res
    return res["ok"]


def main():
    # CHA1_VALIDATE_INTERPRET=1: CPU smoke of this validator itself
    # (Pallas interpret mode; N1/N2 shrink so the scan is CPU-feasible).
    interpret = os.environ.get("CHA1_VALIDATE_INTERPRET") == "1"
    global N1, N2
    if interpret:
        N1, N2 = 8, 24
    if os.environ.get("CHA1_PLATFORM") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")  # before backend init
        jax.config.update("jax_num_cpu_devices",
                          int(os.environ.get("CHA1_CPU_DEVICES", "1")))

    import jax
    import jax.numpy as jnp

    from cha1_mcmc_tpu.parallel import make_mesh
    from cha1_mcmc_tpu.parallel.sharded import make_sharded_runner
    from cha1_mcmc_tpu.parallel.sharded_fused import (
        make_fused_gather_sharded_runner, make_fused_multi_sharded_runner,
        make_fused_sharded_runner, plan_fused_gather_sharded)
    from __graft_entry__ import _flagship_problem

    out = {"device": str(jax.devices()[0]),
           "mesh": "1-device ('chains','walkers','lines') = (1,1,1)"}
    mesh = make_mesh(1, 1)
    ok = True

    # ---- HC5N flagship problem: fused + fused-gather compositions ------
    model, spec, lnprior, ints, yerrs = _flagship_problem()
    bounds = {"Ncol": (1e8, 1e14), "Tex": (3.5, 12.0),
              "vlsr": (3.0, 5.5), "dV": (0.4, 1.5)}
    means = np.array([3.4e10, 8.0, 4.3, 0.7575])
    stds = np.array([0.34e10, 3.0, 0.06, 0.22])
    rng = np.random.default_rng(0)
    pos0 = np.array([3.24e12, 7.5, 4.11, 0.78]) * (
        1 + 0.01 * rng.standard_normal((NWALKERS, 4)))
    key = jax.random.PRNGKey(5)

    gen = {n: make_sharded_runner(model, spec, ints, yerrs, lnprior,
                                  mesh, n) for n in (N1, N2)}
    fused = {n: make_fused_sharded_runner(
        model, spec, ints, yerrs, lnprior, bounds, means, stds, mesh, n,
        interpret=interpret) for n in (N1, N2)}
    ok &= _gate("fused_sharded_hc5n", out, gen[N2], fused[N2], pos0, key, 4)
    s = _slope((lambda t: fused[N1](pos0, jax.random.fold_in(key, t))[0],
                lambda t: fused[N2](pos0, jax.random.fold_in(key, t))[0]))
    out["fused_sharded_hc5n"]["us_per_step"] = round(s * 1e6, 2)

    gplan = plan_fused_gather_sharded(model, spec, mesh, NWALKERS, 1.5)
    if gplan is None:
        out["fused_gather_sharded_hc5n"] = {
            "ok": False, "error": "plan unexpectedly None"}
        ok = False
    else:
        fg = {n: make_fused_gather_sharded_runner(
            model, spec, ints, yerrs, bounds, means, stds, mesh, n,
            nwalkers=NWALKERS, dv_max=1.5, plan=gplan,
            interpret=interpret) for n in (N1, N2)}
        ok &= _gate("fused_gather_sharded_hc5n", out, gen[N2], fg[N2],
                    pos0, key, 4)
        s = _slope((lambda t: fg[N1](pos0, jax.random.fold_in(key, t))[0],
                    lambda t: fg[N2](pos0, jax.random.fold_in(key, t))[0]))
        out["fused_gather_sharded_hc5n"]["us_per_step"] = round(s * 1e6, 2)

    # ---- GOTHAM 14-dim problem: fused-multi composition ----------------
    import tempfile

    from cha1_mcmc_tpu import MultiFitConfig, MultiComponentFit
    from cha1_mcmc_tpu.inference import ordered_velocity_lnprior

    data = os.path.join("/root/reference", "data", "GOTHAM",
                        "hc9n_hfs_chunks.npy")
    with tempfile.TemporaryDirectory() as tmp:
        cfg = MultiFitConfig(
            mol_name="hc9n_hfs", template_run=True,
            cat_folder="/root/reference/catalog", data_path=data,
            fit_folder=tmp, nwalkers=NWALKERS)
        fit = MultiComponentFit(cfg)
        import contextlib, io
        with contextlib.redirect_stdout(io.StringIO()):
            grid = fit.init_setup()
            mmodel = fit.build_model(grid)
    mlnprior = ordered_velocity_lnprior(fit.spec,
                                        np.asarray(cfg.template_means),
                                        np.asarray(cfg.template_stds))
    mpos0 = np.asarray(cfg.template_means) + np.asarray(
        cfg.perturbation) * rng.standard_normal((NWALKERS, cfg.ndim))
    mgen = {n: make_sharded_runner(mmodel, fit.spec, grid.ints, grid.yerrs,
                                   mlnprior, mesh, n) for n in (N1, N2)}
    fm = {n: make_fused_multi_sharded_runner(
        mmodel, fit.spec, grid.ints, grid.yerrs, mlnprior,
        np.asarray(cfg.template_means), np.asarray(cfg.template_stds),
        mesh, n, nwalkers=NWALKERS, dv_max=cfg.dv_bound,
        interpret=interpret) for n in (N1, N2)}
    ok &= _gate("fused_multi_sharded_gotham", out, mgen[N2], fm[N2],
                mpos0, key, cfg.ndim)
    s = _slope((lambda t: fm[N1](mpos0, jax.random.fold_in(key, t))[0],
                lambda t: fm[N2](mpos0, jax.random.fold_in(key, t))[0]))
    out["fused_multi_sharded_gotham"]["us_per_step"] = round(s * 1e6, 2)

    out["ok"] = bool(ok)
    print(json.dumps(out))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
