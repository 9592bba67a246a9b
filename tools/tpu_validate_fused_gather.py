"""On-chip validation of the dense fused gather sampler (VERDICT r3 item 1).

What can and cannot be bitwise here: the fused kernel's lnprob walks the
channel axis heavy-first-permuted and block-tiled, so its chi^2 sum is a
REASSOCIATION of the batched split-gather lnprob's — f32-ulp-level lnp
differences are the kernel's documented contract
(sampler/fused_gather.py module docstring), and over a 64-step stretch
chain a single flipped accept decision diverges trajectories entirely.
The round-4 first-compile "wrong trajectories" verdict was this gate
artifact: the same run showed matching acceptance (70.70 vs 70.66) and
the isolated in-kernel lnprob matches the reference to 2e-7.

So this validator gates three things, strongest-available first:

  1. lnprob parity: the kernel's ENTRY lnprob (the same
     _make_gather_lnprob numerics on plain arrays) and the in-kernel
     value agree with the batched split-gather lnprob to <= 1e-4 rel.
  2. machinery equality (diagnostic): the fused chain vs run_ensemble
     driven by the entry lnprob — the same reduction order. Bitwise
     equality here additionally requires Mosaic and XLA to compile the
     identical expression tree to identical ulps, which is NOT
     guaranteed (fusion/fma differences); what separates "healthy" from
     "miscompiled" is the divergence SHAPE. Measured 2026-08-19
     (block-stacked kernel): identical through step 48 of 64, then one
     ulp-level accept flip cascades — healthy. The broken lane-axis
     formulation: divergent at step 0, lnp rel dev 16.5 — miscompile.
  3. statistical parity vs the batched-general chain, with the SAME
     MC-error-calibrated tolerance scheme as the repo's golden posterior
     gates (tests/test_pipeline.py GOTHAM/HC5N pattern, VERDICT r4
     item 6): the two chains are independent MC estimates of the same
     posterior, so each per-dim mean must agree within
     max(1%, 3*sigma_MC) where sigma_MC^2 sums std^2*tau/(W*N) over both
     chains, and each std within max(1%, 3*sqrt(sum (kappa-1)/(4*ESS)))
     — replacing round 4's flat 10%/512-step smoke with a calibrated
     gate over a 2048-step chain (a length the bench slope runs already
     keep warm relay-side).

Timings use bench.py's methodology (two lengths, tag-varied inputs, min
of reps — CLAUDE.md "Microbenchmark trap" / "Fixed dispatch overhead").

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
      timeout 4500 python tools/tpu_validate_fused_gather.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _slope(run, n1, n2, reps=3):
    import jax

    jax.block_until_ready(run(n1, 0))
    jax.block_until_ready(run(n2, 0))
    t1 = t2 = float("inf")
    for rep in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(n1, 2 * rep + 1))
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(run(n2, 2 * rep + 2))
        t2 = min(t2, time.perf_counter() - t0)
    return (t2 - t1) / (n2 - n1)


def main():
    import jax
    import jax.numpy as jnp

    from tools.aot_probe_fused_gather import _bench_dense_problem
    from cha1_mcmc_tpu.inference import single_component_lnprior
    from cha1_mcmc_tpu.inference.likelihood import build_lnprob_batched
    from cha1_mcmc_tpu.sampler import run_ensemble
    from cha1_mcmc_tpu.sampler.fused_gather import (
        _make_gather_lnprob, gather_statics_tables,
        make_fused_ensemble_gather, plan_fused_gather)

    out = {"device": str(jax.devices()[0])}
    model, spec, ints, yerrs, bounds, prior_means, prior_stds = (
        _bench_dense_problem())
    nwalkers = 128
    lnprior = single_component_lnprior(spec, bounds, prior_means, prior_stds)
    lnprob = build_lnprob_batched(model, spec, ints, yerrs, lnprior,
                                  use_pallas=True, dv_max=bounds["dV"][1])

    rng = np.random.default_rng(3)
    pos0 = jnp.asarray(np.array([3.24e12, 7.5, 5.8, 0.78])
                       * (1 + 0.01 * rng.standard_normal((nwalkers, 4))),
                       jnp.float32)
    lnp0 = lnprob(pos0)
    key = jax.random.PRNGKey(12)

    plan = plan_fused_gather(model, spec, bounds["dV"][1], nwalkers=nwalkers)
    assert plan is not None, "plan unexpectedly None at bench_dense size"
    out["plan"] = {k: int(plan[k]) for k in
                   ("wchunk", "cblock", "n_bo", "n_br", "schunk", "n_sb")}

    # --- gate 1: lnprob parity (entry lnprob vs batched reference) -----
    statics, dev = gather_statics_tables(
        model, spec, ints, yerrs, bounds, prior_means, prior_stds, plan)
    entry = _make_gather_lnprob(*dev, **statics)          # plain arrays
    lnprob_entry = jax.jit(lambda th: entry(th)[:, 0])
    want = np.asarray(lnp0)
    got = np.asarray(lnprob_entry(pos0))
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-30)
    out["entry_lnprob_max_rel_dev"] = float(rel.max())
    gate1 = bool(rel.max() < 1e-4)
    out["gate1_lnprob_parity"] = gate1

    # --- gate 2: machinery equality (same reduction order) -------------
    lnp0_e = lnprob_entry(pos0)
    echain, _, eacc, (epos, elnp) = run_ensemble(
        lnprob_entry, pos0, lnp0_e, key, nsteps=64, batched=True)
    jax.block_until_ready(echain)

    run_fused = make_fused_ensemble_gather(
        model, spec, ints, yerrs, bounds, prior_means, prior_stds,
        dv_max=bounds["dV"][1], nwalkers=nwalkers, plan=plan)
    fchain, _, facc, (fpos, flnp) = run_fused(pos0, lnp0_e, key, 64)
    jax.block_until_ready(fchain)
    eq = bool(np.array_equal(np.asarray(echain), np.asarray(fchain)))
    out["gate2_bitwise_vs_entry_chain"] = eq
    if not eq:
        e, f = np.asarray(echain), np.asarray(fchain)
        step = int(np.argmax((e != f).any(axis=(1, 2))))
        out["first_divergent_step"] = step
        out["n_divergent_walker_steps"] = int((e != f).any(axis=2).sum())

    # --- gate 3: statistical parity vs the batched-general chain -------
    # MC-error-calibrated (VERDICT r4 item 6): 2048 steps by default —
    # a run length bench.py's slope runs keep warm relay-side; tau ~ 45
    # on this posterior so each chain carries ~5k effective samples.
    from cha1_mcmc_tpu.sampler.diagnostics import autocorr_time

    stat_steps = int(os.environ.get("CHA1_VALIDATE_STAT_STEPS", "2048"))
    burn = max(64, stat_steps // 8)
    out["stat_steps"] = stat_steps
    gchain, _, gacc, (gpos, glnp) = run_ensemble(
        lnprob, pos0, lnp0, key, nsteps=stat_steps, batched=True)
    jax.block_until_ready(gchain)
    fchain5, _, facc5, _ = run_fused(pos0, lnp0_e, key, stat_steps)
    jax.block_until_ready(fchain5)
    gpost = np.asarray(gchain)[:, burn:, :].astype(np.float64)
    fpost = np.asarray(fchain5)[:, burn:, :].astype(np.float64)
    g = gpost.reshape(-1, 4)                       # post-burn samples
    f5 = fpost.reshape(-1, 4)
    acc_g = float(np.mean(np.asarray(gacc))) / nwalkers
    acc_f = float(np.mean(np.asarray(facc5))) / nwalkers
    out["general_acceptance"] = round(acc_g, 4)
    out["fused_acceptance"] = round(acc_f, 4)
    # Per-chain MC-error ingredients: ESS = W*N/tau per dim; the sampling
    # error of a posterior mean is std*sqrt(1/ESS), of a posterior std is
    # std*sqrt((kappa-1)/(4*ESS)) — summed in quadrature over the two
    # independent chains, 3-sigma, floored at 1% (the golden-gate scheme,
    # tests/test_pipeline.py:test_posterior_statistical_parity_gotham).
    gate3 = True
    for stat in ("mean", "std"):
        tol, dev = [], []
        for post, flat in ((gpost, g), (fpost, f5)):
            tau = autocorr_time(post)
            ess = post.shape[0] * post.shape[1] / tau
            kurt = np.mean(((flat - flat.mean(0)) / flat.std(0)) ** 4, 0)
            var_rel = ((flat.std(0) / np.abs(flat.mean(0))) ** 2 / ess
                       if stat == "mean" else (kurt - 1) / (4 * ess))
            tol.append(var_rel)
        rtol = np.maximum(0.01, 3 * np.sqrt(tol[0] + tol[1]))
        a = g.mean(0) if stat == "mean" else g.std(0)
        b = f5.mean(0) if stat == "mean" else f5.std(0)
        rel = np.abs(b - a) / np.maximum(np.abs(a), 1e-30)
        out[f"posterior_{stat}_max_rel_dev"] = float(rel.max())
        out[f"posterior_{stat}_rtol_3sigma_mc"] = [round(float(r), 4)
                                                   for r in rtol]
        gate3 = gate3 and bool((rel <= rtol).all())
    gate3 = gate3 and abs(acc_g - acc_f) < 0.03
    out["gate3_statistical_parity_mc_calibrated"] = gate3

    # --- timings (bench.py methodology) ---------------------------------
    glnp = jnp.asarray(glnp)
    flnp = jnp.asarray(flnp)
    # General at (64, 256): ~100-130 us/step resolves 192 steps fine.
    # Fused at (2048, 8192) — bench.py's dense lengths, so the programs
    # are warm relay-side: at ~20 us/step a 192-step difference is ~4 ms,
    # inside dispatch noise (a negative and an unphysical slope were both
    # observed at short lengths); 6144 steps is ~120 ms of real work.
    gs = _slope(lambda n, tag: run_ensemble(
        lnprob, gpos, glnp, jax.random.fold_in(key, tag), nsteps=n,
        batched=True)[0], 64, 256)
    fs = _slope(lambda n, tag: run_fused(
        fpos, flnp, jax.random.fold_in(key, tag), n)[0], 2048, 8192)
    out["general_us_per_step"] = round(gs * 1e6, 2)
    out["fused_us_per_step"] = round(fs * 1e6, 2)
    out["fused_speedup"] = round(gs / fs, 2)
    out["general_walker_steps_per_sec"] = round(nwalkers / gs, 1)
    out["fused_walker_steps_per_sec"] = round(nwalkers / fs, 1)

    ok = gate1 and gate3            # gate 2 reported; reassociation-free
    out["ok"] = ok
    print(json.dumps(out))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
