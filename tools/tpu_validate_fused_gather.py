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
  3. statistical parity vs the batched-general chain: acceptance
     fraction within 0.03 and per-dim posterior mean/std of a 512-step
     run within 10% relative (different ulp streams => different
     trajectories, same posterior).

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
    # 512 steps by default; CHA1_VALIDATE_STAT_STEPS=4096 tightens the
    # comparison ~3x (the deviation is sampling noise ~ 1/sqrt(ESS), tau
    # ~ 45 on this posterior) at a few extra seconds of chip time.
    stat_steps = int(os.environ.get("CHA1_VALIDATE_STAT_STEPS", "512"))
    burn = max(64, stat_steps // 8)
    out["stat_steps"] = stat_steps
    gchain, _, gacc, (gpos, glnp) = run_ensemble(
        lnprob, pos0, lnp0, key, nsteps=stat_steps, batched=True)
    jax.block_until_ready(gchain)
    fchain5, _, facc5, _ = run_fused(pos0, lnp0_e, key, stat_steps)
    jax.block_until_ready(fchain5)
    g = np.asarray(gchain)[burn:].reshape(-1, 4)   # post-burn samples
    f5 = np.asarray(fchain5)[burn:].reshape(-1, 4)
    acc_g = float(np.mean(np.asarray(gacc))) / nwalkers
    acc_f = float(np.mean(np.asarray(facc5))) / nwalkers
    out["general_acceptance"] = round(acc_g, 4)
    out["fused_acceptance"] = round(acc_f, 4)
    mean_rel = np.abs(f5.mean(0) - g.mean(0)) / np.maximum(
        np.abs(g.mean(0)), 1e-30)
    std_rel = np.abs(f5.std(0) - g.std(0)) / np.maximum(g.std(0), 1e-30)
    out["posterior_mean_max_rel_dev"] = float(mean_rel.max())
    out["posterior_std_max_rel_dev"] = float(std_rel.max())
    gate3 = bool(abs(acc_g - acc_f) < 0.03 and mean_rel.max() < 0.10
                 and std_rel.max() < 0.10)
    out["gate3_statistical_parity"] = gate3

    # --- timings (bench.py methodology) ---------------------------------
    glnp = jnp.asarray(glnp)
    flnp = jnp.asarray(flnp)
    gs = _slope(lambda n, tag: run_ensemble(
        lnprob, gpos, glnp, jax.random.fold_in(key, tag), nsteps=n,
        batched=True)[0], 64, 256)
    fs = _slope(lambda n, tag: run_fused(
        fpos, flnp, jax.random.fold_in(key, tag), n)[0], 64, 256)
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
