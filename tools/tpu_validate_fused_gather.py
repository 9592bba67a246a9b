"""On-chip validation of the dense fused gather sampler (VERDICT r3 item 1).

Runs on the REAL TPU (keep PALLAS_AXON_REMOTE_COMPILE set so the relay
terminal-compiles; the first compile of the fused program is heavy —
~30-60 relay-minutes — and is then cached relay-side for the driver's
bench capture):

  1. build bench.py's dense-section problem (35,460-line
     1-cyanonaphthalene x 2048 channels);
  2. run the general sampler (lax.scan stretch move over the batched
     gather lnprob) for 64 steps;
  3. run the fused channel-major step kernel for 64 steps from the same
     position/key and require BITWISE trajectory equality (the contract
     sampler/fused_gather.py documents, previously gated only in CPU
     interpret mode);
  4. slope-time both chains (64 vs 256 steps, the same interleaved
     methodology as bench.py) and print one JSON line.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
      python tools/tpu_validate_fused_gather.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp

    from tools.aot_probe_fused_gather import _bench_dense_problem
    from cha1_mcmc_tpu.inference import single_component_lnprior
    from cha1_mcmc_tpu.inference.likelihood import build_lnprob_batched
    from cha1_mcmc_tpu.sampler import run_ensemble
    from cha1_mcmc_tpu.sampler.fused_gather import (
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

    t0 = time.perf_counter()
    gchain, _, gacc, (gpos, glnp) = run_ensemble(
        lnprob, pos0, lnp0, key, nsteps=64, batched=True)
    jax.block_until_ready(gchain)
    out["general_64_first_wall_s"] = round(time.perf_counter() - t0, 1)

    plan = plan_fused_gather(model, spec, bounds["dV"][1], nwalkers=nwalkers)
    assert plan is not None, "plan unexpectedly None at bench_dense size"
    out["plan"] = {k: int(plan[k]) for k in
                   ("wchunk", "cbo", "cbr", "n_bo", "n_br", "schunk",
                    "n_sb")}
    run_fused = make_fused_ensemble_gather(
        model, spec, ints, yerrs, bounds, prior_means, prior_stds,
        dv_max=bounds["dV"][1], nwalkers=nwalkers, plan=plan)
    t0 = time.perf_counter()
    fchain, _, facc, (fpos, flnp) = run_fused(pos0, lnp0, key, 64)
    jax.block_until_ready(fchain)
    out["fused_64_first_wall_s"] = round(time.perf_counter() - t0, 1)

    eq = bool(np.array_equal(np.asarray(gchain), np.asarray(fchain)))
    out["trajectory_bitwise_equal"] = eq
    if not eq:
        g, f = np.asarray(gchain), np.asarray(fchain)
        step = int(np.argmax((g != f).any(axis=(0, 2))))
        out["first_divergent_step"] = step
        out["max_rel_dev"] = float(np.max(np.abs(g - f)
                                          / (np.abs(g) + 1e-30)))
    out["general_acceptance"] = round(float(np.mean(np.asarray(gacc))), 4)
    out["fused_acceptance"] = round(float(np.mean(np.asarray(facc))), 4)

    # Slope timings, interleaved (CLAUDE.md: pairs interleaved so relay
    # load drift cancels; data dependence via carried pos/lnp).
    def time_chain(run, pos, lnp, nsteps, tag):
        t0 = time.perf_counter()
        c = run(pos, lnp, jax.random.fold_in(key, tag), nsteps)
        jax.block_until_ready(c[0])
        return time.perf_counter() - t0

    glnp = jnp.asarray(glnp)
    flnp = jnp.asarray(flnp)
    g64 = f64 = g256 = f256 = 0.0
    reps = 4
    for r in range(reps):
        g64 += time_chain(lambda p, l, k, n: run_ensemble(
            lnprob, p, l, k, nsteps=n, batched=True), gpos, glnp, 64,
            10 + r)
        f64 += time_chain(run_fused, fpos, flnp, 64, 10 + r)
        g256 += time_chain(lambda p, l, k, n: run_ensemble(
            lnprob, p, l, k, nsteps=n, batched=True), gpos, glnp, 256,
            20 + r)
        f256 += time_chain(run_fused, fpos, flnp, 256, 20 + r)
    gslope = (g256 - g64) / (reps * 192)
    fslope = (f256 - f64) / (reps * 192)
    out["general_us_per_step"] = round(gslope * 1e6, 2)
    out["fused_us_per_step"] = round(fslope * 1e6, 2)
    out["fused_speedup"] = round(gslope / fslope, 2)
    out["general_walker_steps_per_sec"] = round(nwalkers / gslope, 1)
    out["fused_walker_steps_per_sec"] = round(nwalkers / fslope, 1)
    print(json.dumps(out))
    return 0 if eq else 1


if __name__ == "__main__":
    raise SystemExit(main())
