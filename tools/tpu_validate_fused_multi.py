"""On-chip validation of the GOTHAM fused multi-component sampler.

Counterpart of tools/tpu_validate_fused_gather.py for
sampler/fused_multi.py (the 14-dim 4-component TMC-1 fit, reference
scripts/MCMC/TMC1_four_component.py). Its CPU interpret-mode gates prove
bitwise trajectory equality vs the general sampler; what only the chip
can prove is that the Mosaic-lowered program is healthy (this jax
version miscompiles some constructs silently — CLAUDE.md "Mosaic kernel
pitfalls") and what the real rate is. Gates, strongest-available first:

  1. lnprob parity: the in-kernel lnprob recorded along the fused chain
     agrees with the XLA batched gather lnprob re-evaluated at the SAME
     sampled positions to <= 1e-4 rel. This catches miscompiles
     directly (the documented signature is rel dev >> 1 from step 0).
  2. machinery equality (diagnostic): fused chain vs the general
     sampler over the same lnprob, same key. Bitwise equality is not
     guaranteed on-chip (Mosaic vs XLA ulps); healthy = equal for many
     steps then one accept-flip cascade, miscompiled = divergent at
     step 0 with large lnp deviation.
  3. statistical parity: acceptance within 0.03 and posterior mean/std
     of a CHA1_VALIDATE_STAT_STEPS-step run (default 512; 4096 tightens
     the sampling noise ~3x) within 10% relative.

Timings use bench.py's slope methodology (CLAUDE.md "Microbenchmark
trap" / "Fixed dispatch overhead").

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
      timeout 4500 python tools/tpu_validate_fused_multi.py
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REFERENCE_ROOT = "/root/reference"


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

    from cha1_mcmc_tpu import MultiFitConfig, MultiComponentFit
    from cha1_mcmc_tpu.inference import (build_lnprob_batched,
                                         ordered_velocity_lnprior)
    from cha1_mcmc_tpu.sampler import make_fused_ensemble_multi, run_ensemble

    out = {"device": str(jax.devices()[0])}
    # CPU smoke runs (tool-logic checks without a chip) need interpret mode
    interpret = jax.default_backend() != "tpu"
    out["interpret"] = interpret
    nwalkers = 128
    data = os.path.join(REFERENCE_ROOT, "data", "GOTHAM",
                        "hc9n_hfs_chunks.npy")
    with tempfile.TemporaryDirectory() as tmp:
        cfg = MultiFitConfig(
            mol_name="hc9n_hfs", template_run=True,
            cat_folder=os.path.join(REFERENCE_ROOT, "catalog"),
            data_path=data, fit_folder=tmp, nwalkers=nwalkers)
        fit = MultiComponentFit(cfg)
        with contextlib.redirect_stdout(sys.stderr):
            grid = fit.init_setup()
            model = fit.build_model(grid)
    means = np.asarray(cfg.template_means)
    stds = np.asarray(cfg.template_stds)
    lnprior = ordered_velocity_lnprior(fit.spec, means, stds)
    lnprob = build_lnprob_batched(model, fit.spec, grid.ints, grid.yerrs,
                                  lnprior, use_pallas=True,
                                  pallas_kernel="gather", dv_max=cfg.dv_bound)
    out["ndim"] = cfg.ndim

    rng = np.random.default_rng(7)
    pos0 = jnp.asarray(
        means + np.asarray(cfg.perturbation)
        * rng.standard_normal((nwalkers, cfg.ndim)), jnp.float32)
    lnp0 = lnprob(pos0)
    key = jax.random.PRNGKey(21)

    run_fused = make_fused_ensemble_multi(
        model, fit.spec, grid.ints, grid.yerrs, means, stds,
        dv_max=cfg.dv_bound, interpret=interpret)

    # --- gate 1: in-kernel lnprob parity at sampled positions ----------
    fchain, flnps, facc, (fpos, flnp) = run_fused(pos0, lnp0, key, 64)
    jax.block_until_ready(fchain)
    want = np.asarray(lnprob(fchain[-1]))
    got = np.asarray(flnps[-1])
    finite = np.isfinite(want)
    rel = np.abs(got[finite] - want[finite]) / np.maximum(
        np.abs(want[finite]), 1e-30)
    out["kernel_lnprob_max_rel_dev"] = float(rel.max())
    gate1 = bool(finite.any() and rel.max() < 1e-4
                 and np.array_equal(np.isfinite(got), finite))
    out["gate1_lnprob_parity"] = gate1

    # --- gate 2: machinery equality (diagnostic) ------------------------
    gchain64, _, _, _ = run_ensemble(lnprob, pos0, lnp0, key, nsteps=64,
                                     batched=True)
    jax.block_until_ready(gchain64)
    e, f = np.asarray(gchain64), np.asarray(fchain)
    eq = bool(np.array_equal(e, f))
    out["gate2_bitwise_vs_general_chain"] = eq
    if not eq:
        step = int(np.argmax((e != f).any(axis=(1, 2))))
        out["first_divergent_step"] = step
        out["n_divergent_walker_steps"] = int((e != f).any(axis=2).sum())

    # --- gate 3: statistical parity -------------------------------------
    stat_steps = int(os.environ.get("CHA1_VALIDATE_STAT_STEPS", "512"))
    burn = max(64, stat_steps // 8)
    out["stat_steps"] = stat_steps
    gchain, _, gacc, (gpos, glnp) = run_ensemble(
        lnprob, pos0, lnp0, key, nsteps=stat_steps, batched=True)
    jax.block_until_ready(gchain)
    fchain5, _, facc5, _ = run_fused(pos0, lnp0, key, stat_steps)
    jax.block_until_ready(fchain5)
    g = np.asarray(gchain)[burn:].reshape(-1, cfg.ndim)
    f5 = np.asarray(fchain5)[burn:].reshape(-1, cfg.ndim)
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

    # --- timings ---------------------------------------------------------
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
