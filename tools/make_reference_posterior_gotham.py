"""Golden 14-dim GOTHAM reference posterior for the 1% parity gate.

Samples the reference's own 4-component TMC-1 lnprob stack (the frozen
script executed in place — reference scripts/MCMC/TMC1_four_component.py:
185-246, with its read_file reduction of the shipped hc9n_hfs GOTHAM
datagrid) with the NumPy emcee-v3 stretch move, long enough that the
Monte-Carlo error of every gated statistic is well below the 1% gate
(the binding stat is the std; the gate widens it by the measured ESS,
mirroring tests/test_pipeline.py::test_posterior_statistical_parity).

Writes tests/golden/gotham_reference_posterior.json. Statistics fields
are deterministic (fixed seeds); wall_seconds varies.

Usage: PYTHONPATH=/root/repo python tools/make_reference_posterior_gotham.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

NWALKERS = 256
NSTEPS = 4_000
BURN = 1_000
SEED_INIT = 0
SEED_CHAIN = 1
PARAMS = ["ss1", "ss2", "ss3", "ss4", "Ncol1", "Ncol2", "Ncol3", "Ncol4",
          "Tex", "vlsr1", "vlsr2", "vlsr3", "vlsr4", "dV"]
# Reference TMC1_four_component.py:393-403 template priors.
MEANS = np.array([37, 25, 56, 22, 2.47e12, 11.19e12, 2.20e12, 5.64e12,
                  6.7, 5.624, 5.790, 5.910, 6.033, 0.117])
STDS = np.array([2.5, 2.0, 6.5, 2.0, 0.30e12, 1.75e12, 0.265e12, 1.185e12,
                 0.1, 0.0015, 0.001, 0.0035, 0.002, 0.002])


def main():
    from tests import reference_oracle
    from tests.test_convergence import _numpy_stretch_sampler
    from tests.test_likelihood import _gotham_datagrid

    tmc1 = reference_oracle.load_reference_tmc1()
    classes = reference_oracle.load_reference()[0]
    catfile = "/root/reference/catalog/hc9n_hfs.cat"
    datagrid, _, _ = _gotham_datagrid(tmc1, classes, catfile)
    mol_cat = classes.MolCat("hc9n_hfs", catfile)

    def lnprob_ref(theta):
        return tmc1.lnprob(theta, datagrid, mol_cat, STDS, MEANS)

    # Walker ball: the multifit pipeline's fixed-perturbation init
    # (reference TMC1_four_component.py:330-334 style), velocities kept
    # ordered so every walker starts in-support.
    rng = np.random.default_rng(SEED_INIT)
    pert = np.concatenate([np.full(4, 1e-1), 0.1 * MEANS[4:8],
                           [1e-3], np.full(4, 1e-4), [1e-4]])
    pos0 = MEANS + pert * rng.standard_normal((NWALKERS, 14))
    pos0[:, 9:13] = np.sort(pos0[:, 9:13], axis=1)

    t0 = time.perf_counter()
    chain = _numpy_stretch_sampler(lnprob_ref, pos0, NSTEPS, seed=SEED_CHAIN)
    dt = time.perf_counter() - t0

    flat = chain[BURN:].reshape(-1, 14)
    from cha1_mcmc_tpu.sampler.diagnostics import autocorr_time
    wsd = chain[BURN:].transpose(1, 0, 2)  # (W, S, D)
    tau = autocorr_time(wsd)
    ess = wsd.shape[0] * wsd.shape[1] / tau
    kurt = np.mean(((flat - flat.mean(0)) / flat.std(0)) ** 4, axis=0)
    out = {
        "provenance": {
            "generator": "tools/make_reference_posterior_gotham.py",
            "lnprob": "reference TMC1_four_component.lnprob executed in "
                      "place (reference scripts/MCMC/"
                      "TMC1_four_component.py:185-246)",
            "data": "reference data/GOTHAM/hc9n_hfs_chunks.npy re-reduced "
                    "through the reference's own read_file",
            "sampler": "NumPy emcee-v3 stretch move "
                       "(tests/test_convergence.py:_numpy_stretch_sampler)",
            "nwalkers": NWALKERS, "nsteps": NSTEPS, "burn": BURN,
            "seed_init": SEED_INIT, "seed_chain": SEED_CHAIN,
            "wall_seconds": round(dt, 1),
        },
        "params": PARAMS,
        "prior_means": MEANS.tolist(),
        "prior_stds": STDS.tolist(),
        "mean": {p: float(flat[:, i].mean()) for i, p in enumerate(PARAMS)},
        "std": {p: float(flat[:, i].std()) for i, p in enumerate(PARAMS)},
        "p16": {p: float(np.percentile(flat[:, i], 16)) for i, p in enumerate(PARAMS)},
        "p50": {p: float(np.percentile(flat[:, i], 50)) for i, p in enumerate(PARAMS)},
        "p84": {p: float(np.percentile(flat[:, i], 84)) for i, p in enumerate(PARAMS)},
        "ess": {p: float(ess[i]) for i, p in enumerate(PARAMS)},
        "tau": {p: float(tau[i]) for i, p in enumerate(PARAMS)},
        "kurtosis": {p: float(kurt[i]) for i, p in enumerate(PARAMS)},
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tests", "golden", "gotham_reference_posterior.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(f"wrote {path} ({dt:.0f}s)")
    for p in PARAMS:
        print(f"  {p}: mean {out['mean'][p]:.6e}  std {out['std'][p]:.6e}  "
              f"ess {out['ess'][p]:.0f}")


if __name__ == "__main__":
    main()
