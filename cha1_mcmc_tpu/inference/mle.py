"""Maximum-likelihood initialization of the column density.

Mirrors the reference's bounded scalar minimization of the negative
log-likelihood over Ncol with all other parameters pinned at their prior
means (reference inference.py:344-376): scipy.optimize.minimize_scalar
(method='bounded', xatol=1e-6) driving the *jitted* lnlike — each objective
evaluation is one device call instead of a full Python MolSim rebuild.
"""

from __future__ import annotations

import numpy as np
import jax
import scipy.optimize as opt

from cha1_mcmc_tpu.inference.params import ParamSpec

__all__ = ["estimate_ncol_mle"]


def estimate_ncol_mle(lnlike_fn, spec: ParamSpec, fixed_theta, ncol_bounds,
                      xatol: float = 1e-6) -> float:
    """Return the Ncol minimizing -lnlike with other params fixed.

    `fixed_theta` is a full theta vector whose Ncol entry is overwritten per
    trial (layout per `spec`; reference inference.py:354-359 builds the same
    trial vectors). Raises RuntimeError if the optimizer fails to converge
    (reference inference.py:371-373).
    """
    theta0 = np.asarray(fixed_theta, dtype=np.float64).copy()
    ncol_index = spec.ncomp if spec.free_source_size else 0
    if spec.ncomp != 1:
        raise ValueError("MLE init is defined for single-component fits")
    jitted = jax.jit(lnlike_fn)

    def nll(ncol):
        theta = theta0.copy()
        theta[ncol_index] = ncol
        return -float(jitted(theta))

    result = opt.minimize_scalar(nll, bounds=tuple(ncol_bounds), method="bounded",
                                 options={"xatol": xatol})
    if not result.success:
        raise RuntimeError("MLE for Ncol did not converge.")
    return float(result.x)
