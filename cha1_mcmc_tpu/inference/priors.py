"""Log-prior builders (jittable).

Reference semantics reproduced exactly:
  * hard box bounds with *strict* inequalities return -inf
    (reference inference.py:169-190);
  * Gaussian priors with normalization term ln(1/(sqrt(2 pi) sigma)), with
    sigma_vlsr overridden to 0.8 * mean_dV and sigma_dV to 0.3 * mean_dV
    (reference inference.py:200-201, 221-222);
  * flat (zero) prior on every Ncol (reference inference.py:208, 230,
    TMC1_four_component.py:260);
  * multi-component runs add velocity ordering constraints
    vlsr_i < vlsr_{i+1} - 0.05 and vlsr_{i+1} < vlsr_i + 0.3
    (reference TMC1_four_component.py:230-231).

In jitted code exceptions cannot signal invalid parameters, so the box
check is a `where(ok, value, -inf)` at the same decision points where the
reference returns -inf.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from cha1_mcmc_tpu.inference.params import ParamSpec

__all__ = ["single_component_lnprior", "ordered_velocity_lnprior"]

_NEG_INF = -jnp.inf


def _log_gauss(x, mean, std):
    return jnp.log(1.0 / (jnp.sqrt(2.0 * jnp.pi) * std)) - 0.5 * ((x - mean) ** 2 / std ** 2)


def _strictly_inside(x, lo, hi):
    return jnp.logical_and(x > lo, x < hi)


def single_component_lnprior(spec: ParamSpec, bounds: dict, prior_means, prior_stds,
                             weight: float = 1.0):
    """lnprior for the 4/5-dim single-component layouts
    (reference inference.py:193-236).

    `bounds` maps 'source_size' / 'Ncol' / 'Tex' / 'vlsr' / 'dV' to (lo, hi).
    `prior_means` / `prior_stds` follow the theta layout of `spec`.
    """
    assert spec.ncomp == 1
    means = np.asarray(prior_means, dtype=np.float64)
    stds = np.asarray(prior_stds, dtype=np.float64)
    free_ss = spec.free_source_size
    if free_ss:
        mean_ss, mean_Ncol, mean_Tex, mean_vlsr, mean_dV = means
        std_ss, std_Ncol, std_Tex, std_vlsr, std_dV = stds
    else:
        mean_Ncol, mean_Tex, mean_vlsr, mean_dV = means
        std_Ncol, std_Tex, std_vlsr, std_dV = stds
    # Velocity-related sigmas are relaxed relative to the loaded priors
    # (reference inference.py:200-201).
    std_vlsr = mean_dV * 0.8
    std_dV = mean_dV * 0.3

    def lnprior(theta):
        ss, Ncol, Tex, vlsr, dV = (t.squeeze(-1) if t.ndim and t.shape[-1] == 1 else t
                                   for t in spec.unpack(theta))
        ok = _strictly_inside(Ncol, *bounds["Ncol"])
        ok &= _strictly_inside(Tex, *bounds["Tex"])
        ok &= _strictly_inside(vlsr, *bounds["vlsr"])
        ok &= _strictly_inside(dV, *bounds["dV"])
        lp = (
            _log_gauss(Tex, mean_Tex, std_Tex)
            + _log_gauss(vlsr, mean_vlsr, std_vlsr)
            + _log_gauss(dV, mean_dV, std_dV)
        )  # Ncol prior is flat (reference inference.py:208)
        if free_ss:
            ok &= _strictly_inside(ss, *bounds["source_size"])
            lp = lp + _log_gauss(ss, mean_ss, std_ss)
        return jnp.where(ok, weight * lp, _NEG_INF)

    return lnprior


def ordered_velocity_lnprior(
    spec: ParamSpec,
    prior_means,
    prior_stds,
    *,
    ss_bounds=(0.0, 200.0),
    ncol_bounds=(0.0, 1e16),
    tex_min: float = 2.7,
    dv_max: float = 0.3,
    vlsr_min_sep: float = 0.05,
    vlsr_max_sep: float = 0.3,
):
    """lnprior for multi-component fits with ordered velocities
    (reference TMC1_four_component.py:224-268, defaults match its
    hardcoded bounds).

    Gaussian priors on source sizes, Tex, vlsr_i and dV; flat on Ncol
    (reference TMC1_four_component.py:255-268). sigma_vlsr_i = 0.8*mean_dV,
    sigma_dV = 0.3*mean_dV (reference :244-248).
    """
    assert spec.free_source_size
    n = spec.ncomp
    means = np.asarray(prior_means, dtype=np.float64)
    stds = np.asarray(prior_stds, dtype=np.float64)
    mean_ss, std_ss = means[0:n], stds[0:n]
    mean_Tex, std_Tex = means[2 * n], stds[2 * n]
    mean_vlsr = means[2 * n + 1: 3 * n + 1]
    mean_dV = means[3 * n + 1]
    std_vlsr = np.full(n, mean_dV * 0.8)
    std_dV = mean_dV * 0.3

    def lnprior(theta):
        ss, Ncol, Tex, vlsr, dV = spec.unpack(theta)
        ok = jnp.all(_strictly_inside(ss, *ss_bounds), axis=-1)
        ok &= jnp.all(_strictly_inside(Ncol, *ncol_bounds), axis=-1)
        if n > 1:
            ok &= jnp.all(vlsr[..., :-1] < vlsr[..., 1:] - vlsr_min_sep, axis=-1)
            ok &= jnp.all(vlsr[..., 1:] < vlsr[..., :-1] + vlsr_max_sep, axis=-1)
        ok &= dV < dv_max
        ok &= Tex > tex_min
        lp = (
            jnp.sum(_log_gauss(ss, mean_ss, std_ss), axis=-1)
            + _log_gauss(Tex, mean_Tex, std_Tex)
            + jnp.sum(_log_gauss(vlsr, mean_vlsr, std_vlsr), axis=-1)
            + _log_gauss(dV, mean_dV, std_dV)
        )
        return jnp.where(ok, lp, _NEG_INF)

    return lnprior
