"""Likelihood and posterior log-probability builders (jittable).

The reference evaluates lnprob one walker at a time in forked CPU worker
processes (reference inference.py:239-246, 456-463). Here `build_lnprob`
returns a pure scalar function of theta; callers vmap it over walkers and
jit the result — one fused device program per ensemble half-step.

Failure semantics: the reference converts exceptions and non-finite values
to -inf so the sampler rejects the proposal (reference inference.py:145-147,
153-155, 162-164, 241-245). Under jit there are no exceptions; the same
effect is obtained by mapping non-finite lnlike values to -inf.
"""

from __future__ import annotations

import jax.numpy as jnp

from cha1_mcmc_tpu.models.forward import SpectralModel
from cha1_mcmc_tpu.inference.params import ParamSpec

__all__ = ["build_lnlike", "build_lnprob"]


def build_lnlike(model: SpectralModel, spec: ParamSpec, grid_ints, grid_yerrs):
    """Scalar lnlike(theta) (reference inference.py:127-166).

    chi^2 form: -0.5 * sum[(y - m)^2 / sigma^2 - ln(1/sigma^2)].
    """
    y = jnp.asarray(grid_ints, dtype=model.dtype)
    yerrs = jnp.asarray(grid_yerrs, dtype=model.dtype)
    inv_sigma2 = 1.0 / (yerrs ** 2)

    def lnlike(theta):
        ss, Ncol, Tex, vlsr, dV = spec.unpack(jnp.asarray(theta, dtype=model.dtype))
        m = model.forward(ss, Ncol, Tex, vlsr, dV)
        ll = model.chi2_lnlike(m, y, inv_sigma2)
        # Non-finite model/likelihood -> reject (reference inference.py:162-164).
        return jnp.where(jnp.isfinite(ll), ll, -jnp.inf)

    return lnlike


def build_lnprob(model: SpectralModel, spec: ParamSpec, grid_ints, grid_yerrs, lnprior_fn):
    """Scalar lnprob(theta) = lnprior + lnlike (reference inference.py:239-246).

    -inf prior short-circuits in the reference; here both terms are computed
    (they are cheap and fused) and -inf propagates through the sum, with a
    guard so that -inf prior + NaN likelihood still yields -inf.
    """
    lnlike = build_lnlike(model, spec, grid_ints, grid_yerrs)

    def lnprob(theta):
        lp = lnprior_fn(theta)
        ll = lnlike(theta)
        total = lp + ll
        return jnp.where(jnp.isfinite(lp) & jnp.isfinite(ll), total, -jnp.inf)

    return lnprob
