"""Affine-invariant ensemble MCMC on device."""

from cha1_mcmc_tpu.sampler.stretch import EnsembleSampler, run_ensemble
from cha1_mcmc_tpu.sampler.chain import (
    save_chain,
    load_chain,
    last_position,
    chain_to_priors,
    initialize_walkers,
)

__all__ = [
    "EnsembleSampler",
    "run_ensemble",
    "save_chain",
    "load_chain",
    "last_position",
    "chain_to_priors",
    "initialize_walkers",
]
