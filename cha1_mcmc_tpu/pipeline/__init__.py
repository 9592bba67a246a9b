"""Run orchestration: typed config, fit driver, posterior reporting."""

from cha1_mcmc_tpu.pipeline.config import FitConfig
from cha1_mcmc_tpu.pipeline.fit import SpectralFit
from cha1_mcmc_tpu.pipeline.multifit import MultiFitConfig, MultiComponentFit
from cha1_mcmc_tpu.pipeline.batch import fit_molecules
from cha1_mcmc_tpu.pipeline.presets import PRESETS, load_preset
from cha1_mcmc_tpu.pipeline.plotting import plot_results, summarize_posterior

__all__ = [
    "FitConfig",
    "SpectralFit",
    "MultiFitConfig",
    "MultiComponentFit",
    "fit_molecules",
    "PRESETS",
    "load_preset",
    "plot_results",
    "summarize_posterior",
]
