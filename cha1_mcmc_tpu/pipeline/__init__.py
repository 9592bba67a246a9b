"""Run orchestration: typed config, fit driver, posterior reporting."""

from cha1_mcmc_tpu.pipeline.config import FitConfig
from cha1_mcmc_tpu.pipeline.fit import SpectralFit
from cha1_mcmc_tpu.pipeline.plotting import plot_results, summarize_posterior

__all__ = ["FitConfig", "SpectralFit", "plot_results", "summarize_posterior"]
