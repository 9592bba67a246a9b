"""Forward models: LTE stick simulation and the on-grid emission model."""

from cha1_mcmc_tpu.models.forward import SpectralModel, simulate_sticks_host

__all__ = ["SpectralModel", "simulate_sticks_host"]
