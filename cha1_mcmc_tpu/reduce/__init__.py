"""Spectral data reduction (host-side NumPy, runs once per fit)."""

from cha1_mcmc_tpu.reduce.noise import calc_noise_std
from cha1_mcmc_tpu.reduce.datagrid import reduce_spectrum, load_datagrid, save_datagrid
from cha1_mcmc_tpu.reduce.converters import lis_to_array, velocity_to_frequency

__all__ = [
    "calc_noise_std",
    "reduce_spectrum",
    "load_datagrid",
    "save_datagrid",
    "lis_to_array",
    "velocity_to_frequency",
]
