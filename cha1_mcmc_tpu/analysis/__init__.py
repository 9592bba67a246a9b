"""Analysis toolkit: the scientifically load-bearing capabilities of the
reference's interactive simulator (reference
spectral_simulator/simulate_lte.py), re-expressed as pure functions."""

from cha1_mcmc_tpu.analysis.stacking import (
    get_rms,
    find_nearest,
    find_sim_peaks,
    find_vel_peaks,
    cut_spectra,
    ObsChunk,
    velocity_stack,
    matched_filter,
)
from cha1_mcmc_tpu.analysis.tbg import calc_tbg
from cha1_mcmc_tpu.analysis.peaks import (find_peaks, find_obs_peaks,
                                           find_obs_brights)
from cha1_mcmc_tpu.analysis.fitting import gauss_func, gauss_fit, make_gauss_params
from cha1_mcmc_tpu.analysis.conversions import jy_to_k, k_to_jy, planck_k_to_jy
from cha1_mcmc_tpu.analysis.renderer import render_gaussian_profile
from cha1_mcmc_tpu.analysis.obs_tools import (
    subtract_baseline,
    write_spectrum,
    get_subtraction,
    residual_spectrum,
    find_limits,
)
from cha1_mcmc_tpu.analysis.independent import run_adaptive_metropolis
from cha1_mcmc_tpu.analysis.ulim import (
    get_obs_rms,
    get_sim_peak,
    upper_limit_column,
    find_best_ulim_lines,
)

__all__ = [
    "get_rms",
    "find_nearest",
    "find_sim_peaks",
    "ObsChunk",
    "velocity_stack",
    "matched_filter",
    "find_vel_peaks",
    "cut_spectra",
    "calc_tbg",
    "find_obs_peaks",
    "find_obs_brights",
    "subtract_baseline",
    "write_spectrum",
    "get_subtraction",
    "residual_spectrum",
    "find_limits",
    "get_obs_rms",
    "get_sim_peak",
    "upper_limit_column",
    "find_best_ulim_lines",
    "find_peaks",
    "gauss_func",
    "gauss_fit",
    "make_gauss_params",
    "jy_to_k",
    "k_to_jy",
    "planck_k_to_jy",
    "render_gaussian_profile",
    "run_adaptive_metropolis",
]
