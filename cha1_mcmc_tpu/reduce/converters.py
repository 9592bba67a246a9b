"""Observed-spectrum format converters.

Ports of the DSN_pipeline notebook's converters (reference
notebooks/DSN_pipeline.ipynb cells 0-11):
  * CASSIS `.lis` ASCII (3 header lines; column 0 frequency in MHz,
    column 4 intensity) -> (2, N) array;
  * velocity-space spectra -> frequency space via nu = nu_rest (1 - v/c).
"""

from __future__ import annotations

import numpy as np

from cha1_mcmc_tpu.constants import CKM

__all__ = ["lis_to_array", "ascii_to_array", "velocity_to_frequency"]


def lis_to_array(path: str, skip_header: int = 3) -> np.ndarray:
    """Parse a CASSIS .lis file to a (2, N) [freq_MHz, intensity] array."""
    rows = np.genfromtxt(path, skip_header=skip_header)
    return np.vstack([rows[:, 0], rows[:, 4]])


def ascii_to_array(path: str, freq_col: int = 0, int_col: int = 1,
                   skip_header: int = 0) -> np.ndarray:
    """Parse a whitespace-separated frequency-space ASCII spectrum."""
    rows = np.genfromtxt(path, skip_header=skip_header)
    return np.vstack([rows[:, freq_col], rows[:, int_col]])


def velocity_to_frequency(velocities_kms: np.ndarray, rest_freq_mhz: float) -> np.ndarray:
    """nu = nu_rest * (1 - v / c) (reference DSN_pipeline.ipynb cell 9)."""
    return rest_freq_mhz * (1.0 - np.asarray(velocities_kms, dtype=np.float64) / CKM)
