"""Peak finding in observed spectra.

Equivalent of the reference's find_peaks (reference
spectral_simulator/simulate_lte.py:4207-4245): peaks above sigma * clipped
rms, separated by at least half a linewidth. The reference uses
peakutils.indexes (threshold as a fraction of the normalized span +
min_dist); scipy.signal.find_peaks with height/distance implements the same
selection.
"""

from __future__ import annotations

import numpy as np
from scipy import signal

from cha1_mcmc_tpu.constants import CKM
from cha1_mcmc_tpu.analysis.stacking import get_rms

__all__ = ["find_peaks"]


def find_peaks(frequency, intensity, fwhm: float, sigma: float = 3.0,
               width_tweak: float = 1.0):
    """Indices of peaks above sigma * rms, plus the rms.

    fwhm is the linewidth in km/s; peaks must be separated by at least half
    the linewidth in channels (reference :4242 min_dist=fwhm_chan*0.5).
    """
    frequency = np.asarray(frequency, dtype=np.float64)
    intensity = np.asarray(intensity, dtype=np.float64)
    fwhm_mhz = fwhm * np.median(frequency) / CKM
    dmhz_chan = abs(frequency[-1] - frequency[0]) / len(frequency)
    fwhm_chan = fwhm_mhz / dmhz_chan
    rms = get_rms(intensity)
    peak_indices, _ = signal.find_peaks(
        intensity, height=sigma * rms, distance=max(int(fwhm_chan * 0.5), 1))
    return peak_indices, rms
