"""Iterative sigma-clipped RMS noise estimation.

Reproduces reference calc_noise_std (reference inference.py:108-124)
exactly, including its quirks, which matter for golden-file parity:

  * the outlier threshold is computed from the *raw* spectrum's mean/std
    once, outside the clipping loop (dummy_mean/dummy_std are never
    updated), so the three passes mask the same channels each time;
  * the mask window is asymmetric: [chan - 3, chan + 3) — three channels
    before, two after, plus the channel itself.
"""

from __future__ import annotations

import numpy as np

__all__ = ["calc_noise_std"]


def calc_noise_std(intensity: np.ndarray, threshold: float = 3.5,
                   mask_radius: int = 3) -> tuple[float, float]:
    """Return (noise_mean, noise_std) of a spectrum with lines masked out."""
    dummy_ints = np.copy(intensity)
    noise = np.copy(intensity).astype(np.float64)
    dummy_mean = np.nanmean(dummy_ints)
    dummy_std = np.nanstd(dummy_ints)

    noise_mean = dummy_mean
    noise_std = dummy_std
    for _ in range(3):
        for chan in np.where(dummy_ints - dummy_mean < (-dummy_std * threshold))[0]:
            noise[max(0, chan - mask_radius): chan + mask_radius] = np.nan
        for chan in np.where(dummy_ints - dummy_mean > (dummy_std * threshold))[0]:
            noise[max(0, chan - mask_radius): chan + mask_radius] = np.nan
        noise_mean = np.nanmean(noise)
        noise_std = np.nanstd(np.real(noise))

    return float(noise_mean), float(noise_std)
