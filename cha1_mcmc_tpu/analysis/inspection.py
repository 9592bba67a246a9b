"""Best-fit spectrum inspection.

API equivalent of the reference's DSN_spectra notebook (reference
notebooks/DSN_spectra.ipynb cells 0-12): recompute the best-fit model on
the reduced data grid and on fine per-transition grids, for per-line
model-vs-data panels and a text export of (freq, intensity, model).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from cha1_mcmc_tpu.constants import CKM
from cha1_mcmc_tpu.models.forward import SpectralModel
from cha1_mcmc_tpu.inference.params import ParamSpec
from cha1_mcmc_tpu.reduce.datagrid import Datagrid

__all__ = ["LinePanel", "best_fit_inspection", "export_model_table"]


@dataclasses.dataclass
class LinePanel:
    """One transition's window: observed channels + fine model curve."""

    line_freq: float
    obs_freq: np.ndarray
    obs_int: np.ndarray
    obs_model: np.ndarray
    fine_freq: np.ndarray
    fine_model: np.ndarray


def best_fit_inspection(model: SpectralModel, spec: ParamSpec, grid: Datagrid,
                        theta, *, window_kms: float = 3.0,
                        fine_points: int = 1000) -> list[LinePanel]:
    """Per-transition panels of data vs the best-fit model.

    The fine model is evaluated on `fine_points` frequencies spanning
    +-window_kms around each covered line (the notebook uses 1000-point
    windows, reference DSN_spectra.ipynb cell 9).
    """
    theta = jnp.asarray(theta, dtype=model.dtype)
    ss, Ncol, Tex, vlsr, dV = spec.unpack(theta)
    on_grid = np.asarray(model.forward(ss, Ncol, Tex, vlsr, dV))

    panels = []
    line_freqs = np.asarray(model.line_freq, dtype=np.float64)
    for lf in line_freqs:
        half = window_kms * lf / CKM
        fine = np.linspace(lf - half, lf + half, fine_points)
        # A fine-grid model shares the line physics but a new velocity grid.
        fine_model = dataclasses.replace(
            model,
            grid_freq=jnp.asarray(fine, dtype=model.dtype),
            vel_grid=jnp.asarray(
                (line_freqs[:, None] - fine[None, :]) / line_freqs[:, None]
                * CKM + model.vel_offset, dtype=model.dtype))
        fine_curve = np.asarray(fine_model.forward(ss, Ncol, Tex, vlsr, dV))
        sel = np.abs((lf - grid.freqs) / lf * CKM) < window_kms
        panels.append(LinePanel(
            line_freq=float(lf),
            obs_freq=grid.freqs[sel], obs_int=grid.ints[sel],
            obs_model=on_grid[sel],
            fine_freq=fine, fine_model=fine_curve))
    return panels


def export_model_table(path: str, grid: Datagrid, model_on_grid) -> None:
    """Write the (freq, intensity, model) text table the notebook exports
    (reference DSN_spectra.ipynb cell 12)."""
    with open(path, "w") as fh:
        for f, i, m in zip(grid.freqs, grid.ints, np.asarray(model_on_grid)):
            fh.write(f"{f} {i} {m}\n")
