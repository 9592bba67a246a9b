"""Quickload observation presets.

The vendored tool ships quickload functions pointing at survey data on the
author's machine (reference simulate_lte.py:7554-7998: load_mm1,
load_tmc1, load_asai, load_hexos, ...). Here presets are data: named
FitConfig/MultiFitConfig templates for the surveys whose reduced data ships
with the reference, resolvable against any data root.
"""

from __future__ import annotations

import os

from cha1_mcmc_tpu.pipeline.config import FitConfig
from cha1_mcmc_tpu.pipeline.multifit import MultiFitConfig

__all__ = ["PRESETS", "load_preset"]

# name -> (builder, relative data path under the data root)
PRESETS = {
    # DSN DSS-43 Chamaeleon MMS1 HC5N template fit (reference
    # inference.py:585-631 defaults).
    "dsn_cha_mms1_hc5n": (
        lambda root, cat: FitConfig(
            mol_name="hc5n_hfs", template_run=True, cat_folder=cat,
            data_path=os.path.join(root, "DSN", "cha_mms1_hc5n_example.npy")),
        "DSN/cha_mms1_hc5n_example.npy",
    ),
    # GOTHAM TMC-1 HC9N 4-component fit (reference
    # TMC1_four_component.py:292-294, 393-403).
    "gotham_tmc1_hc9n": (
        lambda root, cat: MultiFitConfig(
            mol_name="hc9n_hfs", template_run=True, cat_folder=cat,
            data_path=os.path.join(root, "GOTHAM", "hc9n_hfs_chunks.npy")),
        "GOTHAM/hc9n_hfs_chunks.npy",
    ),
    # GOTHAM TMC-1 benzonitrile / HC11N: pre-reduced chunks ship with the
    # reference, but their literature priors do not — these presets are
    # non-template (posterior-as-prior from an HC9N-style template chain,
    # the reference's own workflow: TMC1_four_component.py:296-327).
    "gotham_tmc1_benzonitrile": (
        lambda root, cat: MultiFitConfig(
            mol_name="benzonitrile", template_run=False, cat_folder=cat,
            data_path=os.path.join(root, "GOTHAM", "benzonitrile_chunks.npy")),
        "GOTHAM/benzonitrile_chunks.npy",
    ),
    "gotham_tmc1_hc11n": (
        lambda root, cat: MultiFitConfig(
            mol_name="hc11n", template_run=False, cat_folder=cat,
            data_path=os.path.join(root, "GOTHAM", "hc11n_chunks.npy")),
        "GOTHAM/hc11n_chunks.npy",
    ),
}


def load_preset(name: str, data_root: str, cat_folder: str):
    """Return a ready config for a named survey preset.

    Raises KeyError with the available names, or FileNotFoundError naming
    the expected file, so a missing dataset is diagnosable.
    """
    if name not in PRESETS:
        raise KeyError(f"Unknown preset {name!r}; available: {sorted(PRESETS)}")
    builder, rel = PRESETS[name]
    cfg = builder(data_root, cat_folder)
    if not os.path.exists(cfg.data_path):
        raise FileNotFoundError(
            f"Preset {name!r} expects {rel} under {data_root} "
            f"(looked at {cfg.data_path}).")
    return cfg
