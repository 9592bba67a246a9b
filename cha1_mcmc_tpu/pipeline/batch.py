"""Multi-molecule batch fitting.

The reference's config carries a data_paths dict of molecules but runs one
at a time by editing mol_name (reference inference.py:621-630). Here a
batch run fits every molecule in the mapping; across hosts, each process
takes a slice (the DCN-level parallelism of SURVEY §5: independent
chains/molecules across hosts, walkers/lines across a host's chips).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from cha1_mcmc_tpu.constants import CYAN, RESET
from cha1_mcmc_tpu.pipeline.config import FitConfig
from cha1_mcmc_tpu.pipeline.fit import SpectralFit

__all__ = ["fit_molecules"]


def fit_molecules(base_config: FitConfig, data_paths: dict[str, str],
                  *, process_index: int = 0, process_count: int = 1) -> dict:
    """Fit each molecule in data_paths; returns {mol_name: chain}.

    process_index/process_count implement static round-robin sharding of
    molecules across independent hosts (set them from
    jax.process_index()/process_count() under jax.distributed, or from a
    job scheduler). Each fit reuses the base config with mol_name and
    data_path swapped.
    """
    results = {}
    molecules = sorted(data_paths)
    for i, mol in enumerate(molecules):
        if i % process_count != process_index:
            continue
        print(f"{CYAN}=== [{i + 1}/{len(molecules)}] {mol} ==={RESET}")
        cfg = dataclasses.replace(base_config, mol_name=mol,
                                  data_path=data_paths[mol])
        results[mol] = SpectralFit(cfg).run()
    return results
