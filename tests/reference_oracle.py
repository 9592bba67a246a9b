"""Read-only import of the reference implementation as a differential oracle.

The reference depends on emcee / numba / corner, which are absent here;
lightweight stubs let its modules import so its *math* can be called
directly in parity tests. Nothing from the reference is copied — it is
executed in place from /root/reference.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"
_loaded = {}


def _install_stubs():
    if "corner" not in sys.modules:
        sys.modules["corner"] = types.ModuleType("corner")
    if "emcee" not in sys.modules:
        emcee = types.ModuleType("emcee")
        emcee.EnsembleSampler = object
        sys.modules["emcee"] = emcee
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")

        def njit(*args, **kwargs):
            if args and callable(args[0]):
                return args[0]
            return lambda f: f

        numba.njit = njit
        sys.modules["numba"] = numba


def load_reference():
    """Returns (classes_module, functions_module, inference_module)."""
    if "modules" not in _loaded:
        _install_stubs()
        if REFERENCE_ROOT not in sys.path:
            sys.path.insert(0, REFERENCE_ROOT)
        from spectral_simulator import classes, functions  # noqa: F401
        import inference  # noqa: F401

        _loaded["modules"] = (classes, functions, inference)
    return _loaded["modules"]


def load_reference_tmc1():
    """Import the reference 4-component TMC-1 pipeline module."""
    if "tmc1" not in _loaded:
        _install_stubs()
        # The script's own sys.path bootstrapping assumes it is run from the
        # repo root; add both paths explicitly for a bare import.
        for p in (REFERENCE_ROOT, f"{REFERENCE_ROOT}/scripts/MCMC"):
            if p not in sys.path:
                sys.path.insert(0, p)
        import TMC1_four_component  # noqa: F401

        _loaded["tmc1"] = TMC1_four_component
    return _loaded["tmc1"]


def make_reference_fitter(inference_module, **overrides):
    """Instantiate the reference SpectralFitMCMC with the HC5N template
    config (reference inference.py:585-631)."""
    import numpy as np

    config = {
        "mol_name": "hc5n_hfs",
        "template_run": True,
        "nruns": 1,
        "nwalkers": 8,
        "bounds": {
            "source_size": [30.0, 90.0],
            "Ncol": [1e8, 1e14],
            "Tex": [3.5, 12.0],
            "vlsr": [3.0, 5.5],
            "dV": [0.4, 1.5],
        },
        "template_means": np.array([3.4e10, 8.0, 4.3, 0.7575]),
        "template_stds": np.array([0.34e10, 3.0, 0.06, 0.22]),
        "dish_size": 70,
        "lower_limit": 18000,
        "upper_limit": 25000,
        "aligned_velocity": 4.10,
        "fixed_source_size": 52.0,
        "MLE_for_Ncol": False,
        "block_interlopers": True,
        "parallelize": False,
        "fit_folder": "/tmp/ref_oracle_results",
        "cat_folder": f"{REFERENCE_ROOT}/catalog",
        "prior_path": None,
        "data_paths": {"hc5n_hfs": f"{REFERENCE_ROOT}/data/DSN/cha_mms1_hc5n_example.npy"},
    }
    config.update(overrides)
    return inference_module.SpectralFitMCMC(config)
