"""Workbench session persistence round-trips every session parameter
(regression: the telescope-frame / grid-variant state added in round 2
must survive save_session -> restore_session; reference simulate_lte.py
save_results :2723 / restore :3076 persist their full globals dict)."""

import numpy as np

from cha1_mcmc_tpu.pipeline.workbench import Workbench


def test_session_roundtrip_all_params(tmp_path):
    wb = Workbench(ll=5000.0, ul=9000.0, res=0.02, dish_size=30.0,
                   source_size=5.0, vlsr=-7.0, dV=3.2, T=135.0, C=1e17,
                   tbg_params=[11.25], tbg_type="constant",
                   tbg_range=[[130000, 132500]], gauss=True,
                   eta=0.9, planck=True, synth_beam=[0.26, 0.26],
                   interferometer=True, cavity_ftmw=True, cavity_dV=0.2,
                   cavity_split=0.9, two_fwhm_only=True, match_obs=True,
                   rms=1e-3)
    path = str(tmp_path / "sess")
    wb.save_session(path)
    wb2 = Workbench.restore_session(path)
    for attr in ("ll", "ul", "res", "dish_size", "source_size", "vlsr",
                 "dV", "T", "C", "tbg_params", "tbg_type", "tbg_range",
                 "gauss", "eta", "planck", "synth_beam", "interferometer",
                 "cavity_ftmw", "cavity_dV", "cavity_split",
                 "two_fwhm_only", "match_obs", "rms"):
        assert getattr(wb2, attr) == getattr(wb, attr), attr


def test_session_roundtrip_default_rms_inf(tmp_path):
    # rms=-inf must survive the JSON round-trip (json emits -Infinity)
    wb = Workbench()
    path = str(tmp_path / "sess")
    wb.save_session(path)
    wb2 = Workbench.restore_session(path)
    assert wb2.rms == float("-inf")
    assert np.isneginf(wb2.rms)


def test_calc_tbg_empty_frequencies():
    """Empty simulation windows must not crash the Tbg dispatch
    (regression: load_mol with [ll, ul] above the catalog's range)."""
    from cha1_mcmc_tpu.analysis import calc_tbg

    out = calc_tbg([11.25, 27.4], "constant",
                   [[130000, 132500], [143500, 146000]], np.array([]))
    assert out.size == 0
