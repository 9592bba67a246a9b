"""Analysis toolkit vs the reference's vendored interactive tool
(spectral_simulator/simulate_lte.py), imported read-only as an oracle."""

import importlib.util
import sys
import types
import warnings

import numpy as np
import pytest

from cha1_mcmc_tpu.analysis import (
    calc_tbg,
    find_peaks,
    find_sim_peaks,
    gauss_fit,
    gauss_func,
    get_rms,
    jy_to_k,
    k_to_jy,
    matched_filter,
    render_gaussian_profile,
    velocity_stack,
)
from tests.conftest import REFERENCE_ROOT, requires_reference


@pytest.fixture(scope="session")
def sim_lte():
    """Import the vendored tool as an oracle (module-level globals intact)."""
    sys.modules.setdefault("corner", types.ModuleType("corner"))
    if "peakutils" not in sys.modules:
        pk = types.ModuleType("peakutils")
        pk.indexes = lambda *a, **k: np.array([], dtype=int)
        sys.modules["peakutils"] = pk
    import matplotlib

    matplotlib.use("Agg")
    # The vendored tool predates NumPy 1.20's np.float removal
    # (splice_array uses dtype=np.float, simulate_lte.py:591-640); restore
    # the alias (== builtin float == float64 dtype) so it runs in place.
    for alias, py in (("float", float), ("int", int), ("bool", bool),
                      ("complex", complex), ("object", object), ("str", str)):
        if not hasattr(np, alias):
            setattr(np, alias, py)
    spec = importlib.util.spec_from_file_location(
        "simulate_lte", f"{REFERENCE_ROOT}/spectral_simulator/simulate_lte.py")
    m = importlib.util.module_from_spec(spec)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        spec.loader.exec_module(m)
    # the tool turns usetex on (simulate_lte.py:137); no latex here
    matplotlib.rc("text", usetex=False)
    return m


def _synthetic_obs(seed=0, n_lines=6, noise=1e-3, amp=5e-3, dV=0.5):
    """Observed spectrum with weak Gaussians at known rest frequencies, plus
    a matching noiseless fine simulation."""
    rng = np.random.default_rng(seed)
    freq_obs = np.arange(18000.0, 19000.0, 0.03)
    ckm = 299792.458
    line_freqs = np.sort(rng.uniform(18100, 18900, n_lines))
    amps = amp * rng.uniform(0.5, 1.0, n_lines)
    int_obs = rng.normal(0, noise, freq_obs.size)
    for f, a in zip(line_freqs, amps):
        sigma = dV * f / ckm / 2.35482
        int_obs += a * np.exp(-0.5 * ((freq_obs - f) / sigma) ** 2)
    freq_sim = np.arange(18000.0, 19000.0, 0.01)
    int_sim = np.zeros_like(freq_sim)
    for f, a in zip(line_freqs, amps):
        sigma = dV * f / ckm / 2.35482
        int_sim += a * np.exp(-0.5 * ((freq_sim - f) / sigma) ** 2)
    return freq_obs, int_obs, freq_sim, int_sim, line_freqs, amps


@requires_reference
def test_get_rms_matches_oracle(sim_lte):
    rng = np.random.default_rng(1)
    for data in [rng.normal(0, 1e-3, 2000),
                 np.abs(rng.normal(0, 1.0, 500)) + 0.1]:
        spiked = data.copy()
        spiked[100:103] += 50 * data.std()
        assert get_rms(spiked) == sim_lte.get_rms(spiked)


@requires_reference
def test_find_sim_peaks_matches_oracle(sim_lte):
    freq_obs, int_obs, freq_sim, int_sim, line_freqs, _ = _synthetic_obs()
    sim_lte.res = 0.01
    ref_idx = sim_lte.find_sim_peaks(freq_sim, int_sim, 0.5)
    my_idx = find_sim_peaks(freq_sim, int_sim, 0.5, res=0.01, ckm=sim_lte.ckm)
    np.testing.assert_array_equal(ref_idx, my_idx)
    # peaks land on the injected lines
    np.testing.assert_allclose(np.sort(freq_sim[my_idx]), line_freqs, atol=0.02)


@requires_reference
def test_velocity_stack_matches_oracle(sim_lte):
    freq_obs, int_obs, freq_sim, int_sim, _, _ = _synthetic_obs()
    dV, res = 0.5, 0.01
    # Configure the oracle's module globals and run it (plots go to Agg).
    sim_lte.freq_obs, sim_lte.int_obs = freq_obs.copy(), int_obs.copy()
    sim_lte.freq_sim, sim_lte.int_sim = freq_sim.copy(), int_sim.copy()
    sim_lte.dV, sim_lte.res, sim_lte.vlsr = dV, res, 0.0
    sim_lte.velocity_stack(line_stats=False)
    mine = velocity_stack(freq_obs, int_obs, freq_sim, int_sim, dV, res,
                          ckm=sim_lte.ckm)
    np.testing.assert_allclose(mine.velocity, sim_lte.vel_stacked)
    np.testing.assert_allclose(mine.snr, sim_lte.int_stacked, rtol=1e-10)
    np.testing.assert_allclose(mine.sim_snr, sim_lte.int_sim_stacked, rtol=1e-10)
    # and the stack actually detects the injected signal
    center = np.abs(mine.velocity) < 1.0
    assert mine.snr[center].max() > 5.0


@requires_reference
def test_matched_filter_matches_oracle(sim_lte):
    freq_obs, int_obs, freq_sim, int_sim, _, _ = _synthetic_obs()
    dV, res = 0.5, 0.01
    mine = velocity_stack(freq_obs, int_obs, freq_sim, int_sim, dV, res,
                          mf=True, ckm=sim_lte.ckm)
    ref_mf = sim_lte.matched_filter(mine.velocity, mine.snr, mine.sim_snr,
                                    filter_range=[-2, 2])
    my_mf = matched_filter(mine.velocity, mine.snr, mine.sim_snr,
                           filter_range=(-2, 2))
    np.testing.assert_allclose(my_mf, ref_mf, rtol=1e-12)
    assert my_mf.max() > 8.0  # matched filter beats the plain stack


@requires_reference
def test_calc_tbg_matches_oracle(sim_lte):
    freqs = np.linspace(10000, 30000, 500)
    cases = [
        (2.7, "constant", []),
        ([5.0, 10.0], "constant", [(12000, 15000), (20000, 25000)]),
        # singleton poly: the only no-range poly configuration the reference
        # itself can evaluate (its :5532 broadcast breaks for longer lists)
        ([[1.5]], "poly", []),
        ([1e-3, 1.1, 0.5], "power", []),
    ]
    for params, kind, rng_ in cases:
        ref = sim_lte.calc_tbg(params, kind, rng_, freqs.copy())
        mine = calc_tbg(params, kind, rng_, freqs)
        np.testing.assert_allclose(mine, ref, rtol=1e-12, err_msg=kind)
    # full quadratic poly vs the direct formula (oracle cannot evaluate it)
    A, B, C = 1e-8, 2e-4, 1.5
    mine = calc_tbg([[A, B, C]], "poly", [], freqs)
    np.testing.assert_allclose(mine, A * freqs ** 2 + B * freqs + C, rtol=1e-12)
    # sgrb2 continuum: same shape as oracle (oracle calls its own invert_beam)
    ref = sim_lte.calc_tbg([], "sgrb2", [], freqs.copy())
    mine = calc_tbg([], "sgrb2", [], freqs)
    np.testing.assert_allclose(mine, ref, rtol=1e-3)


@requires_reference
def test_gaussian_renderer_matches_oracle(sim_lte, hc5n_catalog):
    """render_gaussian_profile vs the reference sim_gaussian on real HC5N
    sticks (reference functions.py:544-623; the vendored copy at
    simulate_lte.py:1358 differs in signature, so the functions.py one is
    the oracle here)."""
    sys.path.insert(0, REFERENCE_ROOT)
    from spectral_simulator import functions as ref_functions

    from cha1_mcmc_tpu.models.forward import simulate_sticks_host

    freq, ints, taus = simulate_sticks_host(
        hc5n_catalog, C=[3.4e12], dV=[0.89], T=[7.0], ll=[18000], ul=[25000],
        source_size=52.0, dish_size=70)

    class MockSim:  # minimal attribute bag for the reference signature
        dV = [0.89]
        res = [0.1]
        T = [7.0]
        ll = [18000]
        ul = [25000]

        class obs_params:
            Tbg = 2.7

    ref_f, ref_i = ref_functions.sim_gaussian(MockSim(), taus.copy(), freq.copy(),
                                              comp_idx=0, chunk_idx=0)
    my_f, my_i = render_gaussian_profile(freq, taus, dV=0.89, ll=18000,
                                         ul=25000, res=0.1)
    np.testing.assert_allclose(my_f, ref_f)
    np.testing.assert_allclose(my_i, ref_i, rtol=1e-10, atol=1e-18)


@requires_reference
def test_ulim_matches_oracle(sim_lte):
    """get_obs_rms / get_sim_peak / find_best_ulim against the vendored
    tool executed in place (reference simulate_lte.py:5772/:5783/:7203),
    and the set_ulim_c rescale identity (reference :7183-7199)."""
    from cha1_mcmc_tpu.analysis.ulim import (
        get_obs_rms, get_sim_peak, upper_limit_column, find_best_ulim_lines)

    freq_obs, int_obs, freq_sim, int_sim, line_freqs, amps = _synthetic_obs()
    sim_lte.freq_obs, sim_lte.int_obs = freq_obs.copy(), int_obs.copy()
    sim_lte.freq_sim, sim_lte.int_sim = freq_sim.copy(), int_sim.copy()
    sim_lte.dV, sim_lte.res = 0.5, 0.01

    for lo, hi in [(18100, 18300), (18500, 18900), (18000, 19000)]:
        assert get_obs_rms(freq_obs, int_obs, lo, hi) == \
            sim_lte.get_obs_rms(lo, hi)
        assert get_sim_peak(freq_sim, int_sim, lo, hi) == \
            sim_lte.get_sim_peak(lo, hi)

    ref_best = sim_lte.find_best_ulim(sep=0.5, n=3, auto_limits=False)
    my_best, my_snr = find_best_ulim_lines(
        freq_sim, int_sim, freq_obs, int_obs, dV=0.5, res=0.01, sep=0.5, n=3)
    np.testing.assert_allclose(my_best, ref_best)
    assert (my_snr > 0).all() and (np.diff(my_snr) <= 0).all()

    # the rescale identity: C' = C * rms / peak
    lo, hi = 18100, 18900
    C = 1e12
    got = upper_limit_column(C, freq_sim, int_sim, freq_obs, int_obs, lo, hi)
    want = C * sim_lte.get_obs_rms(lo, hi) / sim_lte.get_sim_peak(lo, hi)
    assert np.isclose(got, want, rtol=1e-12)


@requires_reference
def test_workbench_ulim_scales_to_rms():
    """Workbench.ulim: after the rescale the re-simulated peak in the
    window equals the observed rms (linear-in-C thin limit)."""
    from cha1_mcmc_tpu.pipeline.workbench import Workbench
    from cha1_mcmc_tpu.analysis.ulim import get_obs_rms, get_sim_peak
    from tests.conftest import CATALOG_DIR, HC5N_DATA

    wb = Workbench(ll=18630, ul=18650, res=0.01, dish_size=70,
                   source_size=52.0, dV=0.89, T=7.0, C=3.4e12, vlsr=4.1,
                   gauss=True)
    wb.load_mol(f"{CATALOG_DIR}/hc5n_hfs.cat")
    wb.load_obs(HC5N_DATA)
    # twice, as the reference's autoset_ulim_c does: at C=3.4e12 the lines
    # are mildly optically thick, so one linear rescale leaves ~2%
    wb.ulim(18630, 18650)
    assert wb.C < 3.4e12  # HC5N is detected, so the 1-sigma ulim is lower
    wb.ulim(18630, 18650)
    peak = get_sim_peak(wb.freq_sim, wb.int_sim, 18630, 18650)
    rms = get_obs_rms(wb.freq_obs, wb.int_obs, 18630, 18650)
    assert np.isclose(peak, rms, rtol=1e-4)


@requires_reference
def test_obs_tools_match_oracle(sim_lte, tmp_path):
    """baseline / write_spectrum / get_subtraction against the vendored
    tool executed in place (reference :4169 / :1499 / :7336)."""
    from cha1_mcmc_tpu.analysis.obs_tools import (
        subtract_baseline, write_spectrum, get_subtraction)

    freq_obs, int_obs, freq_sim, int_sim, *_ = _synthetic_obs()

    # baseline: the reference mutates its module globals in place
    sim_lte.freq_obs = freq_obs.copy()
    sim_lte.int_obs = int_obs.copy()
    try:
        sim_lte.baseline([1e-3, 2e-7, -3e-12])
    except NameError:
        # headless: the reference redraws its live figure after the
        # subtraction (reference :4196-4206) and hits the undefined `ax`;
        # int_obs is already mutated by then, which is what we compare.
        pass
    mine = subtract_baseline(freq_obs, int_obs, [1e-3, 2e-7, -3e-12])
    np.testing.assert_allclose(mine, np.asarray(sim_lte.int_obs), rtol=1e-12)
    # scalar form == [scalar] form
    np.testing.assert_array_equal(subtract_baseline(freq_obs, int_obs, 2.5),
                                  subtract_baseline(freq_obs, int_obs, [2.5]))

    # write_spectrum: reproduce the duplicated-first-row quirk exactly
    sim_lte.freq_sim = freq_sim.copy()
    sim_lte.int_sim = int_sim.copy()
    sim_lte.gauss = True
    ref_path, my_path = tmp_path / "ref.txt", tmp_path / "mine.txt"
    sim_lte.write_spectrum("current", str(ref_path))
    write_spectrum(freq_sim, int_sim, str(my_path))
    assert my_path.read_text() == ref_path.read_text()
    rows = my_path.read_text().splitlines()
    assert rows[0] == rows[1]  # the quirk

    # get_subtraction on the working (return_sim=False) branch; the sim
    # grid must sit inside [ll, ul] or the metric NaN-poisons (quirk,
    # asserted below)
    inside = (freq_sim > 18150) & (freq_sim <= 18850)
    ref_total = sim_lte.get_subtraction(freq_obs, int_obs, freq_sim[inside],
                                        int_sim[inside], 18100, 18900)
    mine = get_subtraction(freq_obs, int_obs, freq_sim[inside],
                           int_sim[inside], 18100, 18900)
    assert np.isclose(mine, ref_total, rtol=1e-12), (mine, ref_total)
    assert np.isnan(get_subtraction(freq_obs, int_obs, freq_sim, int_sim,
                                    18100, 18900))  # sim exceeds the trim


def test_obs_scans_find_injected_lines():
    """find_obs_peaks recovers the injected lines chunk by chunk;
    find_obs_brights flags their channels (reference :7363/:7433)."""
    from cha1_mcmc_tpu.analysis.peaks import find_obs_peaks, find_obs_brights

    freq_obs, int_obs, _, _, line_freqs, _ = _synthetic_obs(amp=2e-2)
    freqs, ints, rms = find_obs_peaks(freq_obs, int_obs, sigma=5, fwhm=0.5)
    assert len(freqs) == len(rms)
    # every injected line is within one channel of a found peak
    for lf in line_freqs:
        assert np.min(np.abs(np.asarray(freqs) - lf)) < 0.06, lf
    bf, bi = find_obs_brights(freq_obs, int_obs)
    assert len(bf) >= len(line_freqs)
    assert np.all(np.asarray(bi) > 0)


def test_workbench_load_freqs():
    """Manual line lists render like the reference's load_freqs: vlsr
    shift, unit amplitudes, gauss rendering in gauss mode."""
    from cha1_mcmc_tpu.pipeline.workbench import Workbench
    from cha1_mcmc_tpu.constants import CKM

    wb = Workbench(ll=18000, ul=19000, res=0.01, vlsr=4.1, dV=0.5)
    wb.load_freqs([18500.0, 18800.0], peak=2.0)
    np.testing.assert_allclose(
        wb.freq_man, np.array([18500.0, 18800.0]) * (1 - 4.1 / CKM))
    np.testing.assert_array_equal(wb.int_man, [2.0, 2.0])
    wb.gauss = True
    wb.load_freqs([18500.0], peak=1.0)
    assert wb.freq_man.size > 100            # rendered grid
    # peak amplitude ~ the stick height, minus discrete-grid sampling loss
    assert 0.9 < wb.int_man.max() <= 1.0


@requires_reference
def test_find_limits_matches_oracle(sim_lte):
    """Coverage-chunk detection against the vendored find_limits
    (reference :3498) on a gappy spectrum like the DSN windows."""
    from cha1_mcmc_tpu.analysis.obs_tools import find_limits

    chunks = [np.arange(18630.0, 18650.0, 0.01),
              np.arange(21290.0, 21310.0, 0.01),
              np.arange(23950.0, 23970.0, 0.01)]
    freq = np.concatenate(chunks)
    ref_ll, ref_ul = sim_lte.find_limits(freq)
    my_ll, my_ul = find_limits(freq)
    np.testing.assert_allclose(my_ll, ref_ll)
    np.testing.assert_allclose(my_ul, ref_ul)
    assert len(my_ll) == 3


def test_residual_spectrum_recovers_noise():
    """obs = model + noise: the residual against the true model is the
    noise (plot_residuals' compute core)."""
    from cha1_mcmc_tpu.analysis.obs_tools import residual_spectrum

    freq_obs, int_obs, freq_sim, int_sim, *_ = _synthetic_obs(noise=1e-3)
    f, resid = residual_spectrum(freq_obs, int_obs, freq_sim, int_sim)
    np.testing.assert_array_equal(f, freq_obs)
    # lines removed: residual rms equals the injected noise level
    assert abs(resid.std() - 1e-3) < 2e-4
    assert resid.std() < int_obs.std()


def test_gauss_fit_recovers_parameters():
    rng = np.random.default_rng(0)
    freq = np.arange(18000.0, 18010.0, 0.01)
    truth = [(0.05, 18005.0, 0.8)]
    y = gauss_func(freq, *truth[0]) + rng.normal(0, 1e-4, freq.size)
    [res] = gauss_fit(freq, y, [list(truth[0])])
    dT, dT_err, v, v_err, dV, dV_err = res
    assert abs(dT - 0.05) < 5e-4
    assert abs(v - 18005.0) < 0.01
    assert abs(dV - 0.8) < 0.02


def test_jy_k_roundtrip():
    rng = np.random.default_rng(0)
    jy = rng.uniform(0.1, 2.0, 100)
    freq = np.linspace(18000, 25000, 100)
    k = jy_to_k(jy, freq, 5.0, 4.0)
    np.testing.assert_allclose(k_to_jy(k, freq, 5.0, 4.0), jy, rtol=1e-12)


def test_find_peaks_synthetic():
    freq_obs, int_obs, _, _, line_freqs, _ = _synthetic_obs(noise=2e-4, amp=5e-3)
    idx, rms = find_peaks(freq_obs, int_obs, fwhm=0.5, sigma=5)
    found = np.sort(freq_obs[idx])
    assert len(found) == len(line_freqs)
    np.testing.assert_allclose(found, line_freqs, atol=0.05)


@requires_reference
def test_best_fit_inspection(hc5n_problem, hc5n_datagrid):
    from cha1_mcmc_tpu.analysis.inspection import (
        best_fit_inspection, export_model_table)

    model, spec = hc5n_problem["model"], hc5n_problem["spec"]
    theta = np.array([3.24e12, 7.53, 4.11, 0.78])
    panels = best_fit_inspection(model, spec, hc5n_datagrid, theta)
    assert len(panels) == model.n_lines
    for p in panels:
        assert p.fine_freq.shape == (1000,)
        assert np.isfinite(p.fine_model).all()
        # fine model peaks near the line's shifted frequency
        assert p.fine_model.max() > 0
    # the strongest panel's fine peak is comparable to the observed peak
    best = max(panels, key=lambda p: p.fine_model.max())
    assert best.fine_model.max() == pytest.approx(
        hc5n_datagrid.ints.max(), rel=0.5)
    import io as _io
    import tempfile, os as _os
    with tempfile.TemporaryDirectory() as d:
        path = _os.path.join(d, "table.txt")
        ss, Ncol, Tex, vlsr, dV = spec.unpack(theta.astype(np.float32))
        on_grid = model.forward(ss, Ncol, Tex, vlsr, dV)
        export_model_table(path, hc5n_datagrid, on_grid)
        rows = np.loadtxt(path)
        assert rows.shape == (hc5n_datagrid.freqs.size, 3)


def test_cut_spectra_and_find_vel_peaks():
    from cha1_mcmc_tpu.analysis import cut_spectra, find_vel_peaks

    freq_obs, int_obs, freq_sim, int_sim, line_freqs, _ = _synthetic_obs(
        noise=2e-4, amp=5e-3)
    fc, ic = cut_spectra(freq_obs, int_obs, line_freqs, dV=0.5, n_fwhm=10)
    assert fc.size > 0
    # every cut channel lies within 10 FWHM of some line
    ckm = 2.998e5
    dists = np.min(np.abs(fc[:, None] - line_freqs[None, :]) /
                   (line_freqs[None, :] / ckm), axis=1)
    assert dists.max() < 10 * 0.5 + 0.1

    # stack in velocity space, then find the peak there
    from cha1_mcmc_tpu.analysis import velocity_stack
    stack = velocity_stack(freq_obs, int_obs, freq_sim, int_sim, 0.5, 0.01)
    idx, rms = find_vel_peaks(stack.velocity, stack.snr, fwhm=0.5, sigma=4)
    assert len(idx) >= 1
    assert np.any(np.abs(stack.velocity[idx]) < 0.5)


def test_host_molecule_assignment():
    from cha1_mcmc_tpu.parallel.multihost import host_molecule_assignment

    mols = ["hc5n", "hc7n", "hc9n", "benzonitrile", "azulene"]
    parts = [host_molecule_assignment(mols, i, 3) for i in range(3)]
    assert sorted(sum(parts, [])) == sorted(mols)
    assert all(len(set(p)) == len(p) for p in parts)


@requires_reference
def test_flag_and_blank_both_apply(sim_lte):
    """flag_lines and blank_lines together apply both passes, as the
    reference's code (not its warning) does (simulate_lte.py:4649-4660)."""
    freq_obs, int_obs, freq_sim, int_sim, _, _ = _synthetic_obs(amp=2e-2)
    int_obs = int_obs - 3e-2 * (np.abs(freq_obs - 18500) < 0.2)  # negative interloper
    dV, res = 0.5, 0.01
    sim_lte.freq_obs, sim_lte.int_obs = freq_obs.copy(), int_obs.copy()
    sim_lte.freq_sim, sim_lte.int_sim = freq_sim.copy(), int_sim.copy()
    sim_lte.dV, sim_lte.res, sim_lte.vlsr = dV, res, 0.0
    sim_lte.velocity_stack(line_stats=False, flag_lines=True, blank_lines=True,
                           flag_int_thresh=4)
    mine = velocity_stack(freq_obs, int_obs, freq_sim, int_sim, dV, res,
                          flag_lines=True, blank_lines=True, flag_int_thresh=4,
                          ckm=sim_lte.ckm)
    np.testing.assert_allclose(mine.snr, sim_lte.int_stacked, rtol=1e-10)


def test_title_zero_median():
    from cha1_mcmc_tpu.pipeline.plotting import _title

    assert "0.00" in _title(np.zeros(100))
    assert "x10^" in _title(np.full(100, 1e-5) + np.linspace(0, 1e-6, 100))


@requires_reference
def test_workbench_qvib_matches_vendored(sim_lte):
    """Qvib + vibs session semantics vs the vendored tool (reference
    calc_qvib :1293, load_mol vib_states :2512). Qrot itself follows the
    *live* pipeline's tables (functions.py) — already gated by
    test_partition_function_parity — because simulate_lte's own calc_q
    differs (e.g. hc5n_hfs: 3*15.65419*T + 0.2214, intercept untripled,
    simulate_lte.py:948-962 vs functions.py:182-185)."""
    from cha1_mcmc_tpu.pipeline.workbench import Workbench
    from tests.conftest import CATALOG_DIR

    vibs = [64.0, 222.5, 601.0]
    wb = Workbench(T=18.0, C=1e12, dV=0.7)
    wb.load_mol(f"{CATALOG_DIR}/hc5n_hfs.cat", vib_states=vibs)
    for T in (5.0, 18.0, 75.0, 300.0):
        assert wb.get_Qvib(T) == pytest.approx(sim_lte.calc_qvib(vibs, T),
                                               rel=1e-12)
        assert wb.get_Q(T) == pytest.approx(wb.get_Qrot(T) * wb.get_Qvib(T),
                                            rel=1e-15)
    # tau scales exactly as 1/Qvib (Nl = C*glow*exp(...)/Q)
    tau_vib = wb.tau_sim.copy()
    qvib = wb.get_Qvib()
    wb.load_mol(f"{CATALOG_DIR}/hc5n_hfs.cat")  # plain load resets vibs
    assert wb.vibs is None
    np.testing.assert_allclose(tau_vib, wb.tau_sim / qvib, rtol=1e-12)


@requires_reference
@pytest.mark.parametrize("catname,qns,window", [
    ("hc5n_hfs", 2, (18000.0, 26000.0)),
    ("benzonitrile", 4, (5000.0, 9000.0)),
])
def test_workbench_line_table_matches_vendored(sim_lte, catname, qns, window):
    """line_table vs the vendored print_lines(return_array=True)
    (reference :3662-3860): identical structure, QN strings, Eu/gu/gl and
    frequency columns; intensity / log(Aij) / Sijmu^2 compared numerically
    because the vendored tool uses its own (more precise) physical
    constants and its own Q tables, while the workbench follows the live
    pipeline's truncated ones (CLAUDE.md convention)."""
    from cha1_mcmc_tpu.pipeline.workbench import Workbench
    from tests.conftest import CATALOG_DIR

    cat = f"{CATALOG_DIR}/{catname}.cat"
    T, C, dV, vlsr = 12.0, 5.0e12, 0.7, 4.1
    sim_lte.T, sim_lte.C, sim_lte.dV, sim_lte.vlsr = T, C, dV, vlsr
    sim_lte.ll, sim_lte.ul = window
    sim_lte.gauss = False
    # session-scoped fixture: earlier tests leave globals behind (rms makes
    # run_sim drop weak lines; thermal clips) — reset to module defaults
    sim_lte.rms = float("-inf")
    sim_lte.thermal = float("inf")
    sim_lte.eta, sim_lte.planck = 1.0, False
    sim_lte.tbg_params, sim_lte.tbg_type, sim_lte.tbg_range = 2.7, "constant", []
    sim_lte.source_size, sim_lte.dish_size = 1e20, 100
    sim_lte.load_mol(cat)
    assert sim_lte.qns == qns

    wb = Workbench(ll=window[0], ul=window[1], T=T, C=C, dV=dV, vlsr=vlsr)
    wb.load_mol(cat)

    # threshold for the filtered case: inside the widest intensity gap, so
    # the ~4% Q-table offset between the two implementations cannot move a
    # line across it and change the row count
    s = np.sort(wb._sticks()[3])
    s = s[s > 0]
    mid = slice(s.size // 4, 3 * s.size // 4)
    k = int(np.argmax(s[1:][mid] / s[:-1][mid])) + s.size // 4
    gap_thresh = float(np.sqrt(s[k] * s[k + 1]))
    assert s[k + 1] / s[k] > 1.1, "no usable intensity gap in this catalog"

    for kwargs in (dict(), dict(mK=True), dict(rest=False),
                   dict(thresh=gap_thresh, mK=True)):
        ref_rows = sim_lte.print_lines(return_array=True, **kwargs)
        mine = wb.line_table(**kwargs)
        assert len(mine) == len(ref_rows)
        for got, want in zip(mine, ref_rows):
            gcols, wcols = got.split("\t"), want.split("\t")
            if len(wcols) == 1:   # 'Molecule: ...' header line
                assert got == want
                continue
            if "Frequency" in want or "Temperature" in want:  # headers
                assert got == want
                continue
            assert len(gcols) == len(wcols) == 8
            # freq, qn string, Eu, gu, gl: bit-identical derivations
            for k in (0, 2, 3, 4, 5):
                assert gcols[k] == wcols[k], (k, got, want)
            # intensity / log(Aij) / sijmu differ by the vendored tool's own
            # Q tables (~4% for benzonitrile) + precise-vs-truncated
            # constants; exact sijmu/aij parity vs MolCat is test_catalog's
            # job, this guards the table's structure and magnitudes.
            assert float(gcols[1]) == pytest.approx(float(wcols[1]),
                                                    abs=2e-3, rel=5e-2)
            assert float(gcols[6]) == pytest.approx(float(wcols[6]), abs=0.05)
            assert float(gcols[7]) == pytest.approx(float(wcols[7]),
                                                    abs=2e-3, rel=5e-2)


@requires_reference
def test_autoset_limits_matches_vendored(sim_lte):
    """Workbench.autoset_limits vs the vendored global-mutating version
    (reference :3535-3570): same chunk boundaries, same fixed 25 MHz pad."""
    from cha1_mcmc_tpu.pipeline.workbench import Workbench

    freq_obs = np.concatenate([np.arange(18000.0, 18100.0, 0.05),
                               np.arange(20000.0, 20050.0, 0.05),
                               np.arange(24800.0, 24900.0, 0.05)])
    int_obs = np.zeros_like(freq_obs)
    sim_lte.freq_obs, sim_lte.int_obs = list(freq_obs), list(int_obs)
    sim_lte.autoset_limits()
    wb = Workbench()
    wb.freq_obs, wb.int_obs = freq_obs, int_obs
    wb.autoset_limits()
    np.testing.assert_allclose(wb.ll, sim_lte.ll, rtol=0, atol=0)
    np.testing.assert_allclose(wb.ul, sim_lte.ul, rtol=0, atol=0)
    assert len(wb.ll) == 3


@requires_reference
def test_beam_utilities_match_vendored(sim_lte):
    """get_beam / invert_beam vs the vendored versions (reference
    :1650-1700). rtol covers the truncated-vs-precise speed of light
    (constants convention, CLAUDE.md); invert_beam is additionally checked
    as the exact inverse of apply_beam."""
    from cha1_mcmc_tpu.ops import apply_beam, get_beam, invert_beam

    freq = np.linspace(9000.0, 30000.0, 7)
    ints = np.linspace(0.5, 2.0, 7)
    np.testing.assert_allclose(get_beam(np, freq, 100.0),
                               sim_lte.get_beam(freq.copy(), 100.0),
                               rtol=2e-4)
    np.testing.assert_allclose(
        invert_beam(np, freq, ints, 30.0, 100.0),
        sim_lte.invert_beam(freq.copy(), ints.copy(), 30.0, 100.0),
        rtol=5e-4)
    round_trip = apply_beam(np, freq, invert_beam(np, freq, ints, 30.0, 100.0),
                            30.0, 100.0)
    np.testing.assert_allclose(round_trip, ints, rtol=1e-14)


@requires_reference
def test_make_gauss_params_matches_vendored(sim_lte, tmp_path):
    """make_gauss_params vs the vendored version (reference :3968-3988):
    identical triples, including the literal-3E5 velocity shift."""
    from cha1_mcmc_tpu.analysis import make_gauss_params

    path = tmp_path / "lines.txt"
    path.write_text("18638.615 0.012\n20000.0 0.034\n24101.25 0.002\n")
    mine = make_gauss_params(str(path), vlsr=5.8, dV=0.73)
    ref = sim_lte.make_gauss_params(str(path), 5.8, 0.73)
    assert mine == ref


@requires_reference
def test_telescope_frame_matches_vendored(sim_lte):
    """eta / interferometer / planck stick-mode branches vs the vendored
    tool run in place (reference simulate_lte.py run_sim :1817-1855,
    apply_beam :1580-1648): the base Kelvin spectrum is taken from the
    tool itself (source_size=1e20 -> dilution exactly 1.0 in f64), so the
    precise-vs-truncated constants difference cancels and each branch's
    multiplicative transform is checked exactly."""
    from cha1_mcmc_tpu.analysis.conversions import planck_k_to_jy
    from cha1_mcmc_tpu.ops.lte import apply_beam_interferometer
    from tests.conftest import CATALOG_DIR

    cat = f"{CATALOG_DIR}/benzonitrile.cat"
    sim_lte.T, sim_lte.C, sim_lte.dV, sim_lte.vlsr = 12.0, 5.0e12, 0.7, 0.0
    sim_lte.ll, sim_lte.ul = 5000.0, 9000.0
    sim_lte.gauss = False
    sim_lte.rms, sim_lte.thermal = float("-inf"), float("inf")
    sim_lte.tbg_params, sim_lte.tbg_type, sim_lte.tbg_range = 2.7, "constant", []
    sim_lte.eta, sim_lte.planck, sim_lte.interferometer = 1.0, False, False
    sim_lte.synth_beam = [0.26, 0.26]
    sim_lte.source_size, sim_lte.dish_size = 1e20, 100.0
    sim_lte.load_mol(cat)
    f0 = np.copy(sim_lte.freq_sim)
    int_undil = np.copy(sim_lte.int_sim)
    assert int_undil.size and np.abs(int_undil).max() > 0

    try:
        # eta divides the stick intensities (run_sim :1817)
        sim_lte.eta = 2.5
        sim_lte.load_mol(cat)
        np.testing.assert_allclose(sim_lte.int_sim, int_undil / 2.5,
                                   rtol=1e-12)
        sim_lte.eta = 1.0

        # interferometer: frequency-independent (bmaj+bmin)/2 dilution
        sim_lte.interferometer, sim_lte.synth_beam = True, [10.0, 6.0]
        sim_lte.source_size = 5.0
        sim_lte.load_mol(cat)
        np.testing.assert_allclose(
            sim_lte.int_sim,
            apply_beam_interferometer(np, int_undil, 5.0, [10.0, 6.0]),
            rtol=1e-12)
        sim_lte.interferometer, sim_lte.source_size = False, 1e20

        # planck-scale K -> Jy (run_sim :1831-1855)
        sim_lte.planck, sim_lte.synth_beam = True, [0.26, 0.26]
        sim_lte.load_mol(cat)
        np.testing.assert_allclose(
            sim_lte.int_sim, planck_k_to_jy(int_undil, f0, [0.26, 0.26]),
            rtol=1e-12)
    finally:
        sim_lte.eta, sim_lte.planck, sim_lte.interferometer = 1.0, False, False
        sim_lte.source_size = 1e20

    # the Workbench wires the same branches (workbench.py _beam/run_sim)
    from cha1_mcmc_tpu.pipeline.workbench import Workbench

    common = dict(ll=5000.0, ul=9000.0, T=12.0, C=5.0e12, dV=0.7, vlsr=0.0)
    wb = Workbench(**common)
    wb.load_mol(cat)
    base = wb.int_sim.copy()
    wb_eta = Workbench(eta=2.5, **common)
    wb_eta.load_mol(cat)
    np.testing.assert_allclose(wb_eta.int_sim, base / 2.5, rtol=1e-12)
    wb_int = Workbench(interferometer=True, synth_beam=[10.0, 6.0],
                       source_size=5.0, **common)
    wb_int.load_mol(cat)
    np.testing.assert_allclose(
        wb_int.int_sim, apply_beam_interferometer(np, base, 5.0, [10.0, 6.0]),
        rtol=1e-12)
    wb_pl = Workbench(planck=True, synth_beam=[0.26, 0.26], **common)
    wb_pl.load_mol(cat)
    np.testing.assert_allclose(
        wb_pl.int_sim, planck_k_to_jy(base, wb.freq_sim, [0.26, 0.26]),
        rtol=1e-12)


@requires_reference
def test_cavity_ftmw_renderer_matches_vendored(sim_lte):
    """Cavity-FTMW Doppler doublets vs the vendored sim_gaussian called
    directly on controlled sticks (reference :1368-1487: linewidth
    overridden to cavity_dV, half-amplitude components at
    f(1 -+ split/ckm), grid built from the unsplit centers). The tool
    returns the RT'd spectrum with its own precise constants; invert that
    RT exactly with the tool's h/k to recover the accumulated tau and
    compare grids + accumulation at 1e-10."""
    rng = np.random.default_rng(7)
    freqs = np.sort(rng.uniform(18100.0, 18900.0, 12))
    taus = rng.uniform(0.02, 0.4, freqs.size)
    T, res, cav_dV, cav_split = 9.0, 0.01, 0.13, 0.826

    sim_lte.T, sim_lte.eta, sim_lte.res = T, 1.0, res
    sim_lte.rms = float("-inf")
    sim_lte.tbg_params, sim_lte.tbg_type, sim_lte.tbg_range = 2.7, "constant", []
    sim_lte.quietflag = True
    sim_lte.two_fwhm_only = sim_lte.match_obs = False
    sim_lte.cavity_ftmw = True
    sim_lte.cavity_dV, sim_lte.cavity_split = cav_dV, cav_split
    # pin the tool's precise ckm to the live pipeline's truncated value
    # (constants.py:10, CLAUDE.md convention) for the comparison
    ckm_tool = sim_lte.ckm
    sim_lte.ckm = 2.998e5
    try:
        fg, ig = sim_lte.sim_gaussian(taus.copy(), freqs.copy(), 5.0)
    finally:
        sim_lte.cavity_ftmw = False
        sim_lte.ckm = ckm_tool
    # invert the tool's RT with the tool's own constants
    h, k = sim_lte.h, sim_lte.k
    J_T = (h * fg * 1e6 / k) / (np.exp(h * fg * 1e6 / (k * T)) - 1.0)
    J_Tbg = (h * fg * 1e6 / k) / (np.exp(h * fg * 1e6 / (k * 2.7)) - 1.0)
    tau_tool = -np.log(1.0 - ig / (J_T - J_Tbg))

    ll, ul = 18000.0, 19000.0
    fu, tau_mine = render_gaussian_profile(freqs, taus, dV=cav_dV, ll=ll,
                                           ul=ul, res=res,
                                           cavity_split=cav_split)
    expected = np.interp(fu, fg, tau_tool)
    np.testing.assert_allclose(tau_mine, expected, rtol=1e-8, atol=1e-12)
    # doublet structure: no peak at the rest frequency, peaks at +-split
    i0 = np.argmin(np.abs(fu - freqs[0]))
    ckm = 299792.458
    ilo = np.argmin(np.abs(fu - freqs[0] * (1 - cav_split / ckm)))
    assert tau_mine[ilo] > 2 * tau_mine[i0]


@requires_reference
def test_renderer_grid_variants_match_vendored(sim_lte):
    """two_fwhm_only / match_obs / rms weak-line cutoff vs the vendored
    sim_gaussian called directly (reference :1376-1425): same adaptive
    grids (including the merge-walk-still-extends-by-10-FWHM quirk in
    two_fwhm_only mode and the nearest-sample obs slicing in match_obs
    mode) and the same accumulation with sticks below rms/10 dropped.
    The tool's constants are pinned to the truncated ones and the RT is
    inverted exactly as in the cavity test."""
    rng = np.random.default_rng(11)
    freqs = np.sort(rng.uniform(18100.0, 18900.0, 10))
    taus = rng.uniform(0.02, 0.4, 10)
    taus[3], taus[7] = 1e-4, 2e-5      # below the rms/10 cutoff used below
    T, res, dV = 9.0, 0.01, 0.5
    freq_obs = np.arange(18050.0, 18950.0, 0.033)

    sim_lte.T, sim_lte.eta, sim_lte.res = T, 1.0, res
    sim_lte.tbg_params, sim_lte.tbg_type, sim_lte.tbg_range = 2.7, "constant", []
    sim_lte.quietflag = True
    sim_lte.cavity_ftmw = False
    ckm_tool = sim_lte.ckm
    sim_lte.ckm = 2.998e5
    h, k = sim_lte.h, sim_lte.k

    def tool_tau(**globals_):
        for name, val in globals_.items():
            setattr(sim_lte, name, val)
        try:
            fg, ig = sim_lte.sim_gaussian(taus.copy(), freqs.copy(), dV)
        finally:
            sim_lte.rms = float("-inf")
            sim_lte.two_fwhm_only = sim_lte.match_obs = False
        J_T = (h * fg * 1e6 / k) / (np.exp(h * fg * 1e6 / (k * T)) - 1.0)
        J_Tbg = (h * fg * 1e6 / k) / (np.exp(h * fg * 1e6 / (k * 2.7)) - 1.0)
        return fg, -np.log(1.0 - ig / (J_T - J_Tbg))

    try:
        ll, ul = 18000.0, 19000.0
        # rms cutoff: sticks 3 and 7 are skipped but still shape the grid
        fg, tau_tool = tool_tau(rms=5e-3)
        fu, mine = render_gaussian_profile(freqs, taus, dV=dV, ll=ll, ul=ul,
                                           res=res, rms=5e-3)
        np.testing.assert_allclose(mine, np.interp(fu, fg, tau_tool),
                                   rtol=1e-8, atol=1e-12)
        full = render_gaussian_profile(freqs, taus, dV=dV, ll=ll, ul=ul,
                                       res=res)[1]
        assert np.abs(mine - full).max() > 1e-6  # the cutoff did something

        # two_fwhm_only: thinned grid, 10-FWHM merge-extension quirk kept
        fg, tau_tool = tool_tau(two_fwhm_only=True)
        fu, mine = render_gaussian_profile(freqs, taus, dV=dV, ll=ll, ul=ul,
                                           res=res, two_fwhm_only=True)
        np.testing.assert_allclose(mine, np.interp(fu, fg, tau_tool),
                                   rtol=1e-8, atol=1e-12)

        # match_obs: identical grid (no regrid on either side)
        sim_lte.freq_obs = freq_obs
        fg, tau_tool = tool_tau(match_obs=True)
        fu, mine = render_gaussian_profile(freqs, taus, dV=dV, ll=ll, ul=ul,
                                           res=res, match_obs=freq_obs)
        np.testing.assert_array_equal(fu, fg)
        np.testing.assert_allclose(mine, tau_tool, rtol=1e-10, atol=1e-14)
    finally:
        sim_lte.ckm = ckm_tool


@requires_reference
def test_workbench_grid_variant_flags(sim_lte, tmp_path):
    """The Workbench session flags wire through to the renderer: match_obs
    renders on the loaded observation axis, two_fwhm_only thins the grid,
    rms drops weak sticks."""
    from cha1_mcmc_tpu.pipeline.workbench import Workbench
    from tests.conftest import CATALOG_DIR, HC5N_DATA

    cat = f"{CATALOG_DIR}/hc5n_hfs.cat"
    common = dict(ll=18000.0, ul=22000.0, T=8.0, C=5.0e12, dV=0.6,
                  vlsr=0.0, gauss=True)
    wb = Workbench(**common)
    wb.load_mol(cat)
    base_int = wb.int_sim.copy()

    # two_fwhm_only thins the adaptive grid to +-2 FWHM: the uniform
    # regrid keeps the peaks but flattens the outer wings
    wb2 = Workbench(two_fwhm_only=True, **common)
    wb2.load_mol(cat)
    # (the arange phase shifts with the window start, so the regridded
    # peak sample moves slightly)
    assert wb2.int_sim.max() == pytest.approx(base_int.max(), rel=2e-2)
    assert np.abs(wb2.int_sim - base_int).max() > 0

    wb3 = Workbench(match_obs=True, **common)
    wb3.load_obs(HC5N_DATA)
    wb3.load_mol(cat)
    # vlsr=0 in `common`, so the rendered axis must be obs samples exactly
    assert np.isin(wb3.freq_sim, wb3.freq_obs).all()

    wb4 = Workbench(rms=1e6, **common)   # absurd rms: every stick skipped
    wb4.load_mol(cat)
    assert np.allclose(wb4.int_sim, 0.0)


@requires_reference
def test_vlsr_frame_matches_vendored(sim_lte):
    """Frequency-dependent factors are evaluated in the *observed* frame:
    the vendored tool shifts frequencies before run_sim (simulate_lte.py
    :1969), so Tbg windows / J(T) / beam dilution see vlsr-shifted
    frequencies while line selection and tau stay rest-frame. Compared via
    the per-line ratio int(vlsr=v)/int(vlsr=0), which cancels the tool's
    precise-vs-truncated constants and its own Q tables; the Tbg window
    boundary is placed between one line's rest and shifted frequency so a
    rest-frame evaluation (ratio exactly 1) cannot pass."""
    from cha1_mcmc_tpu.pipeline.workbench import Workbench
    from tests.conftest import CATALOG_DIR

    cat = f"{CATALOG_DIR}/benzonitrile.cat"
    v = -7.0
    sim_lte.T, sim_lte.C, sim_lte.dV = 12.0, 5.0e12, 0.7
    sim_lte.ll, sim_lte.ul = 5000.0, 9000.0
    sim_lte.gauss = False
    sim_lte.rms, sim_lte.thermal = float("-inf"), float("inf")
    sim_lte.eta, sim_lte.planck, sim_lte.interferometer = 1.0, False, False
    sim_lte.source_size, sim_lte.dish_size = 30.0, 100.0
    sim_lte.vlsr = 0.0
    sim_lte.tbg_params, sim_lte.tbg_type = 2.7, "constant"
    sim_lte.tbg_range = []
    sim_lte.load_mol(cat)
    f_rest = np.copy(sim_lte.freq_sim)

    # place a Tbg boundary between line 0's rest and shifted frequency
    f0 = float(f_rest[0])
    edge = f0 * (1 - 0.5 * v / sim_lte.ckm)     # halfway to the shift
    tbg_params = [3.0, 30.0]
    tbg_range = [[5000.0, edge], [edge, 9000.0]]

    def tool_ints(vlsr):
        sim_lte.vlsr = vlsr
        sim_lte.tbg_params, sim_lte.tbg_type = tbg_params, "constant"
        sim_lte.tbg_range = tbg_range
        sim_lte.load_mol(cat)
        return np.copy(sim_lte.int_sim)

    try:
        with np.errstate(invalid="ignore", divide="ignore"):
            ratio_tool = tool_ints(v) / tool_ints(0.0)
    finally:
        sim_lte.vlsr = 0.0
        sim_lte.tbg_params, sim_lte.tbg_range = 2.7, []
    keep = np.isfinite(ratio_tool)        # zero-intensity sticks give 0/0
    assert np.abs(ratio_tool[keep] - 1.0).max() > 0.5  # the boundary crossing

    common = dict(ll=5000.0, ul=9000.0, T=12.0, C=5.0e12, dV=0.7,
                  source_size=30.0, dish_size=100.0,
                  tbg_params=tbg_params, tbg_type="constant",
                  tbg_range=tbg_range)
    wb_v = Workbench(vlsr=v, **common)
    wb_v.load_mol(cat)
    wb_0 = Workbench(vlsr=0.0, **common)
    wb_0.load_mol(cat)
    with np.errstate(invalid="ignore", divide="ignore"):
        ratio_mine = wb_v.int_sim / wb_0.int_sim
    np.testing.assert_allclose(ratio_mine[keep], ratio_tool[keep], rtol=1e-7)
    np.testing.assert_array_equal(np.isfinite(ratio_mine), keep)


@requires_reference
@pytest.mark.parametrize("vlsr", [0.0, 0.3])
def test_velocity_stack_use_sum_matches_oracle(sim_lte, vlsr):
    """use_sum=True stacks over the *summed* stored simulations with
    integrated-flux weights and catalog-snapped peak centers (reference
    simulate_lte.py:4497-4533) — the GOTHAM-style multi-species stacked
    detection mode. vlsr != 0 exercises the pre-snap back-shift quirk."""
    freq_obs, int_obs, freq_sim, int_sim, line_freqs, amps = _synthetic_obs()
    dV, res = 0.5, 0.01
    ckm = sim_lte.ckm
    # A "summed" simulation: the current molecule plus an extra species
    # whose lines partially blend with it.
    rng = np.random.default_rng(7)
    extra = np.sort(rng.uniform(18150, 18850, 4))
    freq_sum = freq_sim.copy()
    int_sum = int_sim.copy()
    for f in extra:
        sigma = dV * f / ckm / 2.35482
        int_sum += 3e-3 * np.exp(-0.5 * ((freq_sum - f) / sigma) ** 2)
    cat_frequency = line_freqs * (1.0 + vlsr / ckm)  # rest-frame catalog

    sim_lte.freq_obs, sim_lte.int_obs = freq_obs.copy(), int_obs.copy()
    sim_lte.freq_sim, sim_lte.int_sim = freq_sim.copy(), int_sim.copy()
    sim_lte.freq_sum, sim_lte.int_sum = freq_sum.copy(), int_sum.copy()
    sim_lte.frequency = cat_frequency.copy()
    sim_lte.dV, sim_lte.res, sim_lte.vlsr = dV, res, vlsr
    sim_lte.velocity_stack(line_stats=False, use_sum=True)
    mine = velocity_stack(freq_obs, int_obs, freq_sim, int_sim, dV, res,
                          use_sum=True, freq_sum=freq_sum, int_sum=int_sum,
                          cat_frequency=cat_frequency, vlsr=vlsr, ckm=ckm)
    np.testing.assert_allclose(mine.velocity, sim_lte.vel_stacked)
    np.testing.assert_allclose(mine.snr, sim_lte.int_stacked, rtol=1e-10)
    np.testing.assert_allclose(mine.sim_snr, sim_lte.int_sim_stacked,
                               rtol=1e-10)


@requires_reference
def test_workbench_stack_use_sum():
    """Workbench.stack(use_sum=True) runs the multi-species stacked
    detection end-to-end over stored simulations."""
    from cha1_mcmc_tpu.pipeline.workbench import Workbench

    wb = Workbench(ll=[18000], ul=[19000])
    wb.load_mol(f"{REFERENCE_ROOT}/catalog/hc5n_hfs.cat")
    wb.modC(3e12).store("a").modC(1e12).store("b")
    # synthetic observation matching the simulated lines
    rng = np.random.default_rng(0)
    freq_obs = np.arange(18000.0, 19000.0, 0.03)
    int_obs = rng.normal(0, 1e-4, freq_obs.size)
    int_obs += np.interp(freq_obs, *wb.sum_stored(), left=0.0, right=0.0)
    import tempfile, os
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "obs.npy")
        np.save(path, np.vstack([freq_obs, int_obs]))
        wb.load_obs(path)
    stack = wb.stack(use_sum=True)
    center = np.abs(stack.velocity) < 1.0
    assert stack.snr[center].max() > 5.0
