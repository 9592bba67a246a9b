"""Interactive simulation workbench.

Object-oriented equivalent of the vendored interactive tool's session
workflow (reference spectral_simulator/simulate_lte.py): load a molecule,
re-simulate live under parameter mutations (modT/modC/modS/moddV/modVLSR,
reference :1951-2130), store/recall/sum simulations (:2366-3075), load
observations (:2244), run stacking/matched filtering, and save/restore
sessions (:2723, :3076). Plotting is left to the caller (arrays in, arrays
out) — the global-mutating matplotlib REPL machinery is deliberately not
reproduced.
"""

from __future__ import annotations

import json
import os

import numpy as np

from cha1_mcmc_tpu.constants import CKM, T_CMB
from cha1_mcmc_tpu.catalogs import load_catalog
from cha1_mcmc_tpu.catalogs.partition import q_model_for_catalog
from cha1_mcmc_tpu.ops.lte import planck_J, apply_beam, tau_sticks
from cha1_mcmc_tpu.analysis.renderer import render_gaussian_profile
from cha1_mcmc_tpu.analysis.stacking import velocity_stack, matched_filter
from cha1_mcmc_tpu.analysis.tbg import calc_tbg
from cha1_mcmc_tpu.reduce.converters import read_obs

__all__ = ["Workbench"]


class Workbench:
    """A live LTE simulation session.

    Parameters mirror the tool's session globals (reference
    simulate_lte.py:150-260): T, C, dV, vlsr, source size, dish size,
    frequency window [ll, ul], resolution, and a background-temperature
    model (constant by default; any calc_tbg form).
    """

    def __init__(self, *, ll=0.0, ul=1e9, res=0.01, dish_size=100.0,
                 source_size=1e20, vlsr=0.0, dV=5.0, T=300.0, C=1e13,
                 tbg_params=T_CMB, tbg_type="constant", tbg_range=(),
                 gauss=False, vibs=None, eta=1.0, planck=False,
                 synth_beam=None, interferometer=False, cavity_ftmw=False,
                 cavity_dV=0.13, cavity_split=0.826, two_fwhm_only=False,
                 match_obs=False, rms=float("-inf")):
        self.ll, self.ul, self.res = ll, ul, res
        self.dish_size, self.source_size = dish_size, source_size
        self.vlsr, self.dV, self.T, self.C = vlsr, dV, T, C
        self.tbg_params, self.tbg_type = tbg_params, tbg_type
        self.tbg_range = list(tbg_range)
        self.gauss = gauss
        self.vibs = list(vibs) if vibs is not None else None
        # telescope frame (reference simulate_lte.py:196-226): eta = beam
        # efficiency; planck + synth_beam = Jy/beam display scale;
        # interferometer = synthesized-beam dilution; cavity_* = FTMW
        # Doppler-doublet simulation (gauss mode only, like the tool).
        self.eta = float(eta)
        self.planck = bool(planck)
        self.synth_beam = list(synth_beam) if synth_beam is not None else None
        self.interferometer = bool(interferometer)
        self.cavity_ftmw = bool(cavity_ftmw)
        self.cavity_dV, self.cavity_split = float(cavity_dV), float(cavity_split)
        # gauss-mode grid variants (reference :234-236) and the weak-line
        # accumulation cutoff (|stick| < rms/10 skipped, reference :1425;
        # rms is session state the tool's user sets by hand, :176).
        self.two_fwhm_only = bool(two_fwhm_only)
        self.match_obs = bool(match_obs)
        self.rms = float(rms)
        self.catalog = None
        self.q_model = None
        self.freq_sim = np.array([])
        self.int_sim = np.array([])
        self.tau_sim = np.array([])
        self.freq_obs = None
        self.int_obs = None
        self.obs_path = None
        self.freq_man = None   # manual line-list overlay (load_freqs)
        self.int_man = None
        self.obs_res = None
        self.stored: dict[str, dict] = {}

    # -- molecule / simulation ----------------------------------------
    def load_mol(self, catalog_path: str, vib_states=None):
        """Load a catalog and run the simulation (reference :2512).

        `vib_states`: vibrational mode energies in cm^-1 for the Qvib
        correction. Like the reference's load_mol, every call overwrites
        the session's vibs with this argument (so a plain load_mol resets
        them to None)."""
        self.catalog = load_catalog(catalog_path)
        self.q_model = q_model_for_catalog(self.catalog)
        self.vibs = list(vib_states) if vib_states is not None else None
        self.run_sim()
        return self

    # partition-function inspection (reference check_Q/get_Q/get_Qrot/
    # get_Qvib, :1861-1899): Q = Qrot(T) * Qvib(vibs, T).
    def get_Qrot(self, T=None):
        if self.q_model is None:
            raise RuntimeError("load_mol() first")
        return float(self.q_model.host_eval(self.T if T is None else T))

    def get_Qvib(self, T=None):
        from cha1_mcmc_tpu.catalogs.partition import calc_qvib

        return float(calc_qvib(self.vibs, self.T if T is None else T))

    def get_Q(self, T=None):
        return self.get_Qrot(T) * self.get_Qvib(T)

    def _windows(self):
        """[(ll, ul), ...] simulation windows. ll/ul may be scalars or
        equal-length sequences (the reference's trim_array accepts both,
        functions ll/ul globals become lists after autoset_limits)."""
        if np.isscalar(self.ll):
            return [(float(self.ll), float(self.ul))]
        return [(float(a), float(b)) for a, b in zip(self.ll, self.ul)]

    def _sticks(self, obs_frame: bool = True):
        """Trimmed stick opacities + beam-diluted stick intensities —
        the vendored run_sim's gauss=False compute core (reference
        :1704-1820). Windows are concatenated in order, like the
        reference's trim_array append walk (functions.py:507-540).
        Returns (idx, freq, tau, ints) with idx the catalog line indices
        and freq the *rest* frequencies.

        obs_frame: the vendored tool's main path shifts frequencies into
        the observed frame *before* run_sim (simulate_lte.py:1969:
        freq_tmp += (-vlsr)*freq_tmp/ckm), so every frequency-dependent
        factor — piecewise Tbg windows, J(T), beam dilution (and
        downstream the planck Jy scale and the gauss render grid) — is
        evaluated at observed-frame frequencies; line selection and tau
        use rest frequencies (run_sim trims by the rest-frame global
        `frequency`, :1768-1778). print_lines, however, calls run_sim on
        the *unshifted* catalog (:3719), so line_table passes
        obs_frame=False to evaluate the factors at rest — a reference
        inconsistency reproduced deliberately."""
        cat = self.catalog
        if cat is None:
            raise RuntimeError("load_mol() first")
        idx = np.concatenate([np.arange(*cat.trim_indices(a, b))
                              for a, b in self._windows()]).astype(np.int64)
        Q = self.get_Q()
        with np.errstate(under="ignore", over="ignore"):
            tau = tau_sticks(np, cat.frequency[idx], cat.elower[idx],
                             cat.aij[idx], cat.gup[idx], cat.glow[idx],
                             Q, self.C, self.T, self.dV)
            freq = cat.frequency[idx]
            fs = freq * (1.0 - self.vlsr / CKM) if obs_frame else freq
            tbg = calc_tbg(self.tbg_params, self.tbg_type, self.tbg_range, fs)
            J_T = planck_J(np, fs, self.T)
            J_Tbg = planck_J(np, fs, tbg)
            ints = (J_T - J_Tbg) * (1.0 - np.exp(-tau)) / self.eta
            ints = self._beam(fs, ints)
        return idx, freq, tau, ints

    def _beam(self, freq, ints):
        """Dish-beam or synthesized-beam dilution (reference apply_beam,
        simulate_lte.py:1580-1648)."""
        if self.interferometer:
            from cha1_mcmc_tpu.ops.lte import apply_beam_interferometer

            if self.synth_beam is None:
                raise RuntimeError("interferometer=True needs synth_beam=[bmaj, bmin]")
            return apply_beam_interferometer(np, ints, self.source_size,
                                             self.synth_beam)
        return apply_beam(np, freq, ints, self.source_size, self.dish_size)

    def line_table(self, thresh=float("-inf"), rest=True, mK=False):
        """Catalog info for the simulated lines above `thresh` — the
        vendored tool's print_lines (reference :3662-3860), formatted
        string for string. Quirks reproduced deliberately: the header
        only prints when the *first* in-window line clears the threshold
        (reference keys the header on ``x == 0``); gu/gl always come from
        the first of several same-frequency transitions (``[y][0]`` vs
        ``[y][i]`` for every other column); rest=False shifts by
        vlsr*f/3e5 with a literal 3e5, not the session ckm; and the
        occurrence counter for duplicate frequencies only advances on
        *printed* lines, so a below-threshold duplicate shifts its
        successors' QN assignment. Intensities are the stick simulation's
        (gauss is forced off, like the reference) computed with
        *rest-frame* factors — print_lines runs run_sim on the unshifted
        catalog (:3719), unlike the main vlsr-shifted path — and convert
        to Jy/mJy in planck mode (run_sim's planck branch applies inside
        that call, headers at :3792-3806); thresh filters the converted
        values."""
        cat = self.catalog
        _, freq, _tau, ints = self._sticks(obs_frame=False)
        if self.planck:
            from cha1_mcmc_tpu.analysis.conversions import planck_k_to_jy

            if self.synth_beam is None:
                raise RuntimeError("planck=True needs synth_beam=[bmaj, bmin]")
            ints = planck_k_to_jy(ints, freq, self.synth_beam)
        out = []
        old_f = np.nan
        occ = 0
        name = cat.catalog_file.split(".")[0].strip("\n").split("/")[-1]
        qns = cat.qns
        for x in range(freq.size):
            if not ints[x] > thresh:
                continue
            y = np.where(cat.frequency == freq[x])[0]
            occ = occ + 1 if freq[x] == old_f else 0
            j = int(y[occ])
            up = ["{:>2}".format(cat.qn[j, 0])] + [
                "{: >3}".format(cat.qn[j, q]) for q in range(1, qns)]
            low = ["{:>2}".format(cat.qn[j, 6])] + [
                "{: >3}".format(cat.qn[j, 6 + q]) for q in range(1, qns)]
            qn_string = " ".join(up) + " -> " + " ".join(low)
            gu, gl = cat.gup[int(y[0])], cat.glow[int(y[0])]
            if x == 0:
                qn_str = "Quantum Numbers"
                if len(qn_string) > 15:
                    qn_str += (len(qn_string) - 15) * " "
                out.append("Molecule: {}".format(name))
                out.append("Column Density: {:.2e} cm-2\tTemperature: {} K\t"
                           "Linewidth: {} km/s\tvlsr: {} km/s\n"
                           .format(self.C, self.T, self.dV, self.vlsr))
                unit = (("mJy" if mK else "Jy") if self.planck
                        else ("mK" if mK else "K"))
                out.append("Frequency\tIntensity ({})\t{}\tEu (K)   \tgu\tgl"
                           "\tlog(Aij)\tSijmu^2"
                           .format(unit, qn_str))
            f_val = freq[x] if rest else freq[x] - self.vlsr * freq[x] / 3e5
            out.append(
                "{:.4f}\t{:<13.3f}\t{}\t{:<9.3f}\t{}\t{}\t{:.2f}    \t{:.4f}"
                .format(f_val, ints[x] * (1000 if mK else 1), qn_string,
                        cat.eupper[j] / 0.695, gu, gl,
                        np.log10(cat.aij[j]), cat.sijmu[j]))
            old_f = freq[x]
        return out

    def tau_at(self, freq_mhz: float):
        """(line frequency, opacity) of the catalog line nearest `freq_mhz`
        — reference get_brandon_tau (:7163-7170) via run_sim's tau_get
        branch (:1762-1766). Like the reference, the nearest-line search
        runs over the *rest* (unshifted) catalog frequencies of the full
        catalog, not the trimmed window."""
        cat = self.catalog
        if cat is None:
            raise RuntimeError("load_mol() first")
        Q = self.get_Q()
        with np.errstate(under="ignore", over="ignore"):
            tau = tau_sticks(np, cat.frequency, cat.elower, cat.aij,
                             cat.gup, cat.glow, Q, self.C, self.T, self.dV)
        # reference find_nearest (:4207): searchsorted with ties broken to
        # the *right* neighbor (strict < on the left distance), which
        # differs from argmin on exact midpoints.
        f = cat.frequency
        idx = int(np.searchsorted(f, freq_mhz, side="left"))
        if idx > 0 and (idx == f.size
                        or abs(freq_mhz - f[idx - 1]) < abs(freq_mhz - f[idx])):
            idx -= 1
        return float(f[idx]), float(tau[idx])

    def run_sim(self):
        """Re-simulate with the current parameters (reference :1704-1855)."""
        _idx, freq, tau, stick_ints = self._sticks()
        with np.errstate(under="ignore", over="ignore"):
            if self.gauss:
                # Gaussian-profile rendering of the opacity sticks
                # (reference :1358, functions.py:544-623), then RT on the
                # rendered grid with the per-channel Tbg model; rendered
                # per window, concatenated in window order.
                fgs, igs = [], []
                # cavity mode renders doublets at the cavity linewidth
                # (reference sim_gaussian overrides linewidth, :1370)
                r_dV = self.cavity_dV if self.cavity_ftmw else self.dV
                split = self.cavity_split if self.cavity_ftmw else None
                obs_axis = (self.freq_obs if self.match_obs
                            and self.freq_obs is not None
                            and np.size(self.freq_obs) else None)
                # observed frame throughout, like the vendored tool: the
                # render grid is built around the *shifted* line centers
                # (sim_gaussian receives pre-shifted freqs, :1969), so the
                # window bounds shift with them and the Tbg/J/beam factors
                # below are evaluated at observed-frame grid points.
                shift = 1.0 - self.vlsr / CKM
                for (a, b) in self._windows():
                    in_w = (freq > a) & (freq <= b)   # selection: rest frame
                    fg, tau_g = render_gaussian_profile(
                        freq[in_w] * shift, tau[in_w], dV=r_dV,
                        ll=a * shift, ul=b * shift,
                        res=self.res, cavity_split=split,
                        two_fwhm_only=self.two_fwhm_only,
                        match_obs=obs_axis, rms=self.rms)
                    tbg = calc_tbg(self.tbg_params, self.tbg_type,
                                   self.tbg_range, fg)
                    J_T = planck_J(np, fg, self.T)
                    J_Tbg = planck_J(np, fg, tbg)
                    ig = (J_T - J_Tbg) * (1.0 - np.exp(-tau_g)) / self.eta
                    ig = self._beam(fg, ig)
                    fgs.append(fg)
                    igs.append(ig)
                freq_out = np.concatenate(fgs)
                ints = np.concatenate(igs)
            else:
                # _sticks() already evaluated the factors at observed-frame
                # frequencies; only the axis labels shift here.
                ints = stick_ints
                freq_out = freq * (1.0 - self.vlsr / CKM)
            if self.planck:
                from cha1_mcmc_tpu.analysis.conversions import planck_k_to_jy

                if self.synth_beam is None:
                    raise RuntimeError("planck=True needs synth_beam=[bmaj, bmin]")
                ints = planck_k_to_jy(ints, freq_out, self.synth_beam)
        # freq_out is already the observed (vlsr-shifted) frame
        self.freq_sim = freq_out
        self.int_sim = ints
        self.tau_sim = tau
        # Stick frequencies for the opacities, shifted like freq_sim: in
        # gauss mode freq_sim is the rendered grid (G points) while tau_sim
        # stays per-line (L points), so composites need this separately.
        self.freq_stick = freq * (1.0 - self.vlsr / CKM)
        self.freq_rest = freq  # rest-frame line centers of tau_sim
        return self

    # live mutators (reference :1951-2130)
    def modT(self, T):
        self.T = float(T)
        return self.run_sim()

    def modC(self, C):
        self.C = float(C)
        return self.run_sim()

    def modS(self, source_size):
        self.source_size = float(source_size)
        return self.run_sim()

    def moddV(self, dV):
        self.dV = float(dV)
        return self.run_sim()

    def modVLSR(self, vlsr):
        self.vlsr = float(vlsr)
        return self.run_sim()

    # multiplicative column-density shortcuts (reference mod2/mod12/mod10
    # and mod_2/mod_12/mod_10, :7510-7540; mod12 is x1.2, NOT x12 — the
    # reference comments call this out)
    def mod2(self):
        return self.modC(self.C * 2)

    def mod12(self):
        return self.modC(self.C * 1.2)

    def mod10(self):
        return self.modC(self.C * 10)

    def mod_2(self):
        return self.modC(self.C / 2)

    def mod_12(self):
        return self.modC(self.C / 1.2)

    def mod_10(self):
        return self.modC(self.C / 10)

    def update_tbg(self, tbg_params, tbg_type="constant", tbg_range=()):
        """Change the background model and re-simulate (reference update())."""
        self.tbg_params, self.tbg_type = tbg_params, tbg_type
        self.tbg_range = list(tbg_range)
        return self.run_sim()

    def tbg_at(self, freq_mhz: float) -> float:
        """Background temperature of the session's Tbg model at one
        frequency (reference check_tbg, :5694-5700)."""
        return float(calc_tbg(self.tbg_params, self.tbg_type, self.tbg_range,
                              np.array([float(freq_mhz)] * 2))[0])

    # -- storage (reference :2366-3075) --------------------------------
    def store(self, name: str):
        self.stored[name] = dict(
            freq=self.freq_sim.copy(), ints=self.int_sim.copy(),
            tau=self.tau_sim.copy(), tau_freq=self.freq_stick.copy(),
            params=dict(T=self.T, C=self.C, dV=self.dV, vlsr=self.vlsr,
                        source_size=self.source_size))
        return self

    def recall(self, name: str):
        entry = self.stored[name]
        for k, v in entry["params"].items():
            setattr(self, k, v)
        return self.run_sim()

    def purge(self, name: str):
        """Permanently remove a stored simulation (reference purge,
        simulate_lte.py:3459-3465: a KeyError reports the bad key rather
        than raising)."""
        try:
            del self.stored[name]
        except KeyError:
            raise KeyError(
                f"No simulation stored under {name!r}; "
                f"stored: {sorted(self.stored)}") from None
        return self

    def sum_stored(self, grid=None, thick: bool = True):
        """Composite of all stored simulations on a common grid.

        thick=True sums opacities then radiative-transfers the total with
        the *current session's* temperature — regardless of each stored
        sim's own T (reference sum_stored, :3021-3024: J_T uses the
        global T; a quirk kept deliberately) — and converts to Jy in
        planck mode (:3025-3055). Beam dilution is NOT applied, also like
        the reference. thick=False sums the stored intensities
        (optically-thin approximation; in planck mode those are already
        Jy).
        """
        if not self.stored:
            raise RuntimeError("nothing stored")
        if grid is None:
            lo = min(e["freq"].min() for e in self.stored.values())
            hi = max(e["freq"].max() for e in self.stored.values())
            grid = np.arange(lo, hi + self.res, self.res)
        if thick:
            tau_total = np.zeros_like(grid)
            for e in self.stored.values():
                dV = e["params"]["dV"]
                fg, tau_g = render_gaussian_profile(
                    e["tau_freq"], e["tau"], dV=dV, ll=grid[0], ul=grid[-1],
                    res=self.res)
                tau_total += np.interp(grid, fg, tau_g)
            tbg = calc_tbg(self.tbg_params, self.tbg_type, self.tbg_range, grid)
            ints = ((planck_J(np, grid, self.T) - planck_J(np, grid, tbg))
                    * (1 - np.exp(-tau_total)))
            if self.planck:
                from cha1_mcmc_tpu.analysis.conversions import planck_k_to_jy

                if self.synth_beam is None:
                    raise RuntimeError(
                        "planck=True needs synth_beam=[bmaj, bmin]")
                ints = planck_k_to_jy(ints, grid, self.synth_beam)
            return grid, ints
        total = np.zeros_like(grid)
        for e in self.stored.values():
            total += np.interp(grid, e["freq"], e["ints"], left=0.0, right=0.0)
        return grid, total

    # -- observations / detection --------------------------------------
    def autoset_limits(self, spacing_tolerance: float = 100.0):
        """Set the simulation windows from the loaded observation's
        coverage chunks, padded by the reference's fixed 25 MHz on each
        side (reference autoset_limits, :3535-3570), and re-simulate."""
        from cha1_mcmc_tpu.analysis.obs_tools import find_limits

        if self.freq_obs is None:
            raise RuntimeError("load_obs() first")
        ll, ul = find_limits(self.freq_obs, spacing_tolerance)
        self.ll = [float(x) - 25.0 for x in ll]
        self.ul = [float(x) + 25.0 for x in ul]
        if self.catalog is not None:
            self.run_sim()
        return self

    def load_obs(self, path: str, rms=None):
        self.obs_path = path
        if path.endswith(".npy"):
            # (2, N) [freq_MHz, intensity] array, the DSN raw format
            # (reference data/DSN/*.npy, consumed by inference read_file)
            import numpy as _np

            from cha1_mcmc_tpu.reduce.noise import calc_noise_std

            data = _np.load(path)
            order = _np.argsort(data[0])
            self.freq_obs, self.int_obs = data[0][order], data[1][order]
            diffs = _np.diff(self.freq_obs)
            self.obs_res = float(diffs[diffs > 0].min()) if diffs.size else 0.01
            self.obs_rms = (rms if rms is not None
                            else float(calc_noise_std(self.int_obs)[1]))
        else:
            self.freq_obs, self.int_obs, self.obs_res, self.obs_rms = read_obs(path, rms=rms)
        return self

    def stack(self, use_sum: bool = False, thick: bool = True, **kwargs):
        """Velocity-stack the loaded observation around the current
        simulation's lines — or, with use_sum=True, around the *summed*
        stored simulations (reference velocity_stack use_sum branch,
        simulate_lte.py:4497-4533): peak centers come from sum_stored()
        snapped to the current molecule's catalog frequencies, weights
        from the sum's integrated flux. A GOTHAM-style multi-species
        stacked detection is store()+sum over species, then
        stack(use_sum=True)."""
        if self.freq_obs is None:
            raise RuntimeError("load_obs() first")
        if use_sum:
            if self.catalog is None:
                raise RuntimeError("load a molecule first (its catalog "
                                   "frequencies anchor the sum's peaks)")
            freq_sum, int_sum = self.sum_stored(thick=thick)
            kwargs.setdefault("freq_sum", freq_sum)
            kwargs.setdefault("int_sum", int_sum)
            kwargs.setdefault("cat_frequency", self.catalog.frequency)
            kwargs.setdefault("vlsr", self.vlsr)
        return velocity_stack(self.freq_obs, self.int_obs, self.freq_sim,
                              self.int_sim, self.dV, self.res,
                              use_sum=use_sum, **kwargs)

    def matched_filter(self, **kwargs):
        """Matched-filter the stack; returns (velocity, response) with the
        velocity axis center-trimmed to the 'valid'-mode response length
        (reference simulate_lte.py:5106-5116)."""
        s = self.stack(mf=True, **kwargs)
        response = matched_filter(s.velocity, s.snr, s.sim_snr)
        nchans = int(len(response) / 2)
        c_chan = int(len(s.velocity) / 2)
        vel = s.velocity[c_chan - nchans: c_chan + nchans]
        if len(vel) > len(response):
            vel = vel[: len(response)]
        elif len(vel) < len(response):
            response = response[: len(vel)]
        return vel, response

    def load_freqs(self, man_freqs, peak: float = 1.0, vlsr=None, dV=None):
        """Manual line list -> (freq_man, int_man) overlay spectrum
        (reference load_freqs, :4060): every line gets amplitude `peak`,
        frequencies shift by the session vlsr, and gauss mode renders the
        sticks. `man_freqs` is a sequence of MHz values or a path to a
        one-column text file."""
        from cha1_mcmc_tpu.analysis.renderer import render_gaussian_profile

        vlsr = self.vlsr if vlsr is None else vlsr
        dV = self.dV if dV is None else dV
        if isinstance(man_freqs, str):
            with open(man_freqs) as fh:
                freqs = np.array([float(ln.split()[0]) for ln in fh
                                  if ln.strip()])
        else:
            freqs = np.asarray(man_freqs, dtype=np.float64)
        ints = np.full(freqs.shape, float(peak))
        freqs = freqs - vlsr * freqs / CKM
        if self.gauss:
            fgs, igs = [], []
            for (a, b) in self._windows():
                in_w = (freqs > a) & (freqs <= b)
                fg, ig = render_gaussian_profile(
                    freqs[in_w], ints[in_w], dV=dV, ll=a, ul=b, res=self.res)
                fgs.append(fg)
                igs.append(ig)
            self.freq_man = np.concatenate(fgs)
            self.int_man = np.concatenate(igs)
        else:
            self.freq_man, self.int_man = freqs, ints
        return self

    # -- observation utilities (reference :4169, :1499, :3573) -----------
    def baseline(self, constants):
        """Subtract a polynomial baseline from the loaded observation
        (reference baseline(), :4169)."""
        from cha1_mcmc_tpu.analysis.obs_tools import subtract_baseline

        if self.freq_obs is None:
            raise RuntimeError("load_obs() first")
        self.int_obs = subtract_baseline(self.freq_obs, self.int_obs, constants)
        return self

    def write_spectrum(self, which: str, output_file: str):
        """Export a spectrum as two-column text (reference write_spectrum,
        :1499): 'current', 'sum', 'obs', 'residual', or a stored name."""
        from cha1_mcmc_tpu.analysis.obs_tools import write_spectrum

        if which == "current":
            freq, ints = self.freq_sim, self.int_sim
        elif which == "sum":
            freq, ints = self.sum_stored()
        elif which == "obs":
            freq, ints = self.freq_obs, self.int_obs
        elif which == "residual":
            freq, ints = self.residual()
        elif which in self.stored:
            freq, ints = self.stored[which]["freq"], self.stored[which]["ints"]
        else:
            raise KeyError(f"no spectrum called '{which}'")
        write_spectrum(freq, ints, output_file)
        return self

    def write_npz_spec(self, path: str):
        """Save the loaded observation as .npz with freq_obs/int_obs keys
        (reference write_npz_spec, :7175-7181)."""
        if self.freq_obs is None:
            raise RuntimeError("load_obs() first")
        np.savez(path, freq_obs=self.freq_obs, int_obs=self.int_obs)
        return self

    def write_sim_params(self, outfile: str | None = None, *, notes=None,
                         rms: bool = False, lines: bool = False):
        """Write the session's simulation parameters to a text file —
        catalog/spectrum files, C/Tex/Tbg/dV/vlsr, Q/Qrot/Qvib, dish and
        source size, optional in-window observed rms and a full line
        table — in the vendored tool's .sim_params layout (reference
        write_sim_params, :5810-5868)."""
        from cha1_mcmc_tpu.analysis.ulim import get_obs_rms

        if self.catalog is None:
            raise RuntimeError("load_mol() first")
        if self.int_sim.size == 0:
            raise RuntimeError("no lines in the simulation windows — "
                               "widen [ll, ul] before write_sim_params()")
        if rms and self.freq_obs is None:
            raise RuntimeError("load_obs() first (write_sim_params(rms=True))")
        cat_file = self.catalog.catalog_file
        if outfile is None:
            outfile = cat_file.split("/")[-1].split(".")[0] + ".sim_params"
        peak_freq = float(self.freq_sim[int(np.argmax(self.int_sim))])
        T = self.T
        with open(outfile, "w") as out:
            out.write("Catalog File:\t{}\n".format(cat_file))
            out.write("Spectrum File:\t{}\n".format(self.obs_path))
            out.write("Column Density:\t{:.2e} cm-2\n".format(self.C))
            out.write("Tex:\t\t\t{} K\n".format(T))
            out.write("Tbg:\t\t\t{:.2f} K (@ {:.2f} MHz)\n"
                      .format(self.tbg_at(peak_freq), peak_freq))
            out.write("dV:\t\t\t\t{:.2f} km/s\n".format(self.dV))
            out.write("vlsr:\t\t\t{:.2f} km/s\n".format(self.vlsr))
            out.write("Q({})\t\t\t{}\n".format(T, int(self.get_Q())))
            out.write("Qrot({})\t\t{}\n".format(T, int(self.get_Qrot())))
            out.write("Qvib({})\t\t{:.5f}\n".format(T, self.get_Qvib()))
            if self.vibs is not None:
                out.write("Vib Freqs:\t\t{}\n".format(self.vibs))
            # dish size only for single-dish sessions; planck-scale
            # sessions record the synthesized beam instead
            # (reference :5836-5839)
            if not self.planck:
                out.write("Dish Size:\t\t{} m\n".format(self.dish_size))
            else:
                out.write("Synth Beam:\t\t{} arcsec\n".format(self.synth_beam))
            out.write("Source Size:\t{} arcsec\n".format(self.source_size))
            if rms:
                lo = min(a for a, _ in self._windows())
                hi = max(b for _, b in self._windows())
                out.write("RMS in Range:\t{:.2f} mK\n".format(
                    get_obs_rms(self.freq_obs, self.int_obs, lo, hi) * 1000))
            if lines:
                out.write("\n\n++++++Simulated Lines++++++\n\n")
                for row in self.line_table(mK=True):
                    out.write("{}\n".format(row))
                out.write("\n")
            if notes is not None:
                out.write("\n++++++Notes++++++\n\n")
                out.write("{}".format(notes))
        return outfile

    def residual(self, use_sum: bool | None = None):
        """Observation minus the model on the observed grid (the compute
        core of reference plot_residuals, :3573). Uses the stored-sim
        composite when any sims are stored (like the reference, which
        always sums its session archive), else the current simulation."""
        from cha1_mcmc_tpu.analysis.obs_tools import residual_spectrum

        if self.freq_obs is None:
            raise RuntimeError("load_obs() first")
        if use_sum is None:
            use_sum = bool(self.stored)
        if use_sum:
            fm, im = self.sum_stored()
        else:
            fm, im = self.freq_sim, self.int_sim
        return residual_spectrum(self.freq_obs, self.int_obs, fm, im)

    # -- upper limits (reference :7183-7335) -----------------------------
    def ulim(self, ll: float, ul: float, *, level=None, absorption=False):
        """Rescale C so the simulated peak in [ll, ul] matches the observed
        rms (or `level`) and re-simulate — set_ulim_c (reference :7183).
        Assumes the current simulation is up to date (every mutator
        re-simulates, so it always is after load_mol/mod*/recall)."""
        from cha1_mcmc_tpu.analysis.ulim import upper_limit_column

        if self.freq_obs is None and level is None:
            raise RuntimeError("load_obs() first (or pass level=)")
        if self.freq_sim.size == 0:
            raise RuntimeError("load_mol() first")
        new_C = upper_limit_column(
            self.C, self.freq_sim, self.int_sim, self.freq_obs, self.int_obs,
            ll, ul, level=level, absorption=absorption)
        return self.modC(new_C)

    def auto_ulim(self, *, rms_spread: float = 10.0, absorption=False):
        """Upper limit from the highest-expected-SNR line — autoset_ulim_c
        (reference :7285): find the best line, rescale around it, then
        repeat on the re-simulated spectrum (converges the marginally
        optically thick case). The reference performs *three* rescales in
        total — one in the first pass, then set_ulim_c twice back-to-back
        in the second (:7311-7313) — so the final extra rescale is kept.
        Returns (best_freq, C)."""
        from cha1_mcmc_tpu.analysis.ulim import find_best_ulim_lines

        if self.freq_obs is None:
            raise RuntimeError("load_obs() first")
        for _ in range(2):
            # ulim -> modC re-simulates, so the sim is current each pass
            freqs, _snr = find_best_ulim_lines(
                self.freq_sim, self.int_sim, self.freq_obs, self.int_obs,
                self.dV, self.res)
            best = float(freqs[0])
            dV_f = self.dV * best / CKM
            self.ulim(best - rms_spread * dV_f, best + rms_spread * dV_f,
                      absorption=absorption)
        self.ulim(best - rms_spread * dV_f, best + rms_spread * dV_f,
                  absorption=absorption)
        return best, self.C

    # -- session persistence (reference :2723, :3076) -------------------
    def save_session(self, path: str):
        state = dict(
            params=dict(ll=self.ll, ul=self.ul, res=self.res,
                        dish_size=self.dish_size, source_size=self.source_size,
                        vlsr=self.vlsr, dV=self.dV, T=self.T, C=self.C,
                        tbg_params=self.tbg_params, tbg_type=self.tbg_type,
                        tbg_range=self.tbg_range, gauss=self.gauss,
                        vibs=self.vibs, eta=self.eta, planck=self.planck,
                        synth_beam=self.synth_beam,
                        interferometer=self.interferometer,
                        cavity_ftmw=self.cavity_ftmw,
                        cavity_dV=self.cavity_dV,
                        cavity_split=self.cavity_split,
                        two_fwhm_only=self.two_fwhm_only,
                        match_obs=self.match_obs, rms=self.rms),
            catalog_file=self.catalog.catalog_file if self.catalog else None,
            obs_path=self.obs_path,
            stored_names=list(self.stored),
        )
        with open(path + ".json", "w") as fh:
            json.dump(state, fh, indent=2, default=float)
        arrays = {}
        for name, e in self.stored.items():
            arrays[f"{name}__freq"] = e["freq"]
            arrays[f"{name}__ints"] = e["ints"]
            arrays[f"{name}__tau"] = e["tau"]
            arrays[f"{name}__tau_freq"] = e["tau_freq"]
            arrays[f"{name}__params"] = np.array(
                [e["params"][k] for k in ("T", "C", "dV", "vlsr", "source_size")])
        np.savez(path + ".npz", **arrays)
        return self

    @classmethod
    def restore_session(cls, path: str) -> "Workbench":
        with open(path + ".json") as fh:
            state = json.load(fh)
        wb = cls(**{k: v for k, v in state["params"].items()})
        # the reference's restore reloads the session's observation file
        # by path (simulate_lte.py restore: read_obs(active_dict['obs']))
        obs_path = state.get("obs_path")
        if obs_path and os.path.exists(obs_path):
            wb.load_obs(obs_path)
        if state["catalog_file"] and os.path.exists(state["catalog_file"]):
            wb.load_mol(state["catalog_file"], vib_states=wb.vibs)
        data = np.load(path + ".npz")
        for name in state["stored_names"]:
            T, C, dV, vlsr, ss = data[f"{name}__params"]
            # Older sessions (pre tau_freq) stored stick sims where
            # freq == tau_freq; fall back for compatibility.
            tau_freq = (data[f"{name}__tau_freq"]
                        if f"{name}__tau_freq" in data.files
                        else data[f"{name}__freq"])
            wb.stored[name] = dict(
                freq=data[f"{name}__freq"], ints=data[f"{name}__ints"],
                tau=data[f"{name}__tau"], tau_freq=tau_freq,
                params=dict(T=T, C=C, dV=dV, vlsr=vlsr, source_size=ss))
        return wb
