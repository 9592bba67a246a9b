"""Interactive workbench shell.

The reference's vendored tool is driven from an IPython session whose
global functions mutate a live matplotlib window (reference
spectral_simulator/simulate_lte.py: load_mol :2512, modT :1951, obs
on/off :2196-2243, store/recall/sum_stored :2366-3075, status :2771,
print_lines :3662, velocity_stack :4476). This shell exposes the same
command vocabulary over the arrays-in/arrays-out Workbench: simulations
update in place, plots render to PNG files instead of a GUI window, and
sessions save/restore through the Workbench's .json/.npz format.

Run it with  python -m cha1_mcmc_tpu workbench  (optionally
--session saved_session to restore one); scriptable via a piped stdin.
"""

from __future__ import annotations

import cmd
import shlex

import numpy as np

from cha1_mcmc_tpu.pipeline.workbench import Workbench

__all__ = ["WorkbenchShell", "run_repl"]


class WorkbenchShell(cmd.Cmd):
    intro = ("cha1-mcmc-tpu workbench. Type help or ? for commands; "
             "quit to exit.")
    prompt = "(workbench) "

    def __init__(self, wb: Workbench | None = None, stdin=None, stdout=None):
        super().__init__(stdin=stdin, stdout=stdout)
        if stdin is not None:
            self.use_rawinput = False
        self.wb = wb or Workbench()

    # -- helpers --------------------------------------------------------
    def _say(self, msg: str):
        self.stdout.write(msg + "\n")

    def _fail(self, exc: Exception):
        self._say(f"error: {type(exc).__name__}: {exc}")

    def onecmd(self, line):  # never let one bad command kill the session
        try:
            return super().onecmd(line)
        except SystemExit:
            raise
        except Exception as exc:  # noqa: BLE001 - REPL surface
            self._fail(exc)
            return False

    def _mod(self, attr: str, arg: str):
        getattr(self.wb, attr)(float(arg))
        self._say(f"{attr} -> {arg}; re-simulated "
                  f"({self.wb.freq_sim.size} points)")

    # -- molecule / simulation ------------------------------------------
    def do_load_mol(self, arg):
        """load_mol CATALOG.cat — load an SPCAT catalog and simulate."""
        self.wb.load_mol(arg.strip())
        self._say(f"loaded {arg.strip()}: {self.wb.catalog.frequency.size} "
                  f"transitions, {self.wb.freq_sim.size} simulated points")

    def do_modT(self, arg):
        """modT K — set excitation temperature and re-simulate."""
        self._mod("modT", arg)

    def do_modC(self, arg):
        """modC NCOL — set column density (cm^-2) and re-simulate."""
        self._mod("modC", arg)

    def do_modS(self, arg):
        """modS ARCSEC — set source size and re-simulate."""
        self._mod("modS", arg)

    def do_moddV(self, arg):
        """moddV KM_S — set linewidth (FWHM) and re-simulate."""
        self._mod("moddV", arg)

    def do_modVLSR(self, arg):
        """modVLSR KM_S — set source velocity and re-simulate."""
        self._mod("modVLSR", arg)

    def _modx(self, method: str):
        getattr(self.wb, method)()
        self._say(f"C -> {self.wb.C:.2e}")

    def do_mod2(self, arg):
        """mod2 — double the column density (reference mod2 :7516)."""
        self._modx("mod2")

    def do_mod12(self, arg):
        """mod12 — multiply C by 1.2 (reference mod12: x1.2, not x12)."""
        self._modx("mod12")

    def do_mod10(self, arg):
        """mod10 — multiply C by 10 (reference mod10 :7510)."""
        self._modx("mod10")

    def do_mod_2(self, arg):
        """mod_2 — halve the column density (reference mod_2 :7528)."""
        self._modx("mod_2")

    def do_mod_12(self, arg):
        """mod_12 — divide C by 1.2 (reference mod_12)."""
        self._modx("mod_12")

    def do_mod_10(self, arg):
        """mod_10 — divide C by 10 (reference mod_10)."""
        self._modx("mod_10")

    def do_limits(self, arg):
        """limits LL UL [RES] — set the simulation window (MHz)."""
        parts = arg.split()
        self.wb.ll, self.wb.ul = float(parts[0]), float(parts[1])
        if len(parts) > 2:
            self.wb.res = float(parts[2])
        if self.wb.catalog is not None:
            self.wb.run_sim()
        self._say(f"window [{self.wb.ll}, {self.wb.ul}] @ {self.wb.res} MHz")

    def do_gauss(self, arg):
        """gauss on|off — Gaussian-rendered vs stick simulation."""
        self.wb.gauss = arg.strip().lower() in ("on", "true", "1")
        if self.wb.catalog is not None:
            self.wb.run_sim()
        self._say(f"gauss = {self.wb.gauss}")

    # session attributes the vendored tool's users set as ipython globals
    # (reference simulate_lte.py:172-236: eta, planck, synth_beam,
    # interferometer, cavity_ftmw/..., two_fwhm_only, match_obs, rms)
    _SETTABLE = {
        "eta": float, "planck": None, "interferometer": None,
        "cavity_ftmw": None, "cavity_dV": float, "cavity_split": float,
        "two_fwhm_only": None, "match_obs": None, "rms": float,
        "source_size": float, "dish_size": float, "res": float,
    }

    def do_set(self, arg):
        """set NAME VALUE [VALUE2] — set a telescope-frame/session flag and
        re-simulate. Booleans take on/off; `set synth_beam BMAJ BMIN`.
        Names: eta, planck, synth_beam, interferometer, cavity_ftmw,
        cavity_dV, cavity_split, two_fwhm_only, match_obs, rms,
        source_size, dish_size, res (the vendored tool's module globals,
        reference :172-236)."""
        parts = arg.split()
        name = parts[0] if parts else ""
        needed = 3 if name == "synth_beam" else 2
        if len(parts) < needed:
            self._say("usage: set NAME VALUE  (set synth_beam BMAJ BMIN)")
            return
        if name == "synth_beam":
            old = self.wb.synth_beam
            self.wb.synth_beam = [float(parts[1]), float(parts[2])]
        elif name in self._SETTABLE:
            conv = self._SETTABLE[name]
            if conv is None:
                value = parts[1].strip().lower() in ("on", "true", "1")
            else:
                value = conv(parts[1])
            old = getattr(self.wb, name)
            setattr(self.wb, name, value)
        else:
            self._say(f"unknown session attribute {name!r}; "
                      f"settable: synth_beam, {', '.join(self._SETTABLE)}")
            return
        if self.wb.catalog is not None:
            try:
                self.wb.run_sim()
            except Exception as exc:
                # e.g. planck=True without synth_beam: revert so later
                # commands' re-simulations keep working
                setattr(self.wb, name, old)
                self._say(f"cannot set {name}: {exc} (reverted)")
                return
        self._say(f"{name} = {getattr(self.wb, name)}")

    def do_tbg(self, arg):
        """tbg PARAMS [TYPE] — set the background model (reference update())."""
        parts = arg.split()
        kind = parts[1] if len(parts) > 1 else "constant"
        self.wb.update_tbg(float(parts[0]), tbg_type=kind)
        self._say(f"tbg = {parts[0]} ({kind})")

    # -- status / inspection ---------------------------------------------
    def do_status(self, arg):
        """status — current parameters (reference status() :2771)."""
        wb = self.wb
        self._say(f"T={wb.T} K  C={wb.C:.3e} cm-2  dV={wb.dV} km/s  "
                  f"vlsr={wb.vlsr} km/s  source={wb.source_size}\"  "
                  f"dish={wb.dish_size} m  gauss={wb.gauss}")
        self._say(f"window [{wb.ll}, {wb.ul}] MHz @ {wb.res}; "
                  f"catalog={'-' if wb.catalog is None else wb.catalog.catalog_file}; "
                  f"obs={'-' if wb.freq_obs is None else f'{wb.freq_obs.size} chans'}; "
                  f"stored: {', '.join(wb.stored) or '-'}")
        # telescope-frame / grid-variant flags, shown when non-default
        # (the reference status() prints its full globals block, :2771)
        flags = []
        if wb.eta != 1.0:
            flags.append(f"eta={wb.eta}")
        if wb.planck:
            flags.append(f"planck (synth_beam={wb.synth_beam})")
        if wb.interferometer:
            flags.append(f"interferometer (synth_beam={wb.synth_beam})")
        if wb.cavity_ftmw:
            flags.append(f"cavity_ftmw (dV={wb.cavity_dV}, "
                         f"split={wb.cavity_split})")
        if wb.two_fwhm_only:
            flags.append("two_fwhm_only")
        if wb.match_obs:
            flags.append("match_obs")
        if np.isfinite(wb.rms):
            flags.append(f"rms={wb.rms:g}")
        if wb.vibs is not None:
            flags.append(f"vibs={wb.vibs}")
        if flags:
            self._say("flags: " + "  ".join(flags))

    def do_print_lines(self, arg):
        """print_lines [THRESH] [mK] [shifted] — catalog table of the
        simulated lines above THRESH (reference print_lines :3662):
        frequency, intensity, quantum numbers, Eu, gu/gl, log(Aij),
        Sijmu^2."""
        parts = arg.split()
        thresh = float(parts[0]) if parts and parts[0] not in ("mK", "shifted") \
            else float("-inf")
        for line in self.wb.line_table(thresh=thresh, rest="shifted" not in parts,
                                       mK="mK" in parts):
            self._say(line)

    def do_Q(self, arg):
        """Q [T] — partition function at T (default: session T); prints
        Q, Qrot, and Qvib (reference check_Q/check_Qrot/check_Qvib)."""
        T = float(arg) if arg.strip() else None
        self._say(f"Q({T if T is not None else self.wb.T}) = "
                  f"{self.wb.get_Q(T):.4f}  (Qrot {self.wb.get_Qrot(T):.4f}, "
                  f"Qvib {self.wb.get_Qvib(T):.5f})")

    def do_vibs(self, arg):
        """vibs E1,E2,... | off — vibrational mode energies (cm^-1) for the
        Qvib correction; re-simulates (reference load_mol vib_states)."""
        self.wb.vibs = (None if arg.strip().lower() in ("off", "none", "")
                        else [float(x) for x in arg.replace(",", " ").split()])
        if self.wb.catalog is not None:
            self.wb.run_sim()
        self._say(f"vibs = {self.wb.vibs}")

    def do_tau(self, arg):
        """tau FREQ — opacity of the catalog line nearest FREQ MHz
        (reference get_brandon_tau)."""
        f, tau = self.wb.tau_at(float(arg))
        self._say(f"The tau for the line at frequency {f} is {tau}.")

    # -- storage ----------------------------------------------------------
    def do_store(self, arg):
        """store NAME — store the current simulation (reference :2366)."""
        self.wb.store(arg.strip())
        self._say(f"stored '{arg.strip()}'")

    def do_recall(self, arg):
        """recall NAME — restore a stored simulation (reference :2390)."""
        self.wb.recall(arg.strip())
        self._say(f"recalled '{arg.strip()}'")

    def do_purge(self, arg):
        """purge NAME — permanently remove a stored simulation
        (reference :3459)."""
        self.wb.purge(arg.strip())
        self._say(f"purged '{arg.strip()}'")

    def do_sum(self, arg):
        """sum [thin] [OUT.npy] — composite of stored sims (reference :2928)."""
        parts = arg.split()
        thick = "thin" not in parts
        out = next((p for p in parts if p.endswith(".npy")), None)
        grid, ints = self.wb.sum_stored(thick=thick)
        self._say(f"summed {len(self.wb.stored)} stored sims "
                  f"({'thick' if thick else 'thin'}): {grid.size} points, "
                  f"peak {ints.max():.4e} K")
        if out:
            np.save(out, np.vstack([grid, ints]))
            self._say(f"wrote {out}")

    # -- observations / detection ------------------------------------------
    def do_obs(self, arg):
        """obs PATH — load an observation (.npy pair / .lis / .txt)."""
        self.wb.load_obs(arg.strip())
        self._say(f"loaded {self.wb.freq_obs.size} channels "
                  f"[{self.wb.freq_obs.min():.1f}, {self.wb.freq_obs.max():.1f}] MHz")

    def do_stack(self, arg):
        """stack — velocity-stack the observation (reference :4476)."""
        s = self.wb.stack()
        self._say(f"stack peak SNR {np.nanmax(s.snr):.2f} over "
                  f"{s.velocity.size} velocity channels")

    def do_mf(self, arg):
        """mf — matched-filter the stack; prints the peak response."""
        vel, resp = self.wb.matched_filter()
        j = int(np.nanargmax(resp))
        self._say(f"matched filter peak {resp[j]:.2f} sigma at "
                  f"{vel[j]:+.2f} km/s")

    def do_peaks(self, arg):
        """peaks [SIGMA] — chunked quick line scan of the observation
        (reference find_obs_peaks)."""
        from cha1_mcmc_tpu.analysis.peaks import find_obs_peaks

        if self.wb.freq_obs is None:
            raise RuntimeError("load_obs() first")
        sigma = float(arg) if arg.strip() else 5.0
        freqs, ints, rms = find_obs_peaks(self.wb.freq_obs, self.wb.int_obs,
                                          sigma=sigma)
        self._say(f"{len(freqs)} peaks above {sigma} sigma")
        for f, i, r in list(zip(freqs, ints, rms))[:10]:
            self._say(f"  {f:12.4f} MHz  {i:.4e} K  (rms {r:.2e})")

    def do_load_freqs(self, arg):
        """load_freqs F1,F2,... [PEAK] — manual line-list overlay
        (reference load_freqs)."""
        parts = arg.split()
        freqs = [float(x) for x in parts[0].split(",")]
        peak = float(parts[1]) if len(parts) > 1 else 1.0
        self.wb.load_freqs(freqs, peak=peak)
        self._say(f"manual spectrum: {self.wb.freq_man.size} points")

    def do_autoset_limits(self, arg):
        """autoset_limits [TOL] — set the simulation windows from the
        observation's coverage chunks +- 25 MHz (reference :3535)."""
        tol = float(arg) if arg.strip() else 100.0
        self.wb.autoset_limits(tol)
        wins = ", ".join(f"[{a:.1f}, {b:.1f}]" for a, b in self.wb._windows())
        self._say(f"windows: {wins}")

    def do_write_params(self, arg):
        """write_params [OUT] [rms] [lines] — export the session's
        simulation parameters (reference write_sim_params :5810)."""
        parts = arg.split()
        out = next((p for p in parts if p not in ("rms", "lines")), None)
        path = self.wb.write_sim_params(out, rms="rms" in parts,
                                        lines="lines" in parts)
        self._say(f"wrote {path}")

    def do_write_npz(self, arg):
        """write_npz OUT.npz — save the observation as freq_obs/int_obs
        (reference write_npz_spec :7175)."""
        self.wb.write_npz_spec(arg.strip())
        self._say(f"wrote {arg.strip()}")

    def do_quickloads(self, arg):
        """quickloads — list the named survey presets (reference
        print_quickloads :7966): fit presets and workbench sessions."""
        from cha1_mcmc_tpu.pipeline.presets import PRESETS, WORKBENCH_PRESETS

        self._say("fit presets (python -m cha1_mcmc_tpu fit):")
        for name in sorted(PRESETS):
            self._say(f"  {name}")
        self._say("workbench sessions (preset NAME [OBS_PATH]):")
        for name in sorted(WORKBENCH_PRESETS):
            self._say(f"  {name}")

    def do_preset(self, arg):
        """preset NAME [OBS_PATH] — replace the session with a survey
        quickload (reference load_mm1/load_tmc1/load_asai/..., :7554);
        with OBS_PATH also loads the observation and autosets windows."""
        from cha1_mcmc_tpu.pipeline.presets import load_workbench_preset

        parts = arg.split()
        self.wb = load_workbench_preset(parts[0],
                                        parts[1] if len(parts) > 1 else None)
        self._say(f"session '{parts[0]}': T={self.wb.T} K  dV={self.wb.dV} "
                  f"km/s  vlsr={self.wb.vlsr}  dish={self.wb.dish_size} m  "
                  f"tbg={self.wb.tbg_type}")

    def do_baseline(self, arg):
        """baseline C0 [C1 C2 ...] — subtract a polynomial baseline from
        the observation (reference baseline())."""
        self.wb.baseline([float(x) for x in arg.split()])
        self._say("baseline subtracted")

    def do_write(self, arg):
        """write WHICH OUT.txt — export a spectrum as two-column text:
        current | sum | obs | residual | a stored name."""
        which, out = arg.split()
        self.wb.write_spectrum(which, out)
        self._say(f"wrote {which} to {out}")

    def do_residual(self, arg):
        """residual — print rms of obs minus the (summed) model."""
        freq, resid = self.wb.residual()
        self._say(f"residual over {freq.size} channels: "
                  f"rms {float(np.sqrt(np.nanmean(resid ** 2))):.4e} K")

    def do_ulim(self, arg):
        """ulim LL UL — rescale C to the upper limit set by the observed
        rms over [LL, UL] (reference set_ulim_c)."""
        parts = arg.split()
        self.wb.ulim(float(parts[0]), float(parts[1]))
        self._say(f"C -> {self.wb.C:.2e} cm-2 (upper limit)")

    def do_auto_ulim(self, arg):
        """auto_ulim — upper limit from the best-SNR line (reference
        autoset_ulim_c)."""
        best, C = self.wb.auto_ulim()
        self._say(f"best line {best:.4f} MHz; C -> {C:.2e} cm-2")

    # -- plots (PNG files instead of the reference's GUI window) -----------
    def do_plot(self, arg):
        """plot postage|range|harmonic ARGS... OUT.png — render to a file.

        plot postage OUT.png            — per-line stamps of obs vs sim
        plot range LL UL OUT.png        — one spectrum panel
        plot harmonic CF1,CF2,... RANGE OUT.png — recentered harmonic rows
        plot residual OUT.png           — obs+model over residual, two panels
        """
        from cha1_mcmc_tpu.pipeline.plots import (postage_plot, range_plot,
                                                  harmonic_plot)

        parts = shlex.split(arg)
        kind, out = parts[0], parts[-1]
        wb = self.wb
        if wb.freq_obs is None:
            self._say("load an observation first (obs PATH)")
            return
        if kind == "postage":
            lines = wb.freq_rest[np.argsort(wb.tau_sim)[::-1][:8]]
            fig = postage_plot(wb.freq_obs, wb.int_obs, np.sort(lines),
                               dV=wb.dV, vlsr=wb.vlsr,
                               freq_sim=wb.freq_sim, int_sim=wb.int_sim)
        elif kind == "range":
            fig = range_plot(wb.freq_obs, wb.int_obs,
                             [(float(parts[1]), float(parts[2]))],
                             freq_sim=wb.freq_sim, int_sim=wb.int_sim)
        elif kind == "harmonic":
            cfreqs = [float(x) for x in parts[1].split(",")]
            fig = harmonic_plot(cfreqs, float(parts[2]),
                                freq_obs=wb.freq_obs, int_obs=wb.int_obs,
                                sims=[(wb.freq_sim, wb.int_sim)])
        elif kind == "residual":
            # two shared-x panels: obs+model over residual (the reference
            # plot_residuals layout, simulate_lte.py:3638-3648)
            import matplotlib.pyplot as plt

            freq, resid = wb.residual()
            fm, im = (wb.sum_stored() if wb.stored
                      else (wb.freq_sim, wb.int_sim))
            fig, (ax1, ax2) = plt.subplots(2, sharex=True, figsize=(10, 6))
            ax1.step(wb.freq_obs, wb.int_obs, color="black", lw=0.8,
                     where="mid", label="obs")
            ax1.step(fm, im, color="red", lw=0.8, where="mid", label="model")
            ax1.legend(loc="upper right", fontsize=8)
            ax2.step(freq, resid, color="dodgerblue", lw=0.8, where="mid")
            ax2.set_xlabel("Frequency (MHz)")
            ax2.set_ylabel("obs - model (K)")
        else:
            self._say(f"unknown plot kind '{kind}'")
            return
        fig.savefig(out, dpi=100)
        self._say(f"wrote {out}")

    # -- session ------------------------------------------------------------
    def do_save(self, arg):
        """save PATH — save the session (PATH.json + PATH.npz)."""
        self.wb.save_session(arg.strip())
        self._say(f"saved session to {arg.strip()}.json/.npz")

    def do_restore(self, arg):
        """restore PATH — replace the session with a saved one."""
        self.wb = Workbench.restore_session(arg.strip())
        self._say(f"restored session from {arg.strip()} "
                  f"({len(self.wb.stored)} stored sims)")

    # -- exit ----------------------------------------------------------------
    def do_quit(self, arg):
        """quit — leave the shell."""
        return True

    do_exit = do_quit
    do_EOF = do_quit

    def emptyline(self):
        return False


def run_repl(session: str | None = None, stdin=None, stdout=None) -> None:
    wb = Workbench.restore_session(session) if session else None
    WorkbenchShell(wb, stdin=stdin, stdout=stdout).cmdloop()
