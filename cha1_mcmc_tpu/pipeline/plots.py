"""Spectrum plot engines: postage stamps, range plots, harmonic plots,
and corner-plot animation.

Non-interactive equivalents of the vendored tool's plot classes
(reference spectral_simulator/simulate_lte.py: PostagePlot/PostageStamp
:5869+/:8123, RangePlot/RangeMarker :6507, HarmonicPlot :6886) and the
DSN pipeline notebook's corner animations (reference
notebooks/DSN_pipeline.ipynb cells 3-5). All functions return matplotlib
figures (Agg) for the caller to show or save.
"""

from __future__ import annotations

import numpy as np

from cha1_mcmc_tpu.constants import CKM

__all__ = ["postage_plot", "range_plot", "harmonic_plot", "animate_corner"]


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    matplotlib.rcParams["text.usetex"] = False
    import matplotlib.pyplot as plt

    return plt


def postage_plot(freq_obs, int_obs, line_freqs, dV, *, freq_sim=None,
                 int_sim=None, nwidths: float = 40.0, velocity: bool = False,
                 vlsr: float = 0.0, ncols: int = 4, milli: bool = False):
    """Grid of per-line stamps: observation (and optionally simulation)
    within +-nwidths*dV of each line (reference PostagePlot semantics:
    nwidths, velocity axis, mK scaling).

    velocity=True plots the reference's *relative* velocity axis
    x = (f - center) * c / center (reference PostagePlot,
    simulate_lte.py:6085) with the stamp centered on the vlsr-shifted
    line position, so the source's line sits at x ~ 0 for raw-frame
    observations. The axis is an offset, not an absolute LSR velocity —
    the absolute frame depends on whether the observation was already
    Doppler-corrected (the shipped DSN spectra are; GOTHAM's are not),
    which a plot helper cannot know."""
    plt = _mpl()
    freq_obs = np.asarray(freq_obs)
    int_obs = np.asarray(int_obs) * (1e3 if milli else 1.0)
    line_freqs = np.atleast_1d(np.asarray(line_freqs, dtype=np.float64))
    n = line_freqs.size
    nrows = -(-n // ncols)
    fig, axes = plt.subplots(nrows, ncols, figsize=(3 * ncols, 2.2 * nrows),
                             squeeze=False)
    for i, lf in enumerate(line_freqs):
        ax = axes[i // ncols][i % ncols]
        shifted = lf * (1 - vlsr / CKM)
        half = nwidths * dV * shifted / CKM
        sel = (freq_obs > shifted - half) & (freq_obs < shifted + half)
        x = ((freq_obs[sel] - shifted) / shifted * CKM) if velocity else freq_obs[sel]
        ax.step(x, int_obs[sel], color="black", lw=0.8, where="mid")
        if freq_sim is not None:
            fs = np.asarray(freq_sim)
            sel_s = (fs > shifted - half) & (fs < shifted + half)
            xs = ((fs[sel_s] - shifted) / shifted * CKM) if velocity else fs[sel_s]
            ax.step(xs, np.asarray(int_sim)[sel_s] * (1e3 if milli else 1.0),
                    color="red", lw=0.8, where="mid")
        ax.set_title(f"{lf:.2f} MHz", fontsize=8)
        ax.tick_params(labelsize=7)
    for j in range(n, nrows * ncols):
        axes[j // ncols][j % ncols].set_visible(False)
    fig.supxlabel("Velocity offset (km/s)" if velocity else "Frequency (MHz)")
    fig.supylabel(("T (mK)" if milli else "T (K)"))
    fig.tight_layout()
    return fig


def range_plot(freq_obs, int_obs, ranges, *, freq_sim=None, int_sim=None,
               markers=(), ncols: int = 1):
    """Stacked spectrum panels over frequency ranges with optional line
    markers (reference RangePlot/RangeMarker semantics)."""
    plt = _mpl()
    freq_obs = np.asarray(freq_obs)
    int_obs = np.asarray(int_obs)
    n = len(ranges)
    nrows = -(-n // ncols)
    fig, axes = plt.subplots(nrows, ncols, figsize=(8 * ncols, 2.2 * nrows),
                             squeeze=False)
    for i, (lo, hi) in enumerate(ranges):
        ax = axes[i // ncols][i % ncols]
        sel = (freq_obs > lo) & (freq_obs < hi)
        ax.step(freq_obs[sel], int_obs[sel], color="black", lw=0.8, where="mid")
        if freq_sim is not None:
            fs = np.asarray(freq_sim)
            sel_s = (fs > lo) & (fs < hi)
            ax.step(fs[sel_s], np.asarray(int_sim)[sel_s], color="red",
                    lw=0.8, where="mid")
        for m in markers:
            if lo < m < hi:
                ax.axvline(m, color="dodgerblue", ls=":", lw=0.8)
        ax.set_xlim(lo, hi)
    fig.supxlabel("Frequency (MHz)")
    fig.supylabel("T (K)")
    fig.tight_layout()
    return fig


def harmonic_plot(cfreqs, chunk_range: float, *, freq_obs=None, int_obs=None,
                  sims=(), sim_colors=(), ylims=None, GHz: bool = False,
                  milli: bool = False, xticks: int = 5, yticks: int = 5,
                  obs_color: str = "black", figsize=None):
    """Harmonic-progression view (reference HarmonicPlot + make_harmonic_plot,
    simulate_lte.py:8242/:6886): one stacked row per center frequency, each
    showing every spectrum re-centered so cfreq sits at x=0 over
    +-chunk_range — vertically aligned rows reveal a linear rotor's
    harmonically related lines at a glance.

    cfreqs: center frequencies in the *scaled* frame, e.g. B0*(J+1)
    progressions. chunk_range: half-width of each row, same frame.
    freq_obs/int_obs: observation overlay (reference HP.obs flag).
    sims: iterable of (freq_sim, int_sim) pairs (the reference digs these
    out of its session archive by name; here they are passed explicitly).
    GHz=True declares the spectra are in GHz and converts them to MHz
    before recentering, exactly as the reference (freq *= 1000, then
    freq -= cfreq with cfreqs in MHz, simulate_lte.py:6975-6984); milli
    scales intensities to mK.
    """
    plt = _mpl()
    cfreqs = np.atleast_1d(np.asarray(cfreqs, dtype=np.float64))
    n = cfreqs.size
    fig, axes = plt.subplots(n, 1, figsize=figsize or (12, 2.0 * n),
                             squeeze=False)
    fscale = 1e3 if GHz else 1.0
    iscale = 1e3 if milli else 1.0
    colors = list(sim_colors) or ["red", "dodgerblue", "limegreen", "orange"]
    for x, cf in enumerate(cfreqs):
        ax = axes[x][0]
        # chunking window in the scaled (plot) frame, as the reference's
        # find_nearest(plt_ll/plt_ul) pair
        lo, hi = cf - chunk_range, cf + chunk_range
        if ylims is not None:
            ax.set_ylim(*ylims)
        ax.set_xlim(-chunk_range, chunk_range)
        if freq_obs is not None:
            fo = np.asarray(freq_obs) * fscale
            l_idx, u_idx = np.searchsorted(fo, [lo, hi])
            ax.step(fo[l_idx:u_idx] - cf,
                    np.asarray(int_obs)[l_idx:u_idx] * iscale,
                    color=obs_color, lw=1.0, where="mid", zorder=1)
        for i, (fs, isim) in enumerate(sims):
            fs = np.asarray(fs) * fscale
            l_idx, u_idx = np.searchsorted(fs, [lo, hi])
            ax.step(fs[l_idx:u_idx] - cf,
                    np.asarray(isim)[l_idx:u_idx] * iscale,
                    color=colors[i % len(colors)], lw=1.0, where="mid",
                    zorder=i + 3)
        ax.locator_params(axis="x", tight=True, nbins=xticks)
        ax.locator_params(axis="y", tight=True, nbins=yticks)
        ax.get_xaxis().get_major_formatter().set_scientific(False)
        ax.get_xaxis().get_major_formatter().set_useOffset(False)
        ax.minorticks_on()
        ax.tick_params(axis="both", which="both", direction="in")
        ax.annotate(f"{cf:.2f} MHz", xy=(0.99, 0.9), xycoords="axes fraction",
                    ha="right", fontsize=8)
    fig.supxlabel("Offset Frequency (MHz)")  # GHz inputs were scaled to MHz
    fig.supylabel("T (mK)" if milli else "T (K)")
    fig.subplots_adjust(hspace=0.2, wspace=0.1)
    return fig


def animate_corner(chain, labels, out_path: str, *, burn_in_frac: float = 0.2,
                   n_frames: int = 20, fixed_axes: bool = True, fps: int = 5,
                   bins: int = 30):
    """Animated corner plot over chain history (reference
    DSN_pipeline.ipynb cells 4-5: 20% burn-in, optional fixed axes,
    nonlinear frame schedule). Saves a GIF; returns the frame step indices.
    """
    plt = _mpl()
    from matplotlib import animation

    chain = np.asarray(chain)
    burn = int(burn_in_frac * chain.shape[1])
    chain = chain[:, burn:, :]
    nsteps = chain.shape[1]
    ndim = chain.shape[2]
    # Nonlinear (quadratic) frame schedule: dense early, sparse late
    # (the notebook uses a nonlinear timestep schedule).
    steps = np.unique((np.linspace(0.05, 1.0, n_frames) ** 2 * nsteps)
                      .astype(int).clip(2, nsteps))

    full = chain.reshape(-1, ndim)
    limits = [(full[:, i].min(), full[:, i].max()) for i in range(ndim)]

    fig, axes = plt.subplots(ndim, ndim, figsize=(2.0 * ndim, 2.0 * ndim))
    axes = np.atleast_2d(axes)

    def draw(frame_idx):
        upto = steps[frame_idx]
        samples = chain[:, :upto, :].reshape(-1, ndim)
        for i in range(ndim):
            for j in range(ndim):
                ax = axes[i, j]
                ax.clear()
                if j > i:
                    ax.set_visible(False)
                    continue
                if i == j:
                    rng = limits[i] if fixed_axes else None
                    ax.hist(samples[:, i], bins=bins, range=rng, color="k",
                            histtype="step")
                    ax.set_yticks([])
                else:
                    rng = [limits[j], limits[i]] if fixed_axes else None
                    ax.hist2d(samples[:, j], samples[:, i], bins=bins,
                              range=rng, cmap="Greys")
                ax.tick_params(labelsize=6)
                if i == ndim - 1:
                    ax.set_xlabel(labels[j], fontsize=7)
                if j == 0 and i > 0:
                    ax.set_ylabel(labels[i], fontsize=7)
        fig.suptitle(f"steps 0-{upto + burn}", fontsize=9)

    anim = animation.FuncAnimation(fig, draw, frames=len(steps))
    anim.save(out_path, writer=animation.PillowWriter(fps=fps))
    plt.close(fig)
    return steps
