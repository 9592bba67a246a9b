"""Fused whole-ensemble-step Pallas kernel for small models.

At latency-bound problem sizes (the flagship 9-line x 561-channel HC5N
fit at 128 walkers) the sampler spends ~85% of each step executing ~50
tiny XLA ops — gathers, the two half-updates, the forward model — each
individually launch-bound on the TPU (measured: 21.6 us/step with a
trivial lnprob vs 25.4 us with the real one). This module collapses the
ENTIRE ensemble step — both sequential half-updates, each with walker
gathers, the LTE forward model, the prior, and the acceptance scatter —
into ONE Pallas program per step.

TPU-native techniques:
  * gathers/scatters as exact one-hot matmuls on the MXU
    (`precision=HIGHEST` keeps them f32-exact: the 3-pass bf16
    decomposition reconstructs products with 0.0/1.0 exactly);
  * the whole (h, L, C) model intermediate lives in VMEM (~1.3 MB);
  * randomness is pre-generated outside and consumed as scan inputs,
    exactly like sampler/stretch.py:run_ensemble.

Semantics are emcee-v3 stretch-move, identical to run_ensemble (same
formulas, same PRNG stream): walker trajectories come out
bitwise-identical on the tested streams (CPU interpreter and compiled
v5e; the one-hot gathers are exact), with lnp agreeing to the last f32
ulp (in-kernel chi-2 reduction order can differ, which in principle can
flip a marginal acceptance — none observed over 40k-step runs; the
posterior-parity gates cover the pipeline either way). Measured on the
v5e at the flagship size with two-length slope timing (which cancels
this machine's fixed ~30 ms per-dispatch relay overhead — see bench.py):
~5 us/step at k_steps=16, i.e. ~24-25M walker-steps/s for one
128-walker chain; the general scan is ~2.4x slower (BENCH_r*.json
records the per-round measurement).

Scope: single-component problems (4-dim fixed- or 5-dim free-source-
size) — the flagship and MCMC_variable_source_size families — with
either an analytic Q(T) polynomial or the state-sum fallback (the
(g, E) Boltzmann arrays evaluate as an in-kernel VPU block, so
fallback-Q species like the aromatics take the fast path too).
Multi-component layouts use sampler/fused_multi.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from cha1_mcmc_tpu.constants import (FWHM_TO_SIGMA_MODEL, KCM,
                                     VELOCITY_WINDOW_DV)
from cha1_mcmc_tpu.ops.lte import planck_J, beam_dilution, tau_sticks

__all__ = ["make_fused_ensemble", "FusedEnsembleSampler"]


def _make_q_of(q_kind, q_coeffs, q_power, q_scale, qst_ref):
    """In-kernel Q(T) evaluator, (n, 1) Tex -> (n, 1) Q — shared by every
    fused-kernel variant (this module and sampler/fused_gather.py).

    q_kind == "cheb" is the Chebyshev device surrogate for huge state
    sums (catalogs/partition.py:fit_device_cheb): q_coeffs are the
    Chebyshev-T coefficients and q_power carries the (t_lo, t_hi) fit
    interval — a handful of fused VPU ops replacing the 16k-state
    Boltzmann walk that dominated the dense kernel's eval cost."""
    def q_of(Tex):
        if q_kind == "cheb":
            t_lo, t_hi = q_power
            x = (Tex - t_lo) * (2.0 / (t_hi - t_lo)) - 1.0
            bk1 = jnp.zeros_like(x)
            bk2 = jnp.zeros_like(x)
            for c in q_coeffs[:0:-1]:         # c_deg .. c_1
                bk1, bk2 = c + 2.0 * x * bk1 - bk2, bk1
            return q_coeffs[0] + x * bk1 - bk2
        if q_kind == "states":
            # State-sum fallback Q(T) = sum_s g_s exp(-E_s / (kcm T))
            # (reference functions.py:263-325; catalogs/partition.py): a
            # few-KB (n, S) Boltzmann block on the VPU, so fallback-Q
            # species (incl. the aromatics whose dispatch deliberately
            # misses) take the fused path too.
            g_row = qst_ref[0:1, :]                      # (1, S)
            E_row = qst_ref[1:2, :]
            boltz = jnp.exp(-E_row / (KCM * Tex))        # (n, S)
            return jnp.sum(g_row * boltz, axis=1, keepdims=True)
        q = jnp.zeros_like(Tex)
        for i, c in enumerate(q_coeffs):
            q = q + c * Tex ** i
        if q_power is not None:
            pa, pb = q_power
            q = q + pa * Tex ** pb
        return q_scale * q

    return q_of


def _unpack_single(th, ss):
    """Single-component theta unpack, (n, D) -> (n, 1) columns.

    ss None means the free-source-size 5-dim layout (ss, Ncol, Tex, vlsr,
    dV); a float means the 4-dim fixed-ss layout (reference
    inference.py:87-96)."""
    dt = th.dtype  # keep scalar constants in the walkers' dtype so the
    # f64 verification mode cross-checks the kernel bitwise against the
    # general sampler (f32-rounding Tbg/ss would perturb lnp at ~1e-8)
    if ss is None:
        ss_w = th[:, 0:1]
        Ncol, Tex = th[:, 1:2], th[:, 2:3]
        vlsr, dV = th[:, 3:4], th[:, 4:5]
    else:
        ss_w = jnp.asarray(ss, dt)
        Ncol, Tex = th[:, 0:1], th[:, 1:2]
        vlsr, dV = th[:, 2:3], th[:, 3:4]
    return ss_w, Ncol, Tex, vlsr, dV


def _rt_chi2_block(th_dtype, ss_w, Tex, opac, gf, y, isig, *, dish_size,
                   Tbg):
    """Radiative transfer + chi^2 partial over one channel block,
    (n, Cb) opac -> (n, 1). Exactly the reference's op sequence
    (inference.py:44-61 RT with the 1e-10 guard, :160 chi^2). Split out
    of _lnprob_tail so the channel-blocked dense kernel
    (sampler/fused_gather.py) can accumulate per-block partials without
    holding a full (n, C) opacity in scoped VMEM."""
    J_T = planck_J(jnp, gf, Tex, guard=1e-10)
    J_Tbg = planck_J(jnp, gf, jnp.asarray(Tbg, th_dtype), guard=1e-10)
    dil = beam_dilution(jnp, gf, ss_w, dish_size)
    m = dil * (J_T - J_Tbg) * (1.0 - jnp.exp(-opac))
    resid = y - m
    return -0.5 * jnp.sum(resid * resid * isig - jnp.log(isig),
                          axis=-1, keepdims=True)         # (n, 1)


def _prior_box(th, Tex, *, ss, bounds_lo, bounds_hi, prior_mean,
               prior_std):
    """Box-bounds mask + Gaussian priors (flat on Ncol), (n, D) theta ->
    ((n, 1) bool ok, (n, 1) lp). Reference inference.py:193-246 with the
    sigma overrides already baked into prior_std by the statics builders."""
    ok = jnp.ones_like(Tex, dtype=jnp.bool_)
    for i, (lo_b, hi_b) in enumerate(zip(bounds_lo, bounds_hi)):
        ok = ok & (th[:, i:i + 1] > lo_b) & (th[:, i:i + 1] < hi_b)
    lp = jnp.zeros_like(Tex)
    ncol_idx = 0 if ss is not None else 1
    for i in range(len(bounds_lo)):  # Gaussian priors; Ncol flat
        if i == ncol_idx:
            continue
        mu, sd = prior_mean[i], prior_std[i]
        lp = lp + (np.log(1.0 / (np.sqrt(2.0 * np.pi) * sd))
                   - 0.5 * ((th[:, i:i + 1] - mu) / sd) ** 2)
    return ok, lp


def _lnprob_tail(th, ss_w, Tex, opac, gf, y, isig, *, ss, dish_size, Tbg,
                 bounds_lo, bounds_hi, prior_mean, prior_std):
    """Radiative transfer + chi^2 + box/Gaussian priors from an opacity
    block, (n, C) opac -> (n, 1) lnprob. Exactly the op sequence the
    original in-kernel lnprob used (reference inference.py:44-61 RT,
    :127-166 chi^2, :193-246 priors), shared by the fused-kernel
    variants."""
    ll = _rt_chi2_block(th.dtype, ss_w, Tex, opac, gf, y, isig,
                        dish_size=dish_size, Tbg=Tbg)
    ok, lp = _prior_box(th, Tex, ss=ss, bounds_lo=bounds_lo,
                        bounds_hi=bounds_hi, prior_mean=prior_mean,
                        prior_std=prior_std)
    val = lp + ll
    return jnp.where(ok & jnp.isfinite(val), val, -jnp.inf)


def _make_dense_lnprob(lines_ref, vel_ref, chans_ref, qst_ref, *,
                       ss, dish_size, Tbg, mask_center, q_kind, q_coeffs,
                       q_power, q_scale, bounds_lo, bounds_hi, prior_mean,
                       prior_std):
    """In-kernel dense-grid lnprob builder, (n, D) theta -> (n, 1) —
    shared by the whole-step kernel here and the sharded half-step kernel
    (parallel/sharded_fused.py)."""
    lf, le, la, lg, lgl = (lines_ref[i:i + 1, :] for i in range(5))
    gf = chans_ref[0:1, :]
    y = chans_ref[1:2, :]
    isig = chans_ref[2:3, :]
    vel = vel_ref[:]
    q_of = _make_q_of(q_kind, q_coeffs, q_power, q_scale, qst_ref)

    def lnprob(th):  # (n, D) -> (n, 1)
        ss_w, Ncol, Tex, vlsr, dV = _unpack_single(th, ss)
        taus = tau_sticks(jnp, lf, le, la, lg, lgl,
                          q_of(Tex), Ncol, Tex, dV)           # (n, L)
        # exp(-0.5 ((v - vlsr)/sigma)^2) as exp2(aa * d^2): one per-walker
        # scalar aa = -log2(e)/(2 sigma^2) replaces a per-element divide
        # (the (n, L, C) elementwise block dominates this kernel's cost)
        sigma = (dV / FWHM_TO_SIGMA_MODEL)[:, :, None]        # (n, 1, 1)
        aa = (-0.5 * np.log2(np.e)) / (sigma * sigma)
        window = (jnp.abs(vel[None] - mask_center)
                  < VELOCITY_WINDOW_DV * dV[:, :, None])
        d = vel[None] - vlsr[:, :, None]                      # (n, L, C)
        gauss = jnp.where(window, jnp.exp2(aa * (d * d)), 0.0)
        opac = jnp.sum(taus[:, :, None] * gauss, axis=1)      # (n, C)
        return _lnprob_tail(th, ss_w, Tex, opac, gf, y, isig, ss=ss,
                            dish_size=dish_size, Tbg=Tbg,
                            bounds_lo=bounds_lo, bounds_hi=bounds_hi,
                            prior_mean=prior_mean, prior_std=prior_std)

    return lnprob


def _step_kernel(coords_ref, lnp_ref, perm_ref, zu_ref, pair_ref, au_ref,
                 lines_ref, vel_ref, chans_ref, qst_ref,
                 out_chain_ref, out_lnps_ref, out_acc_ref, *,
                 a, h, k_steps, ss, dish_size, Tbg, mask_center, q_kind,
                 q_coeffs, q_power, q_scale, bounds_lo, bounds_hi,
                 prior_mean, prior_std):
    lnprob = _make_dense_lnprob(
        lines_ref, vel_ref, chans_ref, qst_ref, ss=ss, dish_size=dish_size,
        Tbg=Tbg, mask_center=mask_center, q_kind=q_kind, q_coeffs=q_coeffs,
        q_power=q_power, q_scale=q_scale, bounds_lo=bounds_lo,
        bounds_hi=bounds_hi, prior_mean=prior_mean, prior_std=prior_std)

    _run_step_loop(coords_ref, lnp_ref, perm_ref, zu_ref, pair_ref, au_ref,
                   out_chain_ref, out_lnps_ref, out_acc_ref, lnprob,
                   a=a, h=h, k_steps=k_steps)


def _run_step_loop(coords_ref, lnp_ref, perm_ref, zu_ref, pair_ref, au_ref,
                   out_chain_ref, out_lnps_ref, out_acc_ref, lnprob, *,
                   a, h, k_steps):
    """The fused ensemble-step machinery: k_steps unrolled stretch-move
    steps (two sequential half-updates each, emcee-v3 semantics — module
    docstring) around an arbitrary in-kernel `lnprob((h, D)) -> (h, 1)`.
    Shared by the dense-grid kernel above and the channel-major gather
    kernel in sampler/fused_gather.py."""
    W, D = coords_ref.shape
    wdt = coords_ref.dtype  # selector/accumulation dtype follows the
    # walkers (f64 verification mode keeps the one-hot matmuls f64-exact)

    def onehot(rows):  # (h, 1) int32 -> (h, W) exact selector
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, W), 1)
        return (cols == rows).astype(wdt)

    def gather(sel, m):  # exact: each row multiplies one entry by 1.0
        return jnp.dot(sel, m, preferred_element_type=wdt,
                       precision=jax.lax.Precision.HIGHEST)

    # state carries coords || lnp as one (W, D+1) block so every gather /
    # scatter is a single one-hot matmul instead of two
    state = jnp.concatenate([coords_ref[:], lnp_ref[:]], axis=1)
    # k_steps full ensemble steps per kernel invocation (unrolled), each
    # consuming its own slice of the pre-generated randomness — amortizes
    # the per-call overhead that dominates at this problem size.
    for step in range(k_steps):
        step_acc = jnp.zeros((1, 1), jnp.float32)
        perm = perm_ref[step * W:(step + 1) * W, :]
        for half in range(2):
            r = 2 * step + half
            active = perm[half * h:(half + 1) * h, :]
            comp = perm[(1 - half) * h:(2 - half) * h, :]
            sel_a = onehot(active)
            sa = gather(sel_a, state)                             # (h, D+1)
            s, lnp_s = sa[:, :D], sa[:, D:]
            # partner: pair indexes into the complementary half
            comp_rows = gather(onehot(comp), state)[:, :D]        # (h, D)
            sel_p = (jax.lax.broadcasted_iota(jnp.int32, (h, h), 1)
                     == pair_ref[r:r + 1, :].T).astype(wdt)
            c = jnp.dot(sel_p, comp_rows,
                        preferred_element_type=wdt,
                        precision=jax.lax.Precision.HIGHEST)      # (h, D)
            zz = (((a - 1.0) * zu_ref[r:r + 1, :] + 1.0) ** 2 / a).T
            proposal = c + zz * (s - c)                           # (h, D)
            lnp_new = lnprob(proposal)
            lnpdiff = (D - 1.0) * jnp.log(zz) + lnp_new - lnp_s
            accept = jnp.log(au_ref[r:r + 1, :]).T < lnpdiff      # (h, 1)
            # Scatter back by select, not by adding a delta: s + (prop - s)
            # can round away from prop by an ulp on large moves, while an
            # exact one-hot matmul + where keeps stored coordinates
            # bitwise-equal to the general sampler's .at[].set. The values
            # MUST be masked to the accepted rows BEFORE the matmul: a
            # rejected proposal's lnp_new is -inf, and 0 * (-inf) = NaN
            # would poison the whole contracted column (accepted rows are
            # always finite: accept requires lnpdiff > log u > -inf).
            vals = jnp.where(accept,
                             jnp.concatenate([proposal, lnp_new], axis=1),
                             0.0)                                 # (h, D+1)
            newvals = jnp.dot(sel_a.T, vals, preferred_element_type=wdt,
                              precision=jax.lax.Precision.HIGHEST)
            acc_w = jnp.dot(sel_a.T, accept.astype(wdt),
                            preferred_element_type=wdt,
                            precision=jax.lax.Precision.HIGHEST)  # (W, 1)
            state = jnp.where(acc_w > 0.5, newvals, state)
            step_acc = step_acc + jnp.sum(accept.astype(jnp.float32))
        out_chain_ref[step * W:(step + 1) * W, :] = state[:, :D]
        out_lnps_ref[step * W:(step + 1) * W, :] = state[:, D:]
        out_acc_ref[step:step + 1, :] = step_acc


def make_fused_ensemble(model, spec, grid_ints, grid_yerrs, bounds,
                        prior_means, prior_stds, *, a: float = 2.0,
                        interpret: bool = False):
    """Build `run(pos0, lnp0, key, nsteps) -> (chain, lnps, accepted,
    (pos, lnp))` with run_ensemble's exact contract and PRNG stream, each
    step executing as one fused Pallas program.

    bounds / prior_means / prior_stds follow single_component_lnprior's
    vocabulary (4-dim fixed-source-size layout; sigma_vlsr/sigma_dV
    overridden to 0.8/0.3 * mean_dV, reference inference.py:200-201).
    """
    statics, tables = single_statics_tables(model, spec, grid_ints,
                                            grid_yerrs, bounds, prior_means,
                                            prior_stds)
    kernel = functools.partial(_step_kernel, a=a, **statics)
    return _make_fused_run(kernel, tables, interpret=interpret)


def single_statics_tables(model, spec, grid_ints, grid_yerrs, bounds,
                          prior_means, prior_stds):
    """Static kwargs + device tables for the single-component in-kernel
    lnprob (_make_dense_lnprob) — shared by the whole-step kernel above
    and the sharded half-step kernel (parallel/sharded_fused.py)."""
    if spec.ncomp != 1:
        raise ValueError("fused path supports single-component layouts only"
                         " (use sampler.fused_multi for ncomp > 1)")
    qm = model.q_model

    free_ss = spec.fixed_source_size is None
    means = np.asarray(prior_means, dtype=np.float64)
    stds = np.asarray(prior_stds, dtype=np.float64).copy()
    dv_mean = means[4] if free_ss else means[3]
    stds[-2] = dv_mean * 0.8   # sigma_vlsr override
    stds[-1] = dv_mean * 0.3   # sigma_dV override
    names = (["source_size"] if free_ss else []) + ["Ncol", "Tex", "vlsr", "dV"]
    lo = tuple(float(bounds[k][0]) for k in names)
    hi = tuple(float(bounds[k][1]) for k in names)

    lines = jnp.stack([model.line_freq, model.line_elower, model.line_aij,
                       model.line_gup, model.line_glow])       # (5, L)
    chans = jnp.stack([model.grid_freq,
                       jnp.asarray(grid_ints, model.dtype),
                       1.0 / jnp.asarray(grid_yerrs, model.dtype) ** 2])
    vel = model.vel_grid
    if qm.cheb_coeffs is not None:
        # Chebyshev device surrogate (partition.py:fit_device_cheb):
        # q_power carries the fit interval — see _make_q_of.
        qst = jnp.zeros((2, 8), model.dtype)
        q_static = dict(q_kind="cheb", q_coeffs=qm.cheb_coeffs,
                        q_power=qm.cheb_interval, q_scale=1.0)
    elif qm.kind == "states":
        qst = jnp.asarray(np.stack([np.asarray(qm.g), np.asarray(qm.E)]),
                          model.dtype)                         # (2, S)
        q_static = dict(q_kind="states", q_coeffs=(), q_power=None,
                        q_scale=1.0)
    else:
        qst = jnp.zeros((2, 8), model.dtype)
        q_static = dict(q_kind="analytic", q_coeffs=qm.coeffs,
                        q_power=qm.power, q_scale=qm.scale)

    statics = dict(
        ss=None if free_ss else float(spec.fixed_source_size),
        dish_size=float(model.dish_size), Tbg=float(model.Tbg),
        mask_center=float(model.mask_center), **q_static,
        bounds_lo=lo, bounds_hi=hi,
        prior_mean=tuple(means), prior_std=tuple(stds))
    return statics, (lines, vel, chans, qst)


def _make_fused_run(kernel, tables, *, interpret: bool = False,
                    max_walkers: int | None = None, scratch_shapes=None):
    """Wrap a fused step kernel (statics bound except h/k_steps) into the
    run(pos0, lnp0, key, nsteps) contract shared by every fused sampler
    variant: run_ensemble's exact PRNG stream layout, lax.scan over
    k_steps-sized kernel launches, and the -inf <-> finfo.min boundary
    clamp. `tables` are the static device arrays appended to each
    pallas_call after the per-block randomness. `max_walkers` guards
    kernels whose static plan (walker chunking / VMEM gate) was sized for
    a specific ensemble size. `scratch_shapes`, when given, is a callable
    (h, dtype) -> list of pltpu scratch allocations appended to the
    kernel's trailing parameters (VMEM scratch lives OUTSIDE the Mosaic
    scoped stack — see _make_gather_lnprob's LIFO note)."""

    @functools.partial(jax.jit, static_argnames=("nsteps", "k_steps"))
    def run(pos0, lnp0, key, nsteps: int, k_steps: int = 16):
        if max_walkers is not None and pos0.shape[0] > max_walkers:
            raise ValueError(
                f"pos0 carries {pos0.shape[0]} walkers but the kernel's "
                f"plan (and its VMEM gate) was sized for "
                f"nwalkers={max_walkers}; rebuild with the larger count")
        # k_steps default from a v5e sweep at the flagship size (128
        # walkers): 20.2 us/step @ k=8, 18.7 @ k=16, 18.4 @ k=32, 19.2 @
        # k=64 — k=16 takes most of the launch-amortization gain at half
        # of k=32's unrolled program size / compile time.
        W, D = pos0.shape
        if W % 2:
            raise ValueError(f"nwalkers={W} must be even")
        h = W // 2
        # The in-kernel walker gathers are one-hot matmuls, so a -inf
        # entry lnp (out-of-bounds initial walker) would NaN-poison the
        # contraction (0 * -inf). Clamp to the dtype minimum: acceptance
        # behaves identically (lnpdiff is astronomically positive either
        # way) and the value is replaced at the walker's first accept.
        lnp0 = jnp.where(jnp.isfinite(lnp0), lnp0,
                         jnp.finfo(pos0.dtype).min)
        while nsteps % k_steps:       # static: largest divisor <= k_steps
            k_steps -= 1
        nblocks = nsteps // k_steps
        step = functools.partial(kernel, h=h, k_steps=k_steps)

        # Bulk RNG, the same stream layout as run_ensemble
        k_perm, k_z, k_pair, k_acc = jax.random.split(key, 4)
        perms = jnp.argsort(jax.random.uniform(k_perm, (nsteps, W)), axis=1)
        z_u = jax.random.uniform(k_z, (nsteps, 2, h), dtype=pos0.dtype)
        pair = jax.random.randint(k_pair, (nsteps, 2, h), 0, h)
        acc_u = jax.random.uniform(k_acc, (nsteps, 2, h), dtype=pos0.dtype)
        # block layout: the kernel's inner step r = 2*step + half indexes
        # the (2*k, h) slices in (step, half) order
        perms_b = perms.reshape(nblocks, k_steps * W, 1)
        z_b = z_u.reshape(nblocks, 2 * k_steps, h)
        pair_b = pair.reshape(nblocks, 2 * k_steps, h)
        acc_b = acc_u.reshape(nblocks, 2 * k_steps, h)

        call = pl.pallas_call(
            step,
            out_shape=(jax.ShapeDtypeStruct((k_steps * W, D), pos0.dtype),
                       jax.ShapeDtypeStruct((k_steps * W, 1), pos0.dtype),
                       jax.ShapeDtypeStruct((k_steps, 1), jnp.float32)),
            scratch_shapes=(scratch_shapes(h, pos0.dtype)
                            if scratch_shapes is not None else ()),
            interpret=interpret,
        )

        def one_block(carry, xs):
            coords, lnp = carry
            perm, zu, pr, au = xs
            chain_blk, lnps_blk, acc = call(coords, lnp, perm, zu, pr, au,
                                            *tables)
            coords = chain_blk[(k_steps - 1) * W:, :]
            lnp = lnps_blk[(k_steps - 1) * W:, :]
            return (coords, lnp), (chain_blk.reshape(k_steps, W, D),
                                   lnps_blk.reshape(k_steps, W), acc[:, 0])

        (pos, lnp), (chain, lnps, accepted) = jax.lax.scan(
            one_block, (pos0, lnp0[:, None]), (perms_b, z_b, pair_b, acc_b))
        # Restore the entry clamp to -inf at the output boundary so the
        # recorded lnps match the general sampler's contract for walkers
        # that never accepted (finfo.min is unreachable as a genuine lnp).
        fmin = jnp.finfo(pos0.dtype).min
        lnps = jnp.where(lnps == fmin, -jnp.inf, lnps)
        lnp = jnp.where(lnp == fmin, -jnp.inf, lnp)
        return (chain.reshape(nsteps, W, D), lnps.reshape(nsteps, W),
                accepted.reshape(nsteps), (pos, lnp[:, 0]))

    return run


import dataclasses

from cha1_mcmc_tpu.sampler.stretch import EnsembleSampler


@dataclasses.dataclass
class FusedEnsembleSampler(EnsembleSampler):
    """EnsembleSampler whose blocks run through the fused step kernel.

    Walker trajectories are bitwise-identical to the general sampler's
    on the tested streams (lnp to the last ulp), so checkpoints,
    .state.npz resume, and chain files interoperate freely with it. `lnprob_fn`
    stays the general scalar lnprob (used only to initialize lnp);
    `run_fn` comes from make_fused_ensemble.
    """

    run_fn: callable = None

    def __post_init__(self):
        super().__post_init__()
        if self.run_fn is None:
            raise ValueError("FusedEnsembleSampler requires run_fn from "
                             "make_fused_ensemble")

    def _run_block(self, pos, lnp, key, nsteps: int, thin: int):
        # The fused run reproduces run_ensemble's bulk PRNG stream layout
        # for n_raw = nsteps * thin raw moves, so thinning is exact: run
        # the raw chain and keep every thin-th recorded state — bitwise
        # what run_ensemble(nsteps, thin=thin) records.
        chain, lnps, acc, final = self.run_fn(pos, lnp, key, nsteps * thin)
        if thin == 1:
            return chain, lnps, acc, final
        return (chain[thin - 1::thin], lnps[thin - 1::thin],
                acc.reshape(nsteps, thin).sum(axis=1), final)
