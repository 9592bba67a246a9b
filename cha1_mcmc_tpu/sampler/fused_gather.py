"""Fused whole-ensemble-step kernel for dense catalogs (channel-major).

The dense-aromatic stress case (SURVEY §6: 35,460-transition
1-cyanonaphthalene, reference catalog/1-cyanonapthalene.cat, fit with the
same machinery as reference inference.py:127-253) cannot take
sampler/fused.py's whole-(h, L, C)-in-VMEM kernel — that intermediate is
~0.6 TB. The batched gather likelihood (inference/likelihood.py +
models/pallas_kernels.py channel-major tables) already reduces the work to
the ~21k (line, channel) pairs whose ±10·dV windows can ever overlap a
channel, but driving it through the general lax.scan sampler leaves ~40%
of each ensemble step in per-op dispatch overhead (measured: 127 us/step
vs 74 us for the batched lnprob itself, BASELINE.md).

This kernel fuses the ENTIRE step for dense catalogs by re-expressing the
forward model in the gather tables' channel-major layout:

  * the static tables carry the five line constants *per table entry*
    (5, M1, C) instead of per line — tau is recomputed on the VPU at each
    in-window (line, channel) pair rather than gathered, because Mosaic
    has no cheap in-kernel gather and a one-hot contraction over ~5k
    active lines would dwarf the tau arithmetic it replaces. The total
    element count (~21k) is within ~4x of the active line count, so the
    recompute costs roughly one extra exp per element while eliminating
    every inter-op round trip;
  * the heavy-channel overflow table (M2, C2) is scattered back onto the
    channel axis with the same exact one-hot MXU contraction as
    models/pallas_kernels.py:opacity_gather_split (each output channel
    receives at most one overflow row, so f32 HIGHEST precision is exact);
  * walkers are processed in static chunks of `wchunk` so the dominant
    (wchunk, M1, C) temporaries stay inside VMEM for any table size that
    passes fused_gather_supported;
  * the stretch-move machinery (one-hot walker gathers/scatters, the two
    sequential half-updates, bulk pre-generated randomness) is shared
    verbatim with sampler/fused.py (_run_step_loop / _make_fused_run),
    so the PRNG stream and chain contract are identical to run_ensemble.

Semantics: emcee-v3 stretch move, same stream as run_ensemble — walker
trajectories match the general sampler bitwise on the tested streams;
lnp agrees to f32 ulps (the in-kernel Gaussian uses the exp2
reformulation and the chi^2 reduction order differs, exactly as
sampler/fused.py documents).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from cha1_mcmc_tpu.constants import FWHM_TO_SIGMA_MODEL, VELOCITY_WINDOW_DV
from cha1_mcmc_tpu.ops.lte import tau_sticks
from cha1_mcmc_tpu.sampler.fused import (_lnprob_tail, _make_fused_run,
                                         _make_q_of, _run_step_loop,
                                         _unpack_single)

__all__ = ["build_dense_tables", "fused_gather_supported",
           "gather_statics_tables", "make_fused_ensemble_gather",
           "plan_fused_gather", "replan_wchunk"]

#: velocity value marking padding entries — Gaussian exactly 0 in f32
#: (matches models/pallas_kernels.py's gather-table padding convention)
_PAD_VEL = 1e30


def build_dense_tables(model, dv_max: float, min_saving: float = 1.3):
    """Host-side channel-major line-constant tables for the fused kernel.

    Reuses build_opacity_gather(_split)'s window analysis, then expands
    the five line constants (freq, elower, aij, gup, glow) into the table
    layout so the kernel needs no in-kernel gather. Padding entries carry
    the active subset's line-0 constants (tau finite) and velocity 1e30
    (Gaussian exactly 0), so they contribute exactly nothing.

    Returns a dict with f32/int host arrays:
      lines1 (5*M1, C), vel1 (M1, C)          — main table
      lines2 (5*M2, C2), vel2 (M2, C2),
      scat (C2, C)                            — heavy-channel overflow
                                                 (M2 == 1 row of padding
                                                 and scat == 0 when the
                                                 split isn't worthwhile)
      has_overflow (bool), n_elems (int), active ((La,) int)
    """
    from cha1_mcmc_tpu.models.pallas_kernels import (
        build_opacity_gather, build_opacity_gather_split,
        heavy_scatter_onehot)

    vg = np.asarray(model.vel_grid)
    C = vg.shape[1]
    dtype = np.float32 if model.dtype == jnp.float32 else np.float64
    consts = np.stack([np.asarray(model.line_freq),
                       np.asarray(model.line_elower),
                       np.asarray(model.line_aij),
                       np.asarray(model.line_gup),
                       np.asarray(model.line_glow)]).astype(dtype)  # (5, L)
    split = build_opacity_gather_split(vg, model.mask_center, dv_max,
                                       min_saving=min_saving)
    if split is not None:
        t1, v1, t2, v2, heavy, active = split
        scat = heavy_scatter_onehot(heavy, C).astype(dtype)
        has_overflow = True
    else:
        t1, v1, active = build_opacity_gather(vg, model.mask_center, dv_max)
        t2 = np.zeros((1, 1), np.int32)
        v2 = np.full((1, 1), _PAD_VEL, vg.dtype)
        scat = np.zeros((1, C), dtype)
        has_overflow = False
    sub = consts[:, active]                                  # (5, La)
    lines1 = sub[:, t1].reshape(5 * t1.shape[0], C)
    lines2 = sub[:, t2].reshape(5 * t2.shape[0], t2.shape[1])
    n_elems = t1.size + (t2.size if has_overflow else 0)
    return dict(lines1=lines1, vel1=v1.astype(dtype),
                lines2=lines2, vel2=v2.astype(dtype), scat=scat,
                has_overflow=has_overflow, n_elems=int(n_elems),
                active=active)


def _pad_tile(m: int, c: int) -> int:
    """Element count of an (m, c) block after Mosaic's (8, 128) tiling."""
    return -(-m // 8) * 8 * (-(-c // 128) * 128)


def _padded_elems(tables) -> int:
    """Padded element count of one (wchunk, M*, C*) temporary layer.

    Mosaic tiles the trailing (M, C*) dims of the per-chunk 3-D
    temporaries to (8, 128), so the scoped-stack cost follows the PADDED
    table sizes, not n_elems: the bench-dense main table is (6, 2048) ->
    (8, 2048) (+33%) and its overflow table (40, 223) -> (40, 256)."""
    M1, C = tables["vel1"].shape
    M2, C2 = tables["vel2"].shape
    padded = _pad_tile(M1, C)
    if tables["has_overflow"]:
        padded += _pad_tile(M2, C2)
    return padded


def _vmem_estimate(tables, C: int, n_states: int, wchunk: int,
                   nwalkers: int) -> int:
    """Scoped-VMEM working-set model (bytes), calibrated against the one
    measured on-chip data point (v5e terminal compile of the bench-dense
    program, wchunk=16: "Scoped allocation with size 19.58M"): ~8 live
    padded (wchunk, M, C*) blocks through tau_sticks' elementwise chain
    and the windowed Gaussian, ~3 live (wchunk, S) blocks in the
    state-sum Q, 4 (wchunk, C) channel rows in the RT/chi^2 tail, plus
    the static tables and the step loop's selectors. At the calibration
    point this model says 19.9M — slightly conservative by design."""
    M1, C1 = tables["vel1"].shape
    M2, C2 = tables["vel2"].shape
    s_pad = -(-n_states // 128) * 128
    static = 4 * (6 * (M1 * C1 + M2 * C2) + C2 * C + 3 * C + 2 * n_states)
    chunk = 4 * wchunk * (8 * _padded_elems(tables) + 3 * s_pad + 4 * C)
    h = nwalkers // 2
    loop = 4 * (3 * h * nwalkers + 2 * nwalkers * 8)
    return static + chunk + loop


def _pick_wchunk(tables, C: int, n_states: int,
                 nwalkers: int, budget: int) -> int | None:
    h = max(nwalkers // 2, 1)
    for wchunk in (h, 64, 32, 16, 8):
        if wchunk > h:
            continue
        if _vmem_estimate(tables, C, n_states, wchunk, nwalkers) <= budget:
            return wchunk
    return None


#: Default planning budget. The kernel's temporaries live in the Mosaic
#: scoped-VMEM stack, whose compiler limit on the v5e is 16 MiB — NOT the
#: 128 MiB VMEM total that sampler/fused.py's whole-grid gate budgets
#: against. Two terminal compiles of the bench-dense program measured the
#: ceiling: wchunk=64 (planned under the original 48 MiB budget) failed at
#: "Scoped allocation with size 25.50M and limit 16.00M", and wchunk=16
#: (planned under 12 MiB with the pre-padding estimator, which said
#: 9.2 MiB) still failed at 19.58M — Mosaic pads the (wchunk, M, C*)
#: temporaries to (8, 128) tiles and keeps more of them live than the old
#: model counted. _vmem_estimate is now calibrated to the 19.58M point;
#: 12 MiB of modeled budget leaves ~4 MiB of real headroom below the
#: compiler limit.
_SCOPED_VMEM_BUDGET = 12 << 20


def plan_fused_gather(model, spec, dv_max: float, nwalkers: int = 128,
                      budget: int = _SCOPED_VMEM_BUDGET,
                      min_saving: float = 1.3):
    """Build the channel-major tables and pick the walker chunk, or return
    None when (model, spec) cannot take the fused kernel (multi-component
    layout, or tables over the VMEM budget). Returns (tables, wchunk).

    Table construction on a 35k-line catalog costs seconds of host time
    (the (L, C) window scan), so callers that first check support and then
    build the kernel should do both through this one plan (pipeline/fit.py
    passes the plan into make_fused_ensemble_gather via `plan=`)."""
    if spec.ncomp != 1:
        return None
    tables = build_dense_tables(model, dv_max, min_saving=min_saving)
    qm = model.q_model
    n_states = 0 if qm.kind == "analytic" else int(np.size(qm.g))
    wchunk = _pick_wchunk(tables, int(model.n_channels), n_states, nwalkers,
                          budget)
    return None if wchunk is None else (tables, wchunk)


def fused_gather_supported(model, spec, dv_max: float, nwalkers: int = 128,
                           budget: int = _SCOPED_VMEM_BUDGET) -> bool:
    """Can (model, spec) run through the fused channel-major kernel within
    the scoped-VMEM budget? Single-component layouts only (the
    multi-component family has its own fused kernel, sampler/fused_multi.py)."""
    return plan_fused_gather(model, spec, dv_max, nwalkers, budget) is not None


def _make_gather_lnprob(lines1, vel1, lines2, vel2, scat, chans, qst, *,
                        ss, dish_size, Tbg, mask_center,
                        q_kind, q_coeffs, q_power, q_scale,
                        bounds_lo, bounds_hi, prior_mean, prior_std,
                        has_overflow, wchunk, out_scratch=None):
    """lnprob from the channel-major tables, (n, D) -> (n, 1), evaluated
    in `wchunk`-sized walker chunks so the dominant (chunk, M, C)
    temporaries stay inside the scoped-VMEM budget.

    In-kernel callers MUST pass `out_scratch` (an (h, 1) VMEM scratch
    ref): Mosaic's scoped-VMEM allocator is a LIFO stack, so when chunk
    results are returned as values for a final concatenate, each chunk's
    surviving output PINS its dead temporaries below it on the stack and
    walker chunking frees nothing — measured on v5e terminal compiles of
    the bench-dense program as a ~16M wchunk-INDEPENDENT watermark
    (19.58M @ wchunk=16, 17.89M @ wchunk=8, both over the 16M limit).
    Storing each chunk's (cn, 1) lnp into pre-allocated scratch lets the
    whole chunk pop, leaving only one chunk's transient on the stack —
    the same scratch-accumulation discipline sampler/fused_multi.py uses
    (and that kernel compiles on-chip). With out_scratch=None (the
    sharded composition's plain-array entry lnprob, outside Pallas) the
    results are concatenated as ordinary XLA values.

    Ref-agnostic on purpose: every table access is basic slicing, so the
    fused step kernel passes Pallas refs while the sharded composition
    (parallel/sharded_fused.py) reuses the SAME code with plain arrays
    for its entry lnprob — one numerics definition for both."""
    M1 = vel1.shape[0]
    M2 = lines2.shape[0] // 5
    gf = chans[0:1, :]
    y = chans[1:2, :]
    isig = chans[2:3, :]
    q_of = _make_q_of(q_kind, q_coeffs, q_power, q_scale, qst)
    vel1_t = vel1[:]
    l1 = tuple(lines1[i * M1:(i + 1) * M1, :] for i in range(5))
    if has_overflow:
        vel2_t = vel2[:]
        l2 = tuple(lines2[i * M2:(i + 1) * M2, :] for i in range(5))
        scat_t = scat[:]

    def opac_part(consts, vel_t, Q, Ncol, Tex, vlsr, dV):
        """Channel-major opacity over one table: (n, M, C*) tau recompute
        + windowed Gaussian, summed over the table rows -> (n, C*)."""
        lf, le, la_, lg, lgl = consts
        taus = tau_sticks(jnp, lf[None], le[None], la_[None], lg[None],
                          lgl[None], Q[:, :, None], Ncol[:, :, None],
                          Tex[:, :, None], dV[:, :, None])   # (n, M, C*)
        sigma = (dV / FWHM_TO_SIGMA_MODEL)[:, :, None]        # (n, 1, 1)
        aa = (-0.5 * np.log2(np.e)) / (sigma * sigma)
        window = (jnp.abs(vel_t[None] - mask_center)
                  < VELOCITY_WINDOW_DV * dV[:, :, None])
        d = vel_t[None] - vlsr[:, :, None]
        gauss = jnp.where(window, jnp.exp2(aa * (d * d)), 0.0)
        return jnp.sum(taus * gauss, axis=1)                  # (n, C*)

    def lnprob(th):  # (n, D) -> (n, 1), in walker chunks to bound VMEM
        n = th.shape[0]
        outs = []
        for w0 in range(0, n, wchunk):
            w1 = min(w0 + wchunk, n)
            t = th[w0:w1, :]
            ss_w, Ncol, Tex, vlsr, dV = _unpack_single(t, ss)
            Q = q_of(Tex)
            opac = opac_part(l1, vel1_t, Q, Ncol, Tex, vlsr, dV)  # (n, C)
            if has_overflow:
                # exact one-hot scatter of the heavy-channel overflow, as
                # models/pallas_kernels.py:opacity_gather_split
                o2 = opac_part(l2, vel2_t, Q, Ncol, Tex, vlsr, dV)  # (n, C2)
                opac = opac + jnp.dot(
                    o2, scat_t, preferred_element_type=opac.dtype,
                    precision=jax.lax.Precision.HIGHEST)
            lnp = _lnprob_tail(
                t, ss_w, Tex, opac, gf, y, isig, ss=ss,
                dish_size=dish_size, Tbg=Tbg, bounds_lo=bounds_lo,
                bounds_hi=bounds_hi, prior_mean=prior_mean,
                prior_std=prior_std)
            if out_scratch is None:
                outs.append(lnp)
            else:  # scratch store pops the chunk's scoped stack (doc above)
                out_scratch[w0:w1, :] = lnp
        if out_scratch is not None:
            return out_scratch[0:n, :]
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    return lnprob


def _step_kernel_gather(coords_ref, lnp_ref, perm_ref, zu_ref, pair_ref,
                        au_ref, lines1_ref, vel1_ref, lines2_ref, vel2_ref,
                        scat_ref, chans_ref, qst_ref,
                        out_chain_ref, out_lnps_ref, out_acc_ref,
                        lnp_scratch_ref, *, a, h, k_steps, **statics):
    lnprob = _make_gather_lnprob(lines1_ref, vel1_ref, lines2_ref, vel2_ref,
                                 scat_ref, chans_ref, qst_ref,
                                 out_scratch=lnp_scratch_ref, **statics)
    _run_step_loop(coords_ref, lnp_ref, perm_ref, zu_ref, pair_ref, au_ref,
                   out_chain_ref, out_lnps_ref, out_acc_ref, lnprob,
                   a=a, h=h, k_steps=k_steps)


def make_fused_ensemble_gather(model, spec, grid_ints, grid_yerrs, bounds,
                               prior_means, prior_stds, *, dv_max: float,
                               a: float = 2.0, nwalkers: int = 128,
                               budget: int = _SCOPED_VMEM_BUDGET,
                               min_saving: float = 1.3,
                               plan=None, interpret: bool = False):
    """Build `run(pos0, lnp0, key, nsteps) -> (chain, lnps, accepted,
    (pos, lnp))` for a dense single-component fit, with run_ensemble's
    exact contract and PRNG stream, each k steps one fused Pallas program.

    bounds / prior_means / prior_stds follow single_component_lnprior's
    vocabulary (sigma_vlsr/sigma_dV overridden to 0.8/0.3 * mean_dV,
    reference inference.py:200-201). dv_max is the prior's dV upper
    bound — the same static-window parameter the batched gather
    likelihood uses. Raises ValueError when the working set cannot fit
    the VMEM budget (callers should check fused_gather_supported first).
    """
    if spec.ncomp != 1:
        raise ValueError("fused gather path supports single-component "
                         "layouts only (use sampler.fused_multi for "
                         "ncomp > 1)")
    if plan is None:
        plan = plan_fused_gather(model, spec, dv_max, nwalkers, budget,
                                 min_saving=min_saving)
    if plan is None:
        raise ValueError(
            f"fused gather tables exceed the {budget >> 20} MiB VMEM "
            f"budget at nwalkers={nwalkers}")
    statics, dev = gather_statics_tables(model, spec, grid_ints, grid_yerrs,
                                         bounds, prior_means, prior_stds,
                                         plan)
    from jax.experimental.pallas import tpu as pltpu

    kernel = functools.partial(_step_kernel_gather, a=a, **statics)
    return _make_fused_run(
        kernel, dev, interpret=interpret, max_walkers=nwalkers,
        scratch_shapes=lambda h, dt: [pltpu.VMEM((h, 1), dt)])


def gather_statics_tables(model, spec, grid_ints, grid_yerrs, bounds,
                          prior_means, prior_stds, plan):
    """Static kwargs + device tables for the channel-major in-kernel
    lnprob (_make_gather_lnprob) — shared by the whole-step kernel above
    and the sharded half-step composition (parallel/sharded_fused.py).
    The counterpart of sampler/fused.py:single_statics_tables for the
    dense table layout."""
    tables, wchunk = plan
    qm = model.q_model
    free_ss = spec.fixed_source_size is None
    means = np.asarray(prior_means, dtype=np.float64)
    stds = np.asarray(prior_stds, dtype=np.float64).copy()
    dv_mean = means[4] if free_ss else means[3]
    stds[-2] = dv_mean * 0.8   # sigma_vlsr override
    stds[-1] = dv_mean * 0.3   # sigma_dV override
    names = (["source_size"] if free_ss else []) + ["Ncol", "Tex", "vlsr",
                                                    "dV"]
    lo = tuple(float(bounds[k][0]) for k in names)
    hi = tuple(float(bounds[k][1]) for k in names)

    chans = jnp.stack([model.grid_freq,
                       jnp.asarray(grid_ints, model.dtype),
                       1.0 / jnp.asarray(grid_yerrs, model.dtype) ** 2])
    if qm.kind == "states":
        qst = jnp.asarray(np.stack([np.asarray(qm.g), np.asarray(qm.E)]),
                          model.dtype)                         # (2, S)
        q_static = dict(q_kind="states", q_coeffs=(), q_power=None,
                        q_scale=1.0)
    else:
        qst = jnp.zeros((2, 8), model.dtype)
        q_static = dict(q_kind="analytic", q_coeffs=qm.coeffs,
                        q_power=qm.power, q_scale=qm.scale)
    dev = (jnp.asarray(tables["lines1"]), jnp.asarray(tables["vel1"]),
           jnp.asarray(tables["lines2"]), jnp.asarray(tables["vel2"]),
           jnp.asarray(tables["scat"]), chans, qst)
    statics = dict(
        ss=None if free_ss else float(spec.fixed_source_size),
        dish_size=float(model.dish_size), Tbg=float(model.Tbg),
        mask_center=float(model.mask_center), **q_static,
        bounds_lo=lo, bounds_hi=hi,
        prior_mean=tuple(means), prior_std=tuple(stds),
        has_overflow=tables["has_overflow"], wchunk=wchunk)
    return statics, dev


def replan_wchunk(tables, model, nwalkers: int,
                  budget: int = _SCOPED_VMEM_BUDGET) -> int | None:
    """Re-pick the walker chunk for a different ensemble size from
    already-built tables (table construction costs seconds on a 35k-line
    catalog; the sharded composition plans per-DEVICE walker counts from
    the single plan the pipeline already made)."""
    qm = model.q_model
    n_states = 0 if qm.kind == "analytic" else int(np.size(qm.g))
    return _pick_wchunk(tables, int(model.n_channels), n_states, nwalkers,
                        budget)
