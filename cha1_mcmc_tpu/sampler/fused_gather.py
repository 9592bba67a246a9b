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
  * the channel axis is PERMUTED heavy-first: the C2 channels that carry
    overflow rows move to the front, so the overflow partial is a
    same-position slice ADD onto the leading channel blocks instead of a
    (C2, C) one-hot MXU contraction (models/pallas_kernels.py's
    opacity_gather_split scatter) — no scatter matmul, no (C2, C) static
    in VMEM. lnprob is a channel sum, so the permutation only
    reassociates the chi^2 reduction (lnp to f32 ulps vs the natural
    order — within the kernel's documented contract);
  * the lnprob is evaluated in (wchunk walkers) x (channel block) tiles:
    the dominant temporaries are (wchunk, M, cblock) — bounded for ANY
    catalog/grid size, which is what lets grids far too wide for a
    whole-(n, M, C) formulation (the 10,850-channel dense_full_fit
    datagrid) keep the fused step. Channel blocks run as a
    lax.fori_loop with pl.ds table slices when there are many (program
    size stays flat), unrolled with static slices when few;
  * a state-sum partition function (the aromatics' 16k-state fallback Q)
    is likewise chunked over states, so the (wchunk, S) Boltzmann block
    no longer caps the walker chunk;
  * the stretch-move machinery (one-hot walker gathers/scatters, the two
    sequential half-updates, bulk pre-generated randomness) is shared
    verbatim with sampler/fused.py (_run_step_loop / _make_fused_run),
    so the PRNG stream and chain contract are identical to run_ensemble.

Semantics: emcee-v3 stretch move, same stream as run_ensemble — walker
trajectories match the general sampler bitwise on the tested streams;
lnp agrees to f32 ulps (the in-kernel Gaussian uses the exp2
reformulation and the chi^2 reduction order follows the permuted/blocked
channel walk, exactly as sampler/fused.py documents).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from cha1_mcmc_tpu.constants import (FWHM_TO_SIGMA_MODEL, KCM,
                                     VELOCITY_WINDOW_DV)
from cha1_mcmc_tpu.ops.lte import tau_sticks
from cha1_mcmc_tpu.sampler.fused import (_make_q_of, _make_fused_run,
                                         _prior_box, _rt_chi2_block,
                                         _run_step_loop, _unpack_single)

__all__ = ["build_dense_tables", "fused_gather_supported",
           "gather_statics_tables", "make_fused_ensemble_gather",
           "plan_fused_gather", "replan_chunks"]

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
      lines1 (5*M1, C), vel1 (M1, C)          — main table (channel axis
                                                 heavy-first permuted when
                                                 the split is worthwhile)
      lines2 (5*M2, cb0), vel2 (M2, cb0)       — heavy-channel overflow at
                                                 permuted positions
                                                 [0, C2), lane-padded to
                                                 cb0 (M2 == 1 row of
                                                 padding and cb0 == 0
                                                 when the split isn't
                                                 worthwhile)
      perm ((C,) int or None)                  — the channel permutation
                                                 (apply to the obs rows)
      has_overflow (bool), cb0 (int),
      n_elems (int), active ((La,) int)
    """
    from cha1_mcmc_tpu.models.pallas_kernels import (
        build_opacity_gather, build_opacity_gather_split)

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
        # Heavy-first channel permutation (module docstring): overflow
        # becomes a same-position ADD on the leading channel blocks.
        perm = np.concatenate([heavy,
                               np.setdiff1d(np.arange(C), heavy)])
        t1, v1 = t1[:, perm], v1[:, perm]
        # Overflow columns are already in heavy-channel order == permuted
        # positions [0, C2). Pad to the lane-tile boundary cb0 so every
        # downstream block width can stay 128-aligned.
        C2 = t2.shape[1]
        cb0 = min(-(-C2 // 128) * 128, C)
        if cb0 > C2:
            t2 = np.pad(t2, ((0, 0), (0, cb0 - C2)))
            v2 = np.pad(v2, ((0, 0), (0, cb0 - C2)),
                        constant_values=_PAD_VEL)
        has_overflow = True
    else:
        t1, v1, active = build_opacity_gather(vg, model.mask_center, dv_max)
        t2 = np.zeros((1, 1), np.int32)
        v2 = np.full((1, 1), _PAD_VEL, vg.dtype)
        perm = None
        cb0 = 0
        has_overflow = False
    sub = consts[:, active]                                  # (5, La)
    lines1 = sub[:, t1].reshape(5 * t1.shape[0], C)
    lines2 = sub[:, t2].reshape(5 * t2.shape[0], t2.shape[1])
    n_elems = t1.size + (t2.size if has_overflow else 0)
    return dict(lines1=lines1, vel1=v1.astype(dtype),
                lines2=lines2, vel2=v2.astype(dtype),
                has_overflow=has_overflow, n_elems=int(n_elems),
                active=active, perm=perm, cb0=int(cb0))


def _pad_tile(m: int, c: int) -> int:
    """Element count of an (m, c) block after Mosaic's (8, 128) tiling."""
    return -(-m // 8) * 8 * (-(-c // 128) * 128)


def _lane(c: int) -> int:
    return -(-c // 128) * 128


#: Unroll channel-block loops up to this many blocks per region (static
#: slices, no loop machinery); longer walks become lax.fori_loop with
#: pl.ds slices so the unrolled program size stays flat with grid width.
#: Unrolled blocks accumulate by value, which PINS each block's dead
#: temporaries below the surviving partial on the Mosaic scoped stack
#: (see _make_gather_lnprob) — the estimator charges unrolled regions for
#: every block, fori regions for one iteration.
_UNROLL_BLOCKS = 1

#: State-sum chunk width: Q(T)'s (wchunk, S) Boltzmann block is walked in
#: (wchunk, _STATE_CHUNK) tiles when S exceeds it (the aromatics carry
#: ~16k states; at wchunk=64 the unchunked block alone is ~13 MiB).
_STATE_CHUNK = 2048


def _vmem_estimate(tables, C, n_states, wchunk, nwalkers,
                   cbo: int, cbr: int) -> int:
    """Scoped-VMEM working-set model (bytes) for candidate block widths
    (cbo = overflow-region block, cbr = rest-region block), calibrated
    against the measured on-chip data point (v5e terminal compile of the
    pre-blocking bench-dense program, wchunk=16, whole-width blocks:
    "Scoped allocation with size 19.58M"): ~8 live padded (wchunk, M, c*)
    layers through tau_sticks' elementwise chain and the windowed
    Gaussian per channel block, ~3 live (wchunk, schunk) layers in the
    state-sum Q, 4 (wchunk, c*) channel rows in the RT/chi^2 tail, plus
    the static tables and the step loop's selectors. Unrolled regions
    (block count <= _UNROLL_BLOCKS) pin every block's layers; fori
    regions cost one iteration."""
    M1 = tables["vel1"].shape[0]
    M2, cb0_t = tables["vel2"].shape
    cb0 = tables.get("cb0", cb0_t if tables["has_overflow"] else 0)
    s_pad = _lane(n_states)
    schunk = min(s_pad, _STATE_CHUNK) if n_states else 0
    n_bo = -(-cb0 // cbo) if (tables["has_overflow"] and cbo) else 0
    cb0p = n_bo * cbo
    rest = max(C - cb0p, 0)
    n_br = -(-rest // cbr) if (rest and cbr) else 0
    Cp = cb0p + n_br * cbr

    static = 4 * (6 * (M1 * Cp + M2 * cb0p) + 3 * Cp + 2 * s_pad)
    layers_o = _pad_tile(M1, cbo) + _pad_tile(M2, cbo) if n_bo else 0
    layers_r = _pad_tile(M1, cbr) if n_br else 0
    blk = ((n_bo if n_bo <= _UNROLL_BLOCKS else 1) * layers_o
           + (n_br if n_br <= _UNROLL_BLOCKS else 1) * layers_r)
    cmax = max(cbo if n_bo else 0, cbr if n_br else 0)
    chunk = 4 * wchunk * (8 * blk + 3 * schunk + 4 * cmax)
    h = nwalkers // 2
    loop = 4 * (3 * h * nwalkers + 2 * nwalkers * 8)
    return static + chunk + loop


def _width_cands(width: int):
    """Descending lane-aligned halvings of a region width (block-size
    candidates): full width first, 128 last."""
    if width <= 0:
        return [0]
    cands = []
    cb = _lane(width)
    while cb > 128:
        cands.append(cb)
        cb = max(128, _lane(cb // 2))
    cands.append(128)
    return cands


def _pick_chunks(tables, C: int, n_states: int, nwalkers: int,
                 budget: int):
    """Pick (wchunk, cbo, cbr): the largest walker chunk (fewest table
    re-reads — each channel block's table slice is re-read once per
    walker chunk), then the widest channel blocks, that fit the scoped
    budget. Returns None when nothing fits."""
    h = max(nwalkers // 2, 1)
    cb0 = tables.get("cb0", 0) if tables["has_overflow"] else 0
    for wchunk in (h, 64, 32, 16, 8):
        if wchunk > h:
            continue
        for cbr in _width_cands(C - cb0):
            for cbo in _width_cands(cb0):
                if _vmem_estimate(tables, C, n_states, wchunk, nwalkers,
                                  cbo or 128, cbr or 128) <= budget:
                    return wchunk, (cbo or 128), (cbr or 128)
    return None


#: Default planning budget. The kernel's temporaries live in the Mosaic
#: scoped-VMEM stack, whose compiler limit on the v5e is 16 MiB — NOT the
#: 128 MiB VMEM total that sampler/fused.py's whole-grid gate budgets
#: against. Two terminal compiles of the pre-blocking bench-dense program
#: measured the ceiling: wchunk=64 (planned under the original 48 MiB
#: budget) failed at "Scoped allocation with size 25.50M and limit
#: 16.00M", and wchunk=16 (planned under 12 MiB with the pre-padding
#: estimator, which said 9.2 MiB) still failed at 19.58M — Mosaic pads
#: the (wchunk, M, c) temporaries to (8, 128) tiles and keeps more of
#: them live than the old model counted. _vmem_estimate is calibrated to
#: the 19.58M point; 12 MiB of modeled budget leaves ~4 MiB of real
#: headroom below the compiler limit.
_SCOPED_VMEM_BUDGET = 12 << 20


def plan_fused_gather(model, spec, dv_max: float, nwalkers: int = 128,
                      budget: int = _SCOPED_VMEM_BUDGET,
                      min_saving: float = 1.3):
    """Build the channel-major tables and pick the (walker, channel,
    state) chunking, or return None when (model, spec) cannot take the
    fused kernel (multi-component layout, or a working set over the VMEM
    budget). Returns a plan dict: {tables, wchunk, cbo, cbr, n_bo, n_br,
    cb0p, Cp, schunk, n_sb}.

    Table construction on a 35k-line catalog costs seconds of host time
    (the (L, C) window scan), so callers that first check support and then
    build the kernel should do both through this one plan (pipeline/fit.py
    passes the plan into make_fused_ensemble_gather via `plan=`)."""
    if spec.ncomp != 1:
        return None
    tables = build_dense_tables(model, dv_max, min_saving=min_saving)
    qm = model.q_model
    n_states = 0 if qm.kind == "analytic" else int(np.size(qm.g))
    C = int(model.n_channels)
    picked = _pick_chunks(tables, C, n_states, nwalkers, budget)
    if picked is None:
        return None
    wchunk, cbo, cbr = picked
    return _finish_plan(tables, C, n_states, wchunk, cbo, cbr)


def _finish_plan(tables, C, n_states, wchunk, cbo, cbr):
    """Derive the block walk geometry from picked widths."""
    cb0 = tables.get("cb0", 0) if tables["has_overflow"] else 0
    n_bo = -(-cb0 // cbo) if cb0 else 0
    cb0p = n_bo * cbo
    rest = max(C - cb0p, 0)
    n_br = -(-rest // cbr) if rest else 0
    Cp = cb0p + n_br * cbr
    if n_states:
        s_pad = _lane(n_states)
        schunk = min(s_pad, _STATE_CHUNK)
        n_sb = -(-s_pad // schunk)
    else:
        schunk, n_sb = 0, 0
    return dict(tables=tables, wchunk=wchunk, cbo=cbo, cbr=cbr,
                n_bo=n_bo, n_br=n_br, cb0p=cb0p, Cp=Cp,
                schunk=schunk, n_sb=n_sb)


def fused_gather_supported(model, spec, dv_max: float, nwalkers: int = 128,
                           budget: int = _SCOPED_VMEM_BUDGET) -> bool:
    """Can (model, spec) run through the fused channel-major kernel within
    the scoped-VMEM budget? Single-component layouts only (the
    multi-component family has its own fused kernel, sampler/fused_multi.py)."""
    return plan_fused_gather(model, spec, dv_max, nwalkers, budget) is not None


def _make_gather_lnprob(lines1, vel1, lines2, vel2, chans, qst, *,
                        ss, dish_size, Tbg, mask_center,
                        q_kind, q_coeffs, q_power, q_scale,
                        bounds_lo, bounds_hi, prior_mean, prior_std,
                        has_overflow, wchunk, cbo, cbr, n_bo, n_br,
                        cb0p, schunk, n_sb, out_scratch=None):
    """lnprob from the channel-major tables, (n, D) -> (n, 1), evaluated
    in (wchunk walkers) x (channel block) tiles so the dominant
    (chunk, M, cblock) temporaries stay inside the scoped-VMEM budget.

    In-kernel callers MUST pass `out_scratch` (an (h, 1) VMEM scratch
    ref): Mosaic's scoped-VMEM allocator is a LIFO stack, so when chunk
    results are returned as values for a final concatenate, each chunk's
    surviving output PINS its dead temporaries below it on the stack and
    walker chunking frees nothing — measured on v5e terminal compiles of
    the pre-blocking bench-dense program as a ~16M wchunk-INDEPENDENT
    watermark (19.58M @ wchunk=16, 17.89M @ wchunk=8, both over the 16M
    limit). Storing each chunk's (cn, 1) lnp into pre-allocated scratch
    lets the whole chunk pop, leaving only one chunk's transient on the
    stack — the same scratch-accumulation discipline
    sampler/fused_multi.py uses. The channel walk inside a chunk is a
    lax.fori_loop (block counts over _UNROLL_BLOCKS) whose carried
    (cn, 1) partial lets every iteration's temporaries pop, or a short
    static unroll. With out_scratch=None (the sharded composition's
    plain-array entry lnprob, outside Pallas) each region is evaluated
    at full width and results are concatenated as ordinary XLA values —
    the same formulas, chi^2 reassociated (ulp-level, documented).

    Ref-agnostic on purpose: the in-kernel path slices table refs with
    pl.ds; the plain-array path (parallel/sharded_fused.py's entry
    lnprob) reuses the SAME numerics with jnp slicing — one definition
    for both."""
    M1 = vel1.shape[0]
    M2 = lines2.shape[0] // 5
    in_kernel = out_scratch is not None

    def slc(x, r0, r1, c0, w):
        """(r0:r1, c0:c0+w) block of a table; rows/width static, start
        static under unroll and traced (128-aligned) under fori."""
        if in_kernel:
            if not isinstance(c0, int):
                c0 = pl.multiple_of(c0, 128)
            return x[r0:r1, pl.ds(c0, w)]
        return jax.lax.dynamic_slice_in_dim(x[r0:r1, :], c0, w, axis=1)

    def q_of(Tex):  # (n, 1) -> (n, 1)
        if q_kind != "states" or not in_kernel or n_sb <= 1:
            return _make_q_of(q_kind, q_coeffs, q_power, q_scale, qst)(Tex)
        # State-sum fallback Q chunked over states (module docstring):
        # qst is zero-padded to n_sb * schunk columns (g=0 rows add
        # exactly 0), the fori carry is the (n, 1) partial sum.
        inv = -1.0 / (KCM * Tex)                             # (n, 1)

        def body(j, acc):
            g = slc(qst, 0, 1, j * schunk, schunk)           # (1, sc)
            E = slc(qst, 1, 2, j * schunk, schunk)
            return acc + jnp.sum(g * jnp.exp(E * inv), axis=1,
                                 keepdims=True)

        return jax.lax.fori_loop(0, n_sb, body, jnp.zeros_like(Tex))

    def opac_block(lines, vel, M, c0, w, Q, Ncol, Tex, vlsr, dV):
        """Channel-major opacity over one (M, w) table block: tau
        recompute + windowed Gaussian, summed over table rows -> (n, w)."""
        lf, le, la_, lg, lgl = (slc(lines, i * M, (i + 1) * M, c0, w)
                                for i in range(5))
        vel_b = slc(vel, 0, M, c0, w)
        taus = tau_sticks(jnp, lf[None], le[None], la_[None], lg[None],
                          lgl[None], Q[:, :, None], Ncol[:, :, None],
                          Tex[:, :, None], dV[:, :, None])    # (n, M, w)
        sigma = (dV / FWHM_TO_SIGMA_MODEL)[:, :, None]        # (n, 1, 1)
        aa = (-0.5 * np.log2(np.e)) / (sigma * sigma)
        window = (jnp.abs(vel_b[None] - mask_center)
                  < VELOCITY_WINDOW_DV * dV[:, :, None])
        d = vel_b[None] - vlsr[:, :, None]
        gauss = jnp.where(window, jnp.exp2(aa * (d * d)), 0.0)
        return jnp.sum(taus * gauss, axis=1)                  # (n, w)

    def chunk_ll(dt, ss_w, Q, Ncol, Tex, vlsr, dV):
        """Blocked chi^2 over the permuted channel axis, (n, 1)."""
        def part(c0, w, with_over):
            opac = opac_block(lines1, vel1, M1, c0, w,
                              Q, Ncol, Tex, vlsr, dV)
            if with_over:
                # heavy-first permutation: overflow adds in place
                opac = opac + opac_block(lines2, vel2, M2, c0, w,
                                         Q, Ncol, Tex, vlsr, dV)
            gf = slc(chans, 0, 1, c0, w)
            y = slc(chans, 1, 2, c0, w)
            isig = slc(chans, 2, 3, c0, w)
            return _rt_chi2_block(dt, ss_w, Tex, opac, gf, y, isig,
                                  dish_size=dish_size, Tbg=Tbg)

        ll = jnp.zeros_like(Tex)
        if not in_kernel:
            # plain-array path: one full-width partial per region
            if n_bo:
                ll = ll + part(0, cb0p, has_overflow)
            if n_br:
                ll = ll + part(cb0p, n_br * cbr, False)
            return ll
        for n_b, width, base, w_over in ((n_bo, cbo, 0, has_overflow),
                                         (n_br, cbr, cb0p, False)):
            if not n_b:
                continue
            if n_b <= _UNROLL_BLOCKS:
                for i in range(n_b):
                    ll = ll + part(base + i * width, width, w_over)
            else:
                ll = jax.lax.fori_loop(
                    0, n_b,
                    functools.partial(
                        lambda i, acc, wd, bs, ov:
                            acc + part(bs + i * wd, wd, ov),
                        wd=width, bs=base, ov=w_over),
                    ll)
        return ll

    def lnprob(th):  # (n, D) -> (n, 1), in walker chunks to bound VMEM
        n = th.shape[0]
        outs = []
        for w0 in range(0, n, wchunk):
            w1 = min(w0 + wchunk, n)
            t = th[w0:w1, :]
            ss_w, Ncol, Tex, vlsr, dV = _unpack_single(t, ss)
            Q = q_of(Tex)
            ll = chunk_ll(t.dtype, ss_w, Q, Ncol, Tex, vlsr, dV)
            ok, lp = _prior_box(t, Tex, ss=ss, bounds_lo=bounds_lo,
                                bounds_hi=bounds_hi, prior_mean=prior_mean,
                                prior_std=prior_std)
            val = lp + ll
            lnp = jnp.where(ok & jnp.isfinite(val), val, -jnp.inf)
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
                        chans_ref, qst_ref,
                        out_chain_ref, out_lnps_ref, out_acc_ref,
                        lnp_scratch_ref, *, a, h, k_steps, **statics):
    lnprob = _make_gather_lnprob(lines1_ref, vel1_ref, lines2_ref, vel2_ref,
                                 chans_ref, qst_ref,
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


def _pad_cols(arr, width, value=None):
    """Pad a host (r, c) table's channel axis to `width` columns — edge
    replication for line constants (tau stays finite), a constant for
    velocity/obs rows."""
    c = arr.shape[1]
    if width <= c:
        return arr
    if value is None:
        return np.pad(arr, ((0, 0), (0, width - c)), mode="edge")
    return np.pad(arr, ((0, 0), (0, width - c)), constant_values=value)


def gather_statics_tables(model, spec, grid_ints, grid_yerrs, bounds,
                          prior_means, prior_stds, plan):
    """Static kwargs + device tables for the channel-major in-kernel
    lnprob (_make_gather_lnprob) — shared by the whole-step kernel above
    and the sharded half-step composition (parallel/sharded_fused.py).
    The counterpart of sampler/fused.py:single_statics_tables for the
    dense table layout.

    Finalizes the plan's padding here (host numpy, cheap): the main table
    and the obs rows extend to Cp columns (exact zero contribution:
    vel=_PAD_VEL so opac=0, y=0/isig=1 so the chi^2 term is exactly 0 and
    log isig = 0), the overflow table to cb0p, the state-sum (g, E) to
    n_sb * schunk (g=0 adds exactly 0) — so every fori block is full
    width."""
    tables, wchunk = plan["tables"], plan["wchunk"]
    cb0p, Cp, schunk, n_sb = (plan["cb0p"], plan["Cp"], plan["schunk"],
                              plan["n_sb"])
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

    np_dt = np.float64 if model.dtype == jnp.float64 else np.float32
    chans = np.stack([np.asarray(model.grid_freq, np_dt),
                      np.asarray(grid_ints, np_dt),
                      1.0 / np.asarray(grid_yerrs, np_dt) ** 2])
    if tables["perm"] is not None:
        chans = chans[:, tables["perm"]]   # heavy-first channel order
    C = chans.shape[1]
    if Cp > C:
        pad = np.tile(np.array([[1.0], [0.0], [1.0]], np_dt), (1, Cp - C))
        chans = np.concatenate([chans, pad], axis=1)
    lines1 = _pad_cols(tables["lines1"], Cp)
    vel1 = _pad_cols(tables["vel1"], Cp, value=_PAD_VEL)
    lines2 = _pad_cols(tables["lines2"], cb0p)
    vel2 = _pad_cols(tables["vel2"], cb0p, value=_PAD_VEL)

    if qm.kind == "states":
        qst_h = np.stack([np.asarray(qm.g), np.asarray(qm.E)]).astype(np_dt)
        if n_sb > 1:
            qst_h = np.pad(qst_h,
                           ((0, 0), (0, n_sb * schunk - qst_h.shape[1])))
        qst = jnp.asarray(qst_h, model.dtype)                 # (2, S)
        q_static = dict(q_kind="states", q_coeffs=(), q_power=None,
                        q_scale=1.0)
    else:
        qst = jnp.zeros((2, 8), model.dtype)
        q_static = dict(q_kind="analytic", q_coeffs=qm.coeffs,
                        q_power=qm.power, q_scale=qm.scale)
    dev = (jnp.asarray(lines1), jnp.asarray(vel1),
           jnp.asarray(lines2), jnp.asarray(vel2),
           jnp.asarray(chans, model.dtype), qst)
    statics = dict(
        ss=None if free_ss else float(spec.fixed_source_size),
        dish_size=float(model.dish_size), Tbg=float(model.Tbg),
        mask_center=float(model.mask_center), **q_static,
        bounds_lo=lo, bounds_hi=hi,
        prior_mean=tuple(means), prior_std=tuple(stds),
        has_overflow=tables["has_overflow"], wchunk=wchunk,
        cbo=plan["cbo"], cbr=plan["cbr"], n_bo=plan["n_bo"],
        n_br=plan["n_br"], cb0p=cb0p, schunk=schunk, n_sb=n_sb)
    return statics, dev


def replan_chunks(tables, model, nwalkers: int,
                  budget: int = _SCOPED_VMEM_BUDGET):
    """Re-plan the chunking for a different ensemble size from
    already-built tables (table construction costs seconds on a 35k-line
    catalog; the sharded composition plans per-DEVICE walker counts from
    the single table build the pipeline already made). Returns a plan
    dict or None."""
    qm = model.q_model
    n_states = 0 if qm.kind == "analytic" else int(np.size(qm.g))
    C = int(model.n_channels)
    picked = _pick_chunks(tables, C, n_states, nwalkers, budget)
    if picked is None:
        return None
    wchunk, cbo, cbr = picked
    return _finish_plan(tables, C, n_states, wchunk, cbo, cbr)
