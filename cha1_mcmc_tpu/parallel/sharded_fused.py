"""Fused whole-step kernels composed with the walker-sharded mesh.

Single-device sampling runs the entire ensemble step as one Pallas
program (sampler/fused.py) — but that kernel pairs walkers within its
own resident ensemble, so on a multi-chip mesh the us-regime step used
to fall back to the general per-op scan (VERDICT r3 weak #5). This
module keeps the fused step on every device of a
('chains', 'walkers', 'lines'=1) mesh by splitting the program at the
only point that needs communication:

  per ensemble step, per half:
    all_gather(complement coords)        -- ICI collective (h*, D) tiny
    one fused HALF-step Pallas program   -- active-half gathers, the full
                                            LTE lnprob, acceptance, and
                                            the scatter back, all in VMEM

Two Pallas launches + two all_gathers per step replace the general
sharded path's ~50 per-step XLA ops; the expensive (h_local, L, C)
model block shrinks with the walker shard count, so the composition
also RAISES the model size the fused path can hold in VMEM.

Semantics are exactly the sharded general path's (parallel/sharded.py):
the same balanced per-device random split, the same globally gathered
complement pairing, the same per-device PRNG stream — walker
trajectories come out bitwise-identical to make_sharded_runner's on the
tested streams (lnp to an f32 ulp; see sampler/fused.py's discussion),
gated by tests/test_parallel.py. The reference's only parallelism is a
multiprocessing pool over walker lnprobs (reference inference.py:456-463);
this is its ICI-native replacement with the fused step preserved.

Line sharding (n_line_shards > 1) stays on the general path: the fused
kernel evaluates the full lnprob locally, which is the wrong tradeoff
once the line axis itself must be distributed.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.4.35 exposes shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from cha1_mcmc_tpu.catalogs.partition import device_n_states
from cha1_mcmc_tpu.models.forward import forward_from_lines
from cha1_mcmc_tpu.sampler.fused import (_make_dense_lnprob,
                                         single_statics_tables)

__all__ = ["make_fused_sharded_runner", "fused_sharded_supported",
           "make_fused_gather_sharded_runner", "plan_fused_gather_sharded",
           "make_fused_multi_sharded_runner",
           "fused_multi_sharded_supported"]

CHAIN_AXIS = "chains"
WALKER_AXIS = "walkers"
LINE_AXIS = "lines"


def fused_sharded_supported(model, mesh: Mesh, nwalkers: int,
                            budget_bytes: int = 48 << 20) -> bool:
    """Mesh + VMEM eligibility for the fused sharded step.

    Mirrors SpectralFit._fused_fits_vmem but at the per-device half size:
    the kernel's dominant temporaries are a few (h_local, L, C) model
    intermediates plus the (h_local, W_local) selectors and the
    (h_local, n_comp) pair selector.
    """
    if LINE_AXIS in mesh.shape and mesh.shape[LINE_AXIS] != 1:
        return False
    n_c = mesh.shape.get(CHAIN_AXIS, 1)
    n_w = mesh.shape[WALKER_AXIS]
    if nwalkers % (2 * n_c * n_w):
        return False
    w_local = nwalkers // (n_c * n_w)
    h = w_local // 2
    n_comp = h * n_w
    model_bytes = 4 * h * model.n_lines * model.n_channels * 4
    selector_bytes = (3 * h * w_local + h * n_comp) * 4
    n_states = device_n_states(model.q_model)
    q_bytes = 2 * h * n_states * 4
    return model_bytes + selector_bytes + q_bytes <= budget_bytes


def _half_update(state_ref, active_ref, comp_ref, zu_ref, pair_ref,
                 au_ref, out_state_ref, out_acc_ref, lnprob, *, a, h, D):
    """One fused half-update of the local ensemble against the gathered
    global complement — the in-kernel analogue of
    parallel/sharded.py:_half_step_sharded with sampler/fused.py's exact
    one-hot gather/scatter discipline (HIGHEST-precision matmuls keep
    coordinates bitwise-equal to the general path's .at[].set). The
    in-kernel `lnprob((h, D)) -> (h, 1)` is supplied by the caller: the
    dense-grid formulation (_make_dense_lnprob) or the channel-major
    gather tables (_make_gather_lnprob)."""
    state = state_ref[:]                                      # (Wl, D+1)
    Wl = state.shape[0]
    wdt = state.dtype

    sel_a = (jax.lax.broadcasted_iota(jnp.int32, (h, Wl), 1)
             == active_ref[:]).astype(wdt)                    # (h, Wl)
    sa = jnp.dot(sel_a, state, preferred_element_type=wdt,
                 precision=jax.lax.Precision.HIGHEST)         # (h, D+1)
    s, lnp_s = sa[:, :D], sa[:, D:]

    comp = comp_ref[:]                                        # (n_comp, D)
    n_comp = comp.shape[0]
    sel_p = (jax.lax.broadcasted_iota(jnp.int32, (h, n_comp), 1)
             == pair_ref[0:1, :].T).astype(wdt)
    c = jnp.dot(sel_p, comp, preferred_element_type=wdt,
                precision=jax.lax.Precision.HIGHEST)          # (h, D)

    zz = (((a - 1.0) * zu_ref[0:1, :] + 1.0) ** 2 / a).T      # (h, 1)
    proposal = c + zz * (s - c)
    lnp_new = lnprob(proposal)                                # (h, 1)
    lnpdiff = (D - 1.0) * jnp.log(zz) + lnp_new - lnp_s
    accept = jnp.log(au_ref[0:1, :]).T < lnpdiff              # (h, 1)

    # Mask values BEFORE the scatter matmul (0 * -inf would NaN-poison
    # the contracted column; accepted rows are always finite).
    vals = jnp.where(accept, jnp.concatenate([proposal, lnp_new], axis=1),
                     0.0)
    newvals = jnp.dot(sel_a.T, vals, preferred_element_type=wdt,
                      precision=jax.lax.Precision.HIGHEST)    # (Wl, D+1)
    acc_w = jnp.dot(sel_a.T, accept.astype(wdt),
                    preferred_element_type=wdt,
                    precision=jax.lax.Precision.HIGHEST)
    out_state_ref[:] = jnp.where(acc_w > 0.5, newvals, state)
    out_acc_ref[0, 0] = jnp.sum(accept.astype(jnp.float32))


def _half_step_kernel(state_ref, active_ref, comp_ref, zu_ref, pair_ref,
                      au_ref, lines_ref, vel_ref, chans_ref, qst_ref,
                      out_state_ref, out_acc_ref, *, a, h, D, **statics):
    """Dense-grid half-step: in-VMEM (h, L, C) forward model."""
    lnprob = _make_dense_lnprob(lines_ref, vel_ref, chans_ref, qst_ref,
                                **statics)
    _half_update(state_ref, active_ref, comp_ref, zu_ref, pair_ref, au_ref,
                 out_state_ref, out_acc_ref, lnprob, a=a, h=h, D=D)


def _half_step_kernel_gather(state_ref, active_ref, comp_ref, zu_ref,
                             pair_ref, au_ref, lines1_ref, vel1_ref,
                             lines2_ref, vel2_ref, chans_ref,
                             qst_ref, out_state_ref, out_acc_ref,
                             lnp_scratch_ref, *, a, h, D, **statics):
    """Dense-catalog half-step: channel-major gather tables with tau
    recomputed per table entry (sampler/fused_gather.py), in VMEM-sized
    (walker chunk) x (channel block) tiles whose results store into
    scratch (the LIFO scoped-stack discipline _make_gather_lnprob
    documents)."""
    from cha1_mcmc_tpu.sampler.fused_gather import _make_gather_lnprob

    lnprob = _make_gather_lnprob(lines1_ref, vel1_ref, lines2_ref, vel2_ref,
                                 chans_ref, qst_ref,
                                 out_scratch=lnp_scratch_ref, **statics)
    _half_update(state_ref, active_ref, comp_ref, zu_ref, pair_ref, au_ref,
                 out_state_ref, out_acc_ref, lnprob, a=a, h=h, D=D)


def plan_fused_gather_sharded(model, spec, mesh: Mesh, nwalkers: int,
                              dv_max: float, tables=None,
                              min_saving: float = 1.3):
    """Per-device plan for the DENSE fused-sharded composition (the
    channel-major gather kernel on a walker-sharded mesh), or None when
    ineligible. The chunking is re-picked for the per-device ensemble
    size — walker sharding SHRINKS the kernel's scoped-VMEM working set,
    so catalogs too big for the single-device fused path can regain it on
    a mesh. Pass prebuilt `tables` (from build_dense_tables or an existing
    plan's "tables") to skip the seconds-scale host table construction."""
    from cha1_mcmc_tpu.sampler.fused_gather import (build_dense_tables,
                                                    replan_chunks)

    if spec.ncomp != 1:
        return None
    if LINE_AXIS in mesh.shape and mesh.shape[LINE_AXIS] != 1:
        return None
    n_c = mesh.shape.get(CHAIN_AXIS, 1)
    n_w = mesh.shape[WALKER_AXIS]
    if nwalkers % (2 * n_c * n_w):
        return None
    w_local = nwalkers // (n_c * n_w)
    if tables is None:
        tables = build_dense_tables(model, dv_max, min_saving=min_saving)
    return replan_chunks(tables, model, w_local, spec=spec)


def make_fused_gather_sharded_runner(
    model,
    spec,
    grid_ints,
    grid_yerrs,
    bounds,
    prior_means,
    prior_stds,
    mesh: Mesh,
    nsteps: int,
    nwalkers: int,
    dv_max: float,
    a: float = 2.0,
    plan=None,
    interpret: bool = False,
):
    """The dense-catalog analogue of make_fused_sharded_runner: each
    half-update is one channel-major gather Pallas program per device
    (sampler/fused_gather.py's table layout and VMEM-chunked lnprob)
    between the two per-step all_gathers. Same mesh contract, PRNG
    stream, and split semantics as make_sharded_runner.

    Entry lnp reuses _make_gather_lnprob with plain arrays — the exact
    numerics definition the kernel compiles — so entry and in-chain lnp
    share one formulation (the general sharded dense path instead uses
    the block-sparse Pallas kernel: trajectories agree on tested streams,
    lnp to f32 ulps; see sampler/fused.py's discussion)."""
    from cha1_mcmc_tpu.sampler.fused_gather import (_make_gather_lnprob,
                                                    gather_statics_tables)

    if plan is None:
        plan = plan_fused_gather_sharded(model, spec, mesh, nwalkers, dv_max)
    if plan is None:
        raise ValueError("dense fused-sharded composition ineligible for "
                         "this (model, spec, mesh, nwalkers) — check "
                         "plan_fused_gather_sharded first")
    statics, tables = gather_statics_tables(
        model, spec, grid_ints, grid_yerrs, bounds, prior_means, prior_stds,
        plan)
    n_w = mesh.shape[WALKER_AXIS]
    n_c = mesh.shape.get(CHAIN_AXIS, 1)
    dtype = model.dtype

    table_specs = tuple(P() for _ in tables)  # replicated (no line shards)
    W_SPEC = (CHAIN_AXIS, WALKER_AXIS)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(table_specs, P(W_SPEC, None), P()),
        out_specs=(P(None, W_SPEC, None), P(None, W_SPEC), P(),
                   P(W_SPEC, None), P(W_SPEC)),
        check_vma=False,
    )
    def sharded_run(tables_dev, pos_local, key):
        W_local, D = pos_local.shape
        h = W_local // 2
        n_comp = h * n_w
        w_idx = (jax.lax.axis_index(CHAIN_AXIS) * n_w
                 + jax.lax.axis_index(WALKER_AXIS))

        entry_lnprob = _make_gather_lnprob(*tables_dev, **statics)
        lnp_local = entry_lnprob(jnp.asarray(pos_local, dtype))[:, 0]
        fmin = jnp.finfo(dtype).min
        lnp_local = jnp.where(jnp.isfinite(lnp_local), lnp_local, fmin)

        # Bulk pre-generated randomness: make_sharded_runner's exact
        # stream (fold by walker-shard; perms/z/pair/acc in that order).
        k = jax.random.fold_in(key, w_idx)
        k_perm, k_z, k_pair, k_acc = jax.random.split(k, 4)
        perms = jnp.argsort(
            jax.random.uniform(k_perm, (nsteps, W_local)), axis=1)
        z_u = jax.random.uniform(k_z, (nsteps, 2, h), dtype=pos_local.dtype)
        pair = jax.random.randint(k_pair, (nsteps, 2, h), 0, n_comp)
        acc_u = jax.random.uniform(k_acc, (nsteps, 2, h),
                                   dtype=pos_local.dtype)

        from jax.experimental.pallas import tpu as pltpu

        call = pl.pallas_call(
            functools.partial(_half_step_kernel_gather, a=a, h=h, D=D,
                              **statics),
            out_shape=(jax.ShapeDtypeStruct((W_local, D + 1), dtype),
                       jax.ShapeDtypeStruct((1, 1), jnp.float32)),
            scratch_shapes=[pltpu.VMEM((h, 1), dtype)],
            interpret=interpret,
        )

        def one_step(carry, xs):
            state = carry                                     # (Wl, D+1)
            perm, zu, pr, au = xs
            acc = jnp.float32(0.0)
            for half in range(2):
                active = perm[half * h:(half + 1) * h]
                comp_idx = perm[(1 - half) * h:(2 - half) * h]
                comp = jax.lax.all_gather(state[comp_idx, :D], WALKER_AXIS,
                                          axis=0, tiled=True)
                state, a_h = call(state, active[:, None], comp,
                                  zu[half][None, :], pr[half][None, :],
                                  au[half][None, :], *tables_dev)
                acc = acc + a_h[0, 0]
            acc = jax.lax.psum(acc, (CHAIN_AXIS, WALKER_AXIS))
            return state, (state[:, :D], state[:, D], acc)

        state0 = jnp.concatenate([pos_local, lnp_local[:, None]], axis=1)
        state, (chain, lnps, accepted) = jax.lax.scan(
            one_step, state0, (perms, z_u, pair, acc_u))
        lnps = jnp.where(lnps == fmin, -jnp.inf, lnps)
        lnp = jnp.where(state[:, D] == fmin, -jnp.inf, state[:, D])
        return chain, lnps, accepted, state[:, :D], lnp

    jitted = jax.jit(sharded_run)

    def runner(pos0, key):
        W, D = pos0.shape
        if W != nwalkers:
            raise ValueError(
                f"pos0 carries {W} walkers but the per-device plan (and "
                f"its scoped-VMEM gate) was sized for nwalkers={nwalkers}; "
                f"rebuild the runner")
        pos0 = jax.device_put(jnp.asarray(pos0, dtype=dtype))
        chain, lnps, accepted, pos, lnp = jitted(tables, pos0, key)
        return chain, lnps, accepted, (pos, lnp)

    return runner


def _half_step_kernel_multi(stateT_ref, activer_ref, activec_ref, compT_ref,
                            zu_ref, pair_ref, au_ref, lines_ref, qst_ref,
                            velc_ref, chans_ref, out_stateT_ref, out_acc_ref,
                            opac_ref, flat_ref, *, a, h, D, K, **statics):
    """Multi-component half-step in the fused multi kernel's TRANSPOSED
    (D+1, W) layout (sampler/fused_multi.py: parameters in sublanes,
    walkers in lanes) — the same one-hot gather/scatter discipline as
    _half_update, column-oriented, against the gathered global complement
    compT (D, n_comp)."""
    from cha1_mcmc_tpu.sampler.fused_multi import _make_multi_lnprob

    lnprob = _make_multi_lnprob(lines_ref, qst_ref, velc_ref, chans_ref,
                                opac_ref, flat_ref, h=h, K=K, **statics)
    state = stateT_ref[:]                                     # (D+1, Wl)
    Wl = state.shape[1]
    wdt = state.dtype

    def dot(x, s):  # exact one-hot contraction (f32 at HIGHEST precision)
        return jnp.dot(x, s, preferred_element_type=wdt,
                       precision=jax.lax.Precision.HIGHEST)

    selT_a = (jax.lax.broadcasted_iota(jnp.int32, (Wl, h), 0)
              == activer_ref[0:1, :]).astype(wdt)             # (Wl, h)
    sa = dot(state, selT_a)                                   # (D+1, h)
    s_, lnp_s = sa[:D, :], sa[D:, :]

    compT = compT_ref[:]                                      # (D, n_comp)
    n_comp = compT.shape[1]
    selP = (jax.lax.broadcasted_iota(jnp.int32, (n_comp, h), 0)
            == pair_ref[0:1, :]).astype(wdt)
    c = dot(compT, selP)                                      # (D, h)

    zz = ((a - 1.0) * zu_ref[0:1, :] + 1.0) ** 2 / a          # (1, h)
    proposal = c + zz * (s_ - c)                              # (D, h)
    lnp_new = lnprob(proposal)                                # (1, h)
    lnpdiff = (D - 1.0) * jnp.log(zz) + lnp_new - lnp_s
    accept = jnp.log(au_ref[0:1, :]) < lnpdiff                # (1, h)

    # Mask values BEFORE the scatter matmul (0 * -inf would NaN-poison
    # the contracted column; accepted columns are always finite).
    sel_a = (jax.lax.broadcasted_iota(jnp.int32, (h, Wl), 1)
             == activec_ref[:]).astype(wdt)                   # (h, Wl)
    vals = jnp.where(accept,
                     jnp.concatenate([proposal, lnp_new], axis=0),
                     0.0)                                     # (D+1, h)
    newvals = dot(vals, sel_a)                                # (D+1, Wl)
    acc_w = dot(accept.astype(wdt), sel_a)                    # (1, Wl)
    out_stateT_ref[:] = jnp.where(acc_w > 0.5, newvals, state)
    out_acc_ref[0, 0] = jnp.sum(accept.astype(jnp.float32))


def fused_multi_sharded_supported(model, spec, dv_max: float, mesh: Mesh,
                                  nwalkers: int) -> bool:
    """Can the multi-component fused kernel run as the per-device
    half-step of this mesh? Walker sharding shrinks the per-device
    (C, K*h_local) working set, so meshes can hold ensembles a single
    chip cannot; gated by fused_multi_supported at the LOCAL ensemble
    size (one kernel call holds W_local walkers' half)."""
    from cha1_mcmc_tpu.sampler.fused_multi import fused_multi_supported

    if LINE_AXIS in mesh.shape and mesh.shape[LINE_AXIS] != 1:
        return False
    n_c = mesh.shape.get(CHAIN_AXIS, 1)
    n_w = mesh.shape[WALKER_AXIS]
    if nwalkers % (2 * n_c * n_w):
        return False
    return fused_multi_supported(model, spec, dv_max,
                                 nwalkers=nwalkers // (n_c * n_w))


def make_fused_multi_sharded_runner(
    model,
    spec,
    grid_ints,
    grid_yerrs,
    lnprior_fn,
    prior_means,
    prior_stds,
    mesh: Mesh,
    nsteps: int,
    nwalkers: int,
    dv_max: float,
    a: float = 2.0,
    interpret: bool = False,
):
    """The multi-component analogue of make_fused_sharded_runner: each
    half-update is one transposed-layout Pallas program per device
    (sampler/fused_multi.py's compact-span forward model and in-kernel
    ordered-velocity prior) between the two per-step all_gathers. Same
    mesh contract, PRNG stream, and split semantics as
    make_sharded_runner — the GOTHAM-class 14-dim fit keeps its
    us-regime step on the mesh (reference TMC1_four_component.py's
    model run under reference inference.py:456-463's pool replacement).

    Entry lnp uses the general path's forward_from_lines + lnprior_fn
    formulation (bitwise-matching make_sharded_runner's initialization);
    in-chain lnp comes from the kernel (agreeing to f32 ulps, the same
    caveat sampler/fused_multi.py documents)."""
    from jax.experimental.pallas import tpu as pltpu

    from cha1_mcmc_tpu.sampler.fused_multi import multi_statics_tables

    if LINE_AXIS in mesh.shape and mesh.shape[LINE_AXIS] != 1:
        raise ValueError("fused multi sharded runner requires "
                         "n_line_shards == 1 (line-sharded configs use "
                         "the general path)")
    n_w = mesh.shape[WALKER_AXIS]
    n_c = mesh.shape.get(CHAIN_AXIS, 1)
    if nwalkers % (2 * n_c * n_w):
        raise ValueError(
            f"nwalkers={nwalkers} must be divisible by 2 * {n_c} chains "
            f"* {n_w} walker shards")
    dtype = model.dtype
    K = spec.ncomp
    W_local = nwalkers // (n_c * n_w)
    statics, tables = multi_statics_tables(
        model, spec, grid_ints, grid_yerrs, prior_means, prior_stds,
        dv_max=dv_max, nwalkers=W_local)
    C = int(model.n_channels)

    y = jnp.asarray(grid_ints, dtype=dtype)
    inv_sigma2 = 1.0 / jnp.asarray(grid_yerrs, dtype=dtype) ** 2

    def entry_lnprob(theta):
        # Exactly make_sharded_runner's local_lnprob at n_line_shards == 1
        # (axis_name=None) so initialization is bitwise-shared.
        ss, Ncol, Tex, vlsr, dV = spec.unpack(jnp.asarray(theta, dtype=dtype))
        m = forward_from_lines(
            model.line_freq, model.line_elower, model.line_aij,
            model.line_gup, model.line_glow, model.vel_grid, model.q_model,
            model.grid_freq, model.mask_center, model.dish_size, model.Tbg,
            dtype, ss, Ncol, Tex, vlsr, dV, axis_name=None)
        resid = y - m
        ll = -0.5 * jnp.sum(resid * resid * inv_sigma2 - jnp.log(inv_sigma2))
        lp = lnprior_fn(theta)
        return jnp.where(jnp.isfinite(lp) & jnp.isfinite(ll), lp + ll,
                         -jnp.inf)

    table_specs = tuple(P() for _ in tables)  # replicated (no line shards)
    W_SPEC = (CHAIN_AXIS, WALKER_AXIS)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(table_specs, P(W_SPEC, None), P()),
        out_specs=(P(None, W_SPEC, None), P(None, W_SPEC), P(),
                   P(W_SPEC, None), P(W_SPEC)),
        check_vma=False,
    )
    def sharded_run(tables_dev, pos_local, key):
        Wl, D = pos_local.shape
        h = Wl // 2
        n_comp = h * n_w
        w_idx = (jax.lax.axis_index(CHAIN_AXIS) * n_w
                 + jax.lax.axis_index(WALKER_AXIS))

        lnp_local = jax.vmap(entry_lnprob)(pos_local)
        # -inf entry lnp would NaN-poison the in-kernel one-hot matmuls
        # (0 * -inf); clamp to the dtype minimum exactly like
        # sampler/fused.py and restore at the output boundary.
        fmin = jnp.finfo(dtype).min
        lnp_local = jnp.where(jnp.isfinite(lnp_local), lnp_local, fmin)

        # Bulk pre-generated randomness: make_sharded_runner's exact
        # stream (fold by walker-shard; perms/z/pair/acc in that order).
        k = jax.random.fold_in(key, w_idx)
        k_perm, k_z, k_pair, k_acc = jax.random.split(k, 4)
        perms = jnp.argsort(
            jax.random.uniform(k_perm, (nsteps, Wl)), axis=1)
        z_u = jax.random.uniform(k_z, (nsteps, 2, h), dtype=pos_local.dtype)
        pair = jax.random.randint(k_pair, (nsteps, 2, h), 0, n_comp)
        acc_u = jax.random.uniform(k_acc, (nsteps, 2, h),
                                   dtype=pos_local.dtype)

        call = pl.pallas_call(
            functools.partial(_half_step_kernel_multi, a=a, h=h,
                              D=D, K=K, **statics),
            out_shape=(jax.ShapeDtypeStruct((D + 1, Wl), dtype),
                       jax.ShapeDtypeStruct((1, 1), jnp.float32)),
            scratch_shapes=[pltpu.VMEM((C, K * h), dtype),
                            pltpu.VMEM((8, K * h), dtype)],
            interpret=interpret,
        )

        def one_step(carry, xs):
            stateT = carry                                    # (D+1, Wl)
            perm, zu, pr, au = xs
            acc = jnp.float32(0.0)
            for half in range(2):
                active = perm[half * h:(half + 1) * h]
                comp_idx = perm[(1 - half) * h:(2 - half) * h]
                compT = jax.lax.all_gather(stateT[:D, comp_idx], WALKER_AXIS,
                                           axis=1, tiled=True)
                stateT, a_h = call(stateT, active[None, :], active[:, None],
                                   compT, zu[half][None, :],
                                   pr[half][None, :], au[half][None, :],
                                   *tables_dev)
                acc = acc + a_h[0, 0]
            acc = jax.lax.psum(acc, (CHAIN_AXIS, WALKER_AXIS))
            return stateT, (stateT[:D, :].T, stateT[D, :], acc)

        state0 = jnp.concatenate([pos_local.T, lnp_local[None, :]], axis=0)
        stateT, (chain, lnps, accepted) = jax.lax.scan(
            one_step, state0, (perms, z_u, pair, acc_u))
        lnps = jnp.where(lnps == fmin, -jnp.inf, lnps)
        lnp = jnp.where(stateT[D, :] == fmin, -jnp.inf, stateT[D, :])
        return chain, lnps, accepted, stateT[:D, :].T, lnp

    jitted = jax.jit(sharded_run)

    def runner(pos0, key):
        W, D = pos0.shape
        if W != nwalkers:
            raise ValueError(
                f"pos0 carries {W} walkers but the per-device line chunking "
                f"(and its VMEM gate) was sized for nwalkers={nwalkers}; "
                f"rebuild the runner")
        pos0 = jax.device_put(jnp.asarray(pos0, dtype=dtype))
        chain, lnps, accepted, pos, lnp = jitted(tables, pos0, key)
        return chain, lnps, accepted, (pos, lnp)

    return runner


def make_fused_sharded_runner(
    model,
    spec,
    grid_ints,
    grid_yerrs,
    lnprior_fn,
    bounds,
    prior_means,
    prior_stds,
    mesh: Mesh,
    nsteps: int,
    a: float = 2.0,
    interpret: bool = False,
):
    """Build a jitted `runner(pos0, key) -> (chain, lnps, accepted,
    (pos, lnp))` with make_sharded_runner's exact contract, PRNG stream,
    and split semantics, executing each half-update as one fused Pallas
    program per device.

    Entry lnp is computed with the general path's forward_from_lines
    formulation (bitwise-matching make_sharded_runner's initialization);
    in-chain lnp comes from the kernel (agreeing to an f32 ulp).
    """
    if LINE_AXIS in mesh.shape and mesh.shape[LINE_AXIS] != 1:
        raise ValueError("fused sharded runner requires n_line_shards == 1 "
                         "(line-sharded configs use the general path)")
    n_w = mesh.shape[WALKER_AXIS]
    n_c = mesh.shape.get(CHAIN_AXIS, 1)
    dtype = model.dtype

    statics, tables = single_statics_tables(model, spec, grid_ints,
                                            grid_yerrs, bounds, prior_means,
                                            prior_stds)
    y = jnp.asarray(grid_ints, dtype=dtype)
    inv_sigma2 = 1.0 / jnp.asarray(grid_yerrs, dtype=dtype) ** 2

    def entry_lnprob(theta):
        # Exactly make_sharded_runner's local_lnprob at n_line_shards == 1
        # (axis_name=None) so initialization is bitwise-shared.
        ss, Ncol, Tex, vlsr, dV = spec.unpack(jnp.asarray(theta, dtype=dtype))
        m = forward_from_lines(
            model.line_freq, model.line_elower, model.line_aij,
            model.line_gup, model.line_glow, model.vel_grid, model.q_model,
            model.grid_freq, model.mask_center, model.dish_size, model.Tbg,
            dtype, ss, Ncol, Tex, vlsr, dV, axis_name=None)
        resid = y - m
        ll = -0.5 * jnp.sum(resid * resid * inv_sigma2 - jnp.log(inv_sigma2))
        lp = lnprior_fn(theta)
        return jnp.where(jnp.isfinite(lp) & jnp.isfinite(ll), lp + ll,
                         -jnp.inf)

    table_specs = tuple(P() for _ in tables)  # replicated (no line shards)
    W_SPEC = (CHAIN_AXIS, WALKER_AXIS)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(table_specs, P(W_SPEC, None), P()),
        out_specs=(P(None, W_SPEC, None), P(None, W_SPEC), P(),
                   P(W_SPEC, None), P(W_SPEC)),
        check_vma=False,
    )
    def sharded_run(tables_dev, pos_local, key):
        W_local, D = pos_local.shape
        h = W_local // 2
        n_comp = h * n_w
        w_idx = (jax.lax.axis_index(CHAIN_AXIS) * n_w
                 + jax.lax.axis_index(WALKER_AXIS))

        lnp_local = jax.vmap(entry_lnprob)(pos_local)
        # -inf entry lnp would NaN-poison the in-kernel one-hot matmuls
        # (0 * -inf); clamp to the dtype minimum exactly like
        # sampler/fused.py and restore at the output boundary.
        fmin = jnp.finfo(dtype).min
        lnp_local = jnp.where(jnp.isfinite(lnp_local), lnp_local, fmin)

        # Bulk pre-generated randomness: make_sharded_runner's exact
        # stream (fold by walker-shard; perms/z/pair/acc in that order).
        k = jax.random.fold_in(key, w_idx)
        k_perm, k_z, k_pair, k_acc = jax.random.split(k, 4)
        perms = jnp.argsort(
            jax.random.uniform(k_perm, (nsteps, W_local)), axis=1)
        z_u = jax.random.uniform(k_z, (nsteps, 2, h), dtype=pos_local.dtype)
        pair = jax.random.randint(k_pair, (nsteps, 2, h), 0, n_comp)
        acc_u = jax.random.uniform(k_acc, (nsteps, 2, h),
                                   dtype=pos_local.dtype)

        call = pl.pallas_call(
            functools.partial(_half_step_kernel, a=a, h=h, D=D, **statics),
            out_shape=(jax.ShapeDtypeStruct((W_local, D + 1), dtype),
                       jax.ShapeDtypeStruct((1, 1), jnp.float32)),
            interpret=interpret,
        )

        def one_step(carry, xs):
            state = carry                                     # (Wl, D+1)
            perm, zu, pr, au = xs
            acc = jnp.float32(0.0)
            for half in range(2):
                active = perm[half * h:(half + 1) * h]
                comp_idx = perm[(1 - half) * h:(2 - half) * h]
                comp = jax.lax.all_gather(state[comp_idx, :D], WALKER_AXIS,
                                          axis=0, tiled=True)
                state, a_h = call(state, active[:, None], comp,
                                  zu[half][None, :], pr[half][None, :],
                                  au[half][None, :], *tables_dev)
                acc = acc + a_h[0, 0]
            acc = jax.lax.psum(acc, (CHAIN_AXIS, WALKER_AXIS))
            return state, (state[:, :D], state[:, D], acc)

        state0 = jnp.concatenate([pos_local, lnp_local[:, None]], axis=1)
        state, (chain, lnps, accepted) = jax.lax.scan(
            one_step, state0, (perms, z_u, pair, acc_u))
        lnps = jnp.where(lnps == fmin, -jnp.inf, lnps)
        lnp = jnp.where(state[:, D] == fmin, -jnp.inf, state[:, D])
        return chain, lnps, accepted, state[:, :D], lnp

    jitted = jax.jit(sharded_run)

    def runner(pos0, key):
        W, D = pos0.shape
        if W % (2 * n_c * n_w):
            raise ValueError(
                f"nwalkers={W} must be divisible by 2 * {n_c} chains * "
                f"{n_w} walker shards")
        pos0 = jax.device_put(jnp.asarray(pos0, dtype=dtype))
        chain, lnps, accepted, pos, lnp = jitted(tables, pos0, key)
        return chain, lnps, accepted, (pos, lnp)

    return runner
