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
    same-position block ADD onto the leading channel blocks instead of a
    (C2, C) one-hot MXU contraction (models/pallas_kernels.py's
    opacity_gather_split scatter) — no scatter matmul, no (C2, C) static
    in VMEM. lnprob is a channel sum, so the permutation only
    reassociates the chi^2 reduction (lnp to f32 ulps vs the natural
    order — within the kernel's documented contract);
  * the lnprob is evaluated in (wchunk walkers) x (cblock channels)
    tiles: the dominant temporaries are (wchunk, M, cblock) — bounded
    for ANY catalog/grid size, which is what lets grids far too wide for
    a whole-(n, M, C) formulation (the 10,850-channel dense_full_fit
    datagrid) keep the fused step. The channel walk mode is planned per
    region: a statically unrolled accumulator when its ~2-block seam
    charge fits the scoped budget (full unroll up to _UNROLL_BLOCKS
    blocks, a fori over unrolled groups beyond — measured 43.8 vs 68.3
    us/step whole-chain on the v5e), else a plain one-block-per-
    iteration lax.fori_loop. Crucially the tables are BLOCK-STACKED
    host-side — each channel block's columns become a row-band, so the
    loop's dynamic slices run along the SUBLANE-major axis with static
    sizes (the form Mosaic lowers well); dynamic slicing along the lane
    axis is avoided entirely;
  * a state-sum partition function (the aromatics' 16k-state fallback Q)
    is served by a Chebyshev device surrogate when the model carries one
    (catalogs/partition.py:fit_device_cheb — the pipeline attaches it
    over the Tex prior box; the exact state-sum walk measured ~95% of
    the in-kernel eval cost on the v5e). Without a surrogate the exact
    sum is chunked over row-stacked (8, schunk) state bands, so the
    (wchunk, S) Boltzmann block no longer caps the walker chunk;
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
from cha1_mcmc_tpu.catalogs.partition import device_n_states
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


def _sub8(r: int) -> int:
    return -(-r // 8) * 8


#: Static-unroll group size for the channel-block walk. Regions with at
#: most this many blocks unroll fully; longer regions walk a
#: lax.fori_loop over GROUPS of this many statically unrolled blocks
#: (plus an unrolled remainder), so the program size stays bounded while
#: keeping the unrolled walk's speed (measured on the v5e,
#: tools/tpu_time_gather_ablate.py 2026-08-19: the unrolled bench-dense
#: walk runs the whole fused chain at 43.8 us/step vs 68.3 with the
#: plain one-block-per-iteration fori walk). The unrolled walk
#: accumulates into an (n, 1) partial (ll = ll + part(b)), so each
#: block's dead temporaries POP off the Mosaic scoped stack after the
#: add — unlike chunk results that survive for a final concatenate,
#: which pin the stack (see _make_gather_lnprob); the estimator charges
#: unrolled regions ~2 live blocks (the seam), plain-fori regions one
#: iteration. The walk mode is chosen per region at PLAN time (plan keys
#: unroll_bo/unroll_br): a region whose unrolled seam charge would blow
#: the scoped budget falls back to the plain fori walk instead of
#: refusing the fused kernel outright.
_UNROLL_BLOCKS = 16

#: State-sum chunk width: Q(T)'s (wchunk, S) Boltzmann block is walked in
#: (wchunk, _STATE_CHUNK) tiles when S exceeds it (the aromatics carry
#: ~16k states; at wchunk=64 the unchunked block alone is ~13 MiB).
_STATE_CHUNK = 2048


def _geom(tables, C: int, n_states: int, cblock: int):
    """Block-walk geometry for one candidate channel-block width."""
    cb0 = tables.get("cb0", 0) if tables["has_overflow"] else 0
    n_bo = -(-cb0 // cblock) if cb0 else 0
    cb0p = n_bo * cblock
    rest = max(C - cb0p, 0)
    n_br = -(-rest // cblock) if rest else 0
    Cp = (n_bo + n_br) * cblock
    if n_states:
        s_pad = _lane(n_states)
        schunk = min(s_pad, _STATE_CHUNK)
        n_sb = -(-s_pad // schunk)
    else:
        schunk, n_sb = 0, 0
    return dict(cblock=cblock, n_bo=n_bo, n_br=n_br, cb0p=cb0p, Cp=Cp,
                schunk=schunk, n_sb=n_sb)


def _vmem_estimate(tables, C, n_states, wchunk, nwalkers,
                   cblock: int, unroll_bo=None, unroll_br=None) -> int:
    """Scoped-VMEM working-set model (bytes) for a candidate channel
    block width, calibrated against the measured on-chip data point (v5e
    terminal compile of the pre-blocking bench-dense program, wchunk=16,
    whole-width blocks: "Scoped allocation with size 19.58M"): ~8 live
    padded (wchunk, M, cblock) layers through tau_sticks' elementwise
    chain and the windowed Gaussian per channel block, ~3 live
    (wchunk, schunk) layers in the state-sum Q, 4 (wchunk, cblock)
    channel rows in the RT/chi^2 tail, the per-iteration row-band loads,
    plus the block-stacked static tables and the step loop's selectors.
    Unrolled regions accumulate into an (n, 1) partial, so each block's
    layers pop after its add — charged ~2 live blocks (the seam, where
    one block's surviving partial overlaps the next block's transient;
    the 16-block unrolled bench-dense walk compiling at wchunk=32 on the
    v5e bounds the true live count at <= 2.7 blocks under this model).
    fori regions cost one iteration. unroll_bo/unroll_br pick the walk
    mode per region (None: derive from _UNROLL_BLOCKS eligibility)."""
    M1 = tables["vel1"].shape[0]
    M2 = tables["vel2"].shape[0]
    g = _geom(tables, C, n_states, cblock)
    n_bo, n_br, n_sb, schunk = g["n_bo"], g["n_br"], g["n_sb"], g["schunk"]
    n_blk = n_bo + n_br
    if unroll_bo is None:
        unroll_bo = n_bo <= _UNROLL_BLOCKS
    if unroll_br is None:
        unroll_br = n_br <= _UNROLL_BLOCKS

    R1, V1 = _sub8(5 * M1), _sub8(M1)
    R2, V2 = _sub8(5 * M2), _sub8(M2)
    static = 4 * (n_blk * (R1 + V1 + 8) * cblock
                  + n_bo * (R2 + V2) * cblock
                  + n_sb * 8 * max(schunk, 1))
    layers_o = _pad_tile(M1, cblock) + _pad_tile(M2, cblock) if n_bo else 0
    layers_r = _pad_tile(M1, cblock) if n_br else 0
    blk = ((min(n_bo, 2) if unroll_bo else 1) * layers_o
           + (min(n_br, 2) if unroll_br else 1) * layers_r)
    loads = ((R1 + V1 + 8 + (R2 + V2 if n_bo else 0)) * cblock
             + 8 * max(schunk, 1))
    chunk = 4 * (wchunk * (8 * blk + 3 * schunk + 4 * cblock) + loads)
    h = nwalkers // 2
    loop = 4 * (3 * h * nwalkers + 2 * nwalkers * 8)
    return static + chunk + loop


def _pick_chunks(tables, C: int, n_states: int, nwalkers: int,
                 budget: int, prober=None, max_probes: int = 4):
    """Pick (wchunk, cblock, unroll_bo, unroll_br) by measured on-chip
    preference, not a re-read-count heuristic (v5e ablations,
    tools/tpu_time_gather_ablate.py 2026-08-19):

      * cblock: 128 > 512 > 2048 (0.032 / 0.058 / 0.164 ms/eval) —
        narrow channel blocks are both fastest AND minimize the scoped
        working set (every term of _vmem_estimate grows with cblock, so
        a wider block can never rescue a failed 128 plan; 128 is the
        only candidate).
      * the HEAVY-unroll walk modes (both regions unrolled, or the
        larger region unrolled — any block count can take the unrolled
        walk, long regions running it as a fori over _UNROLL_BLOCKS-
        block unrolled groups) are tried across every walker chunk,
        largest first, BEFORE any light mode: the measured ordering is
        (w64, rest-unrolled) 26.8 us/step < (w32, rest-unrolled) 55.5
        < (w64, fori) 64.1 < (w32, fori) ~67 whole-chain in one
        session window — the unrolled walk on the dominant region and
        a large walker chunk both matter, and a big chunk cannot
        rescue a downgraded walk.
      * within a weight class, wchunk LARGEST first — ideally the whole
        half-ensemble in one chunk. With the Chebyshev Q surrogate the
        per-chunk overhead dominates the eval (kern_w64 0.002 vs
        kern_base@w32 0.022 ms/eval).

    Admission is two-tier. A candidate whose _vmem_estimate is within
    `budget` (the analytic line every observed-safe plan sits under) is
    taken outright. Above that line the analytic model is KNOWN
    unreliable in both directions (it modeled a failing dense_full plan
    at 15.2 MiB and a passing bench-dense plan at 29.0 MiB, both
    2026-08-19), so a candidate up to _SCOPED_VMEM_PROBE_MAX is admitted
    only when `prober(tables, C, n_states, wchunk, cblock, ubo, ubr)`
    returns True — fused_gather._probe_verdict, a deviceless Mosaic
    compile of the real program (cached per geometry). At most
    `max_probes` uncached probe compiles run per planning call; beyond
    that the remaining candidates fall back to the analytic line.

    Returns None when nothing fits."""
    h = max(nwalkers // 2, 1)
    g = _geom(tables, C, n_states, 128)
    n_bo, n_br = g["n_bo"], g["n_br"]
    big, small = (((False, True), (True, False)) if n_br >= n_bo
                  else ((True, False), (False, True)))
    cands = sorted({h} | {w for w in (64, 32, 16, 8) if w <= h},
                   reverse=True)
    probes_left = max_probes
    for walks in (((True, True), big), (small, (False, False))):
        for wchunk in cands:
            for ubo, ubr in walks:
                est = _vmem_estimate(tables, C, n_states, wchunk,
                                     nwalkers, 128, ubo, ubr)
                if est <= budget:
                    return wchunk, 128, ubo, ubr
                if (prober is not None and probes_left > 0
                        and est <= _SCOPED_VMEM_PROBE_MAX):
                    verdict, cached = prober(tables, C, n_states, wchunk,
                                             128, ubo, ubr)
                    if not cached:
                        probes_left -= 1
                    if verdict:
                        return wchunk, 128, ubo, ubr
    return None


#: Analytic admission line, in MODELED bytes (_vmem_estimate), against
#: the Mosaic scoped-VMEM stack whose compiler limit on the v5e is
#: 16 MiB — NOT the 128 MiB VMEM total that sampler/fused.py's
#: whole-grid gate budgets against. The estimate was calibrated to the
#: PRE-blocking program's terminal-compile failures (25.50M at w64,
#: 19.58M at w16 — Mosaic pads (wchunk, M, c) temporaries to (8, 128)
#: tiles and keeps several live); every plan it has modeled <= 12 MiB
#: has compiled and run on-chip. ABOVE this line the model is known
#: unreliable in BOTH directions (2026-08-19 evidence): a dense_full
#: w64 plan modeled at 15.2 MiB failed Mosaic at "Scoped allocation
#: with size 17.53M" (identically on the relay terminal and on the
#: local deviceless pipeline), while bench-dense w64 plans modeled at
#: 17.0 and 29.0 MiB both terminal-compiled and the 17.0 one ran the
#: whole chain at 26.9 us/step — 2.1x the w32 plan. One scalar budget
#: cannot order both geometries, so candidates above the line are
#: admitted by PROBING: _probe_verdict compiles the real program
#: devicelessly (cached per geometry) and the Mosaic allocator itself
#: gives the verdict. _SCOPED_VMEM_PROBE_MAX bounds how far past the
#: model a probe is worth attempting (the strongest probe-validated
#: point is 29.0 MiB modeled).
_SCOPED_VMEM_BUDGET = 12 << 20
_SCOPED_VMEM_PROBE_MAX = 32 << 20


def _geometry_key(tables, C, n_states, wchunk, cblock, ubo, ubr,
                  nwalkers, extra=()):
    """Stable digest of everything that determines the compiled program's
    scoped-VMEM watermark: table SHAPES (values are compile-time
    irrelevant), the chunking/walk plan, and the toolchain version."""
    import hashlib
    import json

    desc = {"C": int(C), "n_states": int(n_states), "wchunk": int(wchunk),
            "cblock": int(cblock), "ubo": bool(ubo), "ubr": bool(ubr),
            "nwalkers": int(nwalkers), "jax": jax.__version__,
            "extra": list(extra)}
    for k in sorted(tables):
        v = tables[k]
        desc[k] = ([list(v.shape), str(v.dtype)] if hasattr(v, "shape")
                   else v)
    blob = json.dumps(desc, sort_keys=True, default=str)
    return hashlib.sha1(blob.encode()).hexdigest()


def _verdict_cache_path() -> str:
    import os
    root = os.environ.get("CHA1_CACHE_DIR",
                          os.path.expanduser("~/.cache/cha1_mcmc_tpu"))
    return os.path.join(root, "vmem_verdicts.json")


def _load_verdicts() -> dict:
    import json
    import os
    path = _verdict_cache_path()
    if not os.path.exists(path):
        return {}
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:  # corrupt cache: rebuild
        return {}


def _store_verdict(key: str, entry: dict) -> None:
    import json
    import os
    path = _verdict_cache_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    verdicts = _load_verdicts()
    verdicts[key] = entry
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(verdicts, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def _make_prober(model, spec, nwalkers: int):
    """Build the `prober` callback _pick_chunks consults for candidates
    above the analytic line: a deviceless Mosaic compile of the real
    candidate program in a clean CPU subprocess
    (sampler/vmem_probe.py), with verdicts cached per geometry in
    ${CHA1_CACHE_DIR:-~/.cache/cha1_mcmc_tpu}/vmem_verdicts.json so each
    (tables, plan, toolchain) is compiled at most once per machine.
    Returns (verdict: bool, cached: bool); infrastructure failures and
    timeouts count as False/uncached (the candidate is skipped, never
    blindly admitted)."""
    import os
    import pickle
    import subprocess
    import sys
    import tempfile
    import time

    qm = model.q_model
    q_extra = (qm.kind, len(qm.coeffs or ()),
               len(qm.cheb_coeffs or ()) if qm.cheb_coeffs else 0)
    timeout = float(os.environ.get("CHA1_VMEM_PROBE_TIMEOUT", "1200"))

    def prober(tables, C, n_states, wchunk, cblock, ubo, ubr):
        key = _geometry_key(tables, C, n_states, wchunk, cblock, ubo, ubr,
                            nwalkers, extra=q_extra)
        cached = _load_verdicts().get(key)
        if cached is not None and cached.get("ok") is not None:
            return bool(cached["ok"]), True
        plan = dict(tables=tables, wchunk=wchunk, unroll_bo=ubo,
                    unroll_br=ubr, **_geom(tables, C, n_states, cblock))
        est = _vmem_estimate(tables, C, n_states, wchunk, nwalkers,
                             cblock, ubo, ubr)
        print(f"[fused-gather] probing plan wchunk={wchunk} "
              f"cblock={cblock} unroll=({int(ubo)},{int(ubr)}) "
              f"modeled {est / 2**20:.1f} MiB via deviceless Mosaic "
              f"compile (one-time; verdict cached)", flush=True)
        env = dict(os.environ)
        env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        fd, path = tempfile.mkstemp(suffix=".pkl")
        try:
            with os.fdopen(fd, "wb") as f:
                pickle.dump({"model": model, "spec": spec,
                             "plan": plan, "nwalkers": nwalkers}, f)
            t0 = time.perf_counter()
            try:
                proc = subprocess.run(
                    [sys.executable, "-m",
                     "cha1_mcmc_tpu.sampler.vmem_probe", path],
                    env=env, capture_output=True, text=True,
                    timeout=timeout)
            except subprocess.TimeoutExpired:
                print(f"[fused-gather] probe timed out after {timeout:.0f}s"
                      f" — candidate skipped", flush=True)
                return False, False
        finally:
            try:
                os.unlink(path)
            except OSError:
                pass
        dt = time.perf_counter() - t0
        note = (proc.stdout.strip().splitlines() or [""])[-1][:400]
        if proc.returncode in (0, 1):
            ok = proc.returncode == 0
            _store_verdict(key, {
                "ok": ok, "modeled_bytes": int(est), "wchunk": int(wchunk),
                "cblock": int(cblock), "unroll": [bool(ubo), bool(ubr)],
                "C": int(C), "n_states": int(n_states),
                "nwalkers": int(nwalkers), "compile_s": round(dt, 1),
                "note": note, "ts": time.time()})
            print(f"[fused-gather] probe verdict: "
                  f"{'OK' if ok else 'SCOPED-VMEM FAIL'} in {dt:.0f}s",
                  flush=True)
            return ok, False
        print(f"[fused-gather] probe inconclusive (rc={proc.returncode}: "
              f"{note or proc.stderr.strip()[:200]}) — candidate skipped",
              flush=True)
        return False, False

    return prober


def plan_fused_gather(model, spec, dv_max: float, nwalkers: int = 128,
                      budget: int = _SCOPED_VMEM_BUDGET,
                      min_saving: float = 1.3, probe: bool | None = None):
    """Build the channel-major tables and pick the (walker, channel,
    state) chunking, or return None when (model, spec) cannot take the
    fused kernel (multi-component layout, or a working set over the VMEM
    budget). Returns a plan dict: {tables, wchunk, cblock, n_bo, n_br,
    cb0p, Cp, schunk, n_sb, unroll_bo, unroll_br}.

    `probe` enables the deviceless-Mosaic admission tier for candidate
    chunkings modeled past the analytic `budget` (see _pick_chunks /
    _make_prober). Default None = auto: probe when running against a
    real accelerator backend (where a wrongly-admitted plan costs a
    ~30-minute relay terminal-compile failure and a wrongly-rejected one
    costs 2x whole-chain throughput) and CHA1_VMEM_PROBE is not "0";
    CPU/test runs never probe.

    Table construction on a 35k-line catalog costs seconds of host time
    (the (L, C) window scan), so callers that first check support and then
    build the kernel should do both through this one plan (pipeline/fit.py
    passes the plan into make_fused_ensemble_gather via `plan=`)."""
    import os
    if spec.ncomp != 1:
        return None
    tables = build_dense_tables(model, dv_max, min_saving=min_saving)
    qm = model.q_model
    n_states = device_n_states(qm)
    C = int(model.n_channels)
    if probe is None:
        probe = (os.environ.get("CHA1_VMEM_PROBE", "1") != "0"
                 and jax.default_backend() != "cpu")
    prober = _make_prober(model, spec, nwalkers) if probe else None
    picked = _pick_chunks(tables, C, n_states, nwalkers, budget, prober)
    if picked is None:
        return None
    wchunk, cblock, unroll_bo, unroll_br = picked
    return dict(tables=tables, wchunk=wchunk, unroll_bo=unroll_bo,
                unroll_br=unroll_br, **_geom(tables, C, n_states, cblock))


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
                        has_overflow, M1, M2, wchunk, cblock, n_bo, n_br,
                        schunk, n_sb, unroll_bo=None, unroll_br=None,
                        out_scratch=None):
    """lnprob from the block-stacked channel-major tables, (n, D) ->
    (n, 1), evaluated in (wchunk walkers) x (cblock channels) tiles so
    the dominant (chunk, M, cblock) temporaries stay inside the
    scoped-VMEM budget.

    Table layout (built by gather_statics_tables): each channel block b
    is a ROW BAND — lines1[b*R1:(b+1)*R1, :cblock] holds the five
    (M1, cblock) constant planes (R1 = 5*M1 padded to a sublane
    multiple), vel1 the (M1, cblock) velocities at stride V1, chans the
    (3, cblock) obs rows at stride 8, and (for blocks b < n_bo) lines2/
    vel2 the overflow planes at strides R2/V2. The channel walk's
    dynamic slices therefore run along the sublane-MAJOR axis with
    static sizes — the form Mosaic lowers to cheap address arithmetic.
    An earlier formulation sliced the lane axis (x[:, pl.ds(c0, w)])
    and, while interpret-mode exact, produced wrong trajectories AND a
    ~30x slowdown when terminal-compiled on the v5e — do not reintroduce
    lane-axis dynamic slicing here.

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
    sampler/fused_multi.py uses. The channel walk inside a chunk is
    plan-selected per region (unroll_bo/unroll_br; None falls back to
    the _UNROLL_BLOCKS eligibility): a statically unrolled accumulator
    (each block's add pops its temporaries — the measured-fastest walk,
    43.8 vs 68.3 us/step whole-chain on the v5e) or a lax.fori_loop
    whose carried (cn, 1) partial lets every iteration's temporaries pop
    while the program size stays flat with grid width. With
    out_scratch=None (the sharded composition's
    plain-array entry lnprob, outside Pallas) the SAME walk runs on
    plain arrays via lax.dynamic_slice — one numerics definition, one
    reduction order, for both paths."""
    in_kernel = out_scratch is not None
    R1, V1 = _sub8(5 * M1), _sub8(M1)
    R2, V2 = _sub8(5 * M2), _sub8(M2)

    def band(x, r0, rows):
        """(rows, cblock) row band starting at r0 (static under unroll,
        traced sublane-aligned under fori)."""
        if in_kernel:
            if not isinstance(r0, int):
                r0 = pl.multiple_of(r0, 8)
            return x[pl.ds(r0, rows), :]
        return jax.lax.dynamic_slice_in_dim(x, r0, rows, axis=0)

    def q_of(Tex):  # (n, 1) -> (n, 1)
        if q_kind != "states" or n_sb <= 1:
            return _make_q_of(q_kind, q_coeffs, q_power, q_scale, qst)(Tex)
        # State-sum fallback Q walked over row-stacked (8, schunk) bands
        # (module docstring): zero-padded states (g=0) add exactly 0; the
        # fori carry is the (n, 1) partial sum.
        inv = -1.0 / (KCM * Tex)                             # (n, 1)

        def body(j, acc):
            b = band(qst, j * 8, 8)
            g_row, E_row = b[0:1, :], b[1:2, :]
            return acc + jnp.sum(g_row * jnp.exp(E_row * inv), axis=1,
                                 keepdims=True)

        return jax.lax.fori_loop(0, n_sb, body, jnp.zeros_like(Tex))

    def opac_block(lines_b, vel_b, M, Q, Ncol, Tex, vlsr, dV):
        """Channel-major opacity over one (M, cblock) band: tau recompute
        + windowed Gaussian, summed over table rows -> (n, cblock)."""
        lf, le, la_, lg, lgl = (lines_b[i * M:(i + 1) * M, :]
                                for i in range(5))
        taus = tau_sticks(jnp, lf[None], le[None], la_[None], lg[None],
                          lgl[None], Q[:, :, None], Ncol[:, :, None],
                          Tex[:, :, None], dV[:, :, None])  # (n, M, cb)
        sigma = (dV / FWHM_TO_SIGMA_MODEL)[:, :, None]        # (n, 1, 1)
        aa = (-0.5 * np.log2(np.e)) / (sigma * sigma)
        window = (jnp.abs(vel_b[None] - mask_center)
                  < VELOCITY_WINDOW_DV * dV[:, :, None])
        d = vel_b[None] - vlsr[:, :, None]
        gauss = jnp.where(window, jnp.exp2(aa * (d * d)), 0.0)
        return jnp.sum(taus * gauss, axis=1)                  # (n, cb)

    def chunk_ll(dt, ss_w, Q, Ncol, Tex, vlsr, dV):
        """Blocked chi^2 over the permuted channel axis, (n, 1)."""
        def part(b, with_over):
            opac = opac_block(band(lines1, b * R1, 5 * M1),
                              band(vel1, b * V1, M1)[0:M1, :],
                              M1, Q, Ncol, Tex, vlsr, dV)
            if with_over:
                # heavy-first permutation: overflow adds in place
                opac = opac + opac_block(band(lines2, b * R2, 5 * M2),
                                         band(vel2, b * V2, M2)[0:M2, :],
                                         M2, Q, Ncol, Tex, vlsr, dV)
            cb = band(chans, b * 8, 8)
            gf, y, isig = cb[0:1, :], cb[1:2, :], cb[2:3, :]
            return _rt_chi2_block(dt, ss_w, Tex, opac, gf, y, isig,
                                  dish_size=dish_size, Tbg=Tbg)

        ll = jnp.zeros_like(Tex)
        for n_b, base, w_over, unroll in (
                (n_bo, 0, has_overflow, unroll_bo),
                (n_br, n_bo, False, unroll_br)):
            if not n_b:
                continue
            if unroll if unroll is not None else n_b <= _UNROLL_BLOCKS:
                # Unrolled accumulator walk: full unroll up to
                # _UNROLL_BLOCKS blocks, else a fori over GROUPS of
                # _UNROLL_BLOCKS statically unrolled blocks + unrolled
                # remainder. Same left-fold add order as the plain fori
                # walk (bitwise-identical), same ~2-block seam charge.
                G = _UNROLL_BLOCKS
                n_full = n_b // G if n_b > G else 0
                tail0 = n_full * G
                if n_full:
                    def gbody(j, acc, bs, ov):
                        b0 = bs + j * G
                        for g in range(G):
                            acc = acc + part(b0 + g, ov)
                        return acc
                    ll = jax.lax.fori_loop(
                        0, n_full,
                        functools.partial(gbody, bs=base, ov=w_over), ll)
                for i in range(tail0, n_b):
                    ll = ll + part(base + i, w_over)
            else:
                ll = jax.lax.fori_loop(
                    0, n_b,
                    functools.partial(
                        lambda i, acc, bs, ov: acc + part(bs + i, ov),
                        bs=base, ov=w_over),
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


def _stack_bands(arr, Cp: int, cblock: int, stride: int, pad_value):
    """Block-stack a host (R, C*) table: pad the channel axis to Cp
    (`pad_value`: None = edge-replicate for line constants so tau stays
    finite; a float otherwise), then lay each cblock-wide column block
    into its own `stride`-row band -> (n_blk * stride, cblock). Dead
    rows (R..stride) are zero and are sliced away before any compute."""
    R, c = arr.shape
    if Cp > c:
        if pad_value is None:
            arr = np.pad(arr, ((0, 0), (0, Cp - c)), mode="edge")
        else:
            arr = np.pad(arr, ((0, 0), (0, Cp - c)),
                         constant_values=pad_value)
    else:
        arr = arr[:, :Cp]
    n_blk = Cp // cblock
    out = np.zeros((n_blk * stride, cblock), arr.dtype)
    for b in range(n_blk):
        out[b * stride:b * stride + R] = arr[:, b * cblock:(b + 1) * cblock]
    return out


def gather_statics_tables(model, spec, grid_ints, grid_yerrs, bounds,
                          prior_means, prior_stds, plan):
    """Static kwargs + device tables for the channel-major in-kernel
    lnprob (_make_gather_lnprob) — shared by the whole-step kernel above
    and the sharded half-step composition (parallel/sharded_fused.py).
    The counterpart of sampler/fused.py:single_statics_tables for the
    dense table layout.

    Block-stacks every table host-side (cheap numpy) per the plan's
    geometry: the main table and obs rows extend to Cp channels (exact
    zero contribution: vel=_PAD_VEL so opac=0, y=0/isig=1 so the chi^2
    term is exactly 0 and log isig = 0), the overflow table to cb0p, the
    state-sum (g, E) to n_sb * schunk zero-padded states (g=0 adds
    exactly 0) — so every walked band is full width."""
    tables, wchunk = plan["tables"], plan["wchunk"]
    cblock, n_bo, n_br = plan["cblock"], plan["n_bo"], plan["n_br"]
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

    M1 = tables["vel1"].shape[0]
    M2 = tables["vel2"].shape[0]
    R1, V1 = _sub8(5 * M1), _sub8(M1)
    R2, V2 = _sub8(5 * M2), _sub8(M2)
    np_dt = np.float64 if model.dtype == jnp.float64 else np.float32
    chans = np.stack([np.asarray(model.grid_freq, np_dt),
                      np.asarray(grid_ints, np_dt),
                      1.0 / np.asarray(grid_yerrs, np_dt) ** 2])
    if tables["perm"] is not None:
        chans = chans[:, tables["perm"]]   # heavy-first channel order
    # exact-zero padding channels: gf=1 (planck finite), y=0, isig=1
    pad_col = np.array([[1.0], [0.0], [1.0]], np_dt)
    if Cp > chans.shape[1]:
        chans = np.concatenate(
            [chans, np.tile(pad_col, (1, Cp - chans.shape[1]))], axis=1)
    chans_s = _stack_bands(chans, Cp, cblock, 8, pad_value=0.0)
    lines1 = _stack_bands(tables["lines1"], Cp, cblock, R1, pad_value=None)
    vel1 = _stack_bands(tables["vel1"], Cp, cblock, V1, pad_value=_PAD_VEL)
    if n_bo:
        lines2 = _stack_bands(tables["lines2"], cb0p, cblock, R2,
                              pad_value=None)
        vel2 = _stack_bands(tables["vel2"], cb0p, cblock, V2,
                            pad_value=_PAD_VEL)
    else:
        lines2 = np.zeros((R2, cblock), np_dt)
        vel2 = np.full((V2, cblock), _PAD_VEL, np_dt)

    if qm.cheb_coeffs is not None:
        # Chebyshev device surrogate (partition.py:fit_device_cheb) —
        # kills the state-sum walk that measured ~95% of the in-kernel
        # eval cost at the bench-dense size (kern_base 0.035 ms/eval vs
        # kern_qones 0.001; tools/tpu_time_gather_ablate.py 2026-08-19).
        # q_power carries the fit interval — see fused._make_q_of.
        qst = jnp.zeros((2, 8), model.dtype)
        q_static = dict(q_kind="cheb", q_coeffs=qm.cheb_coeffs,
                        q_power=qm.cheb_interval, q_scale=1.0)
    elif qm.kind == "states":
        qst_h = np.stack([np.asarray(qm.g), np.asarray(qm.E)]).astype(np_dt)
        if n_sb > 1:
            qst_h = _stack_bands(qst_h, n_sb * schunk, schunk, 8,
                                 pad_value=0.0)
        qst = jnp.asarray(qst_h, model.dtype)
        q_static = dict(q_kind="states", q_coeffs=(), q_power=None,
                        q_scale=1.0)
    else:
        qst = jnp.zeros((2, 8), model.dtype)
        q_static = dict(q_kind="analytic", q_coeffs=qm.coeffs,
                        q_power=qm.power, q_scale=qm.scale)
    dev = (jnp.asarray(lines1), jnp.asarray(vel1),
           jnp.asarray(lines2), jnp.asarray(vel2),
           jnp.asarray(chans_s, model.dtype), qst)
    statics = dict(
        ss=None if free_ss else float(spec.fixed_source_size),
        dish_size=float(model.dish_size), Tbg=float(model.Tbg),
        mask_center=float(model.mask_center), **q_static,
        bounds_lo=lo, bounds_hi=hi,
        prior_mean=tuple(means), prior_std=tuple(stds),
        has_overflow=tables["has_overflow"], M1=M1, M2=M2,
        wchunk=wchunk, cblock=cblock, n_bo=n_bo, n_br=n_br,
        schunk=schunk, n_sb=n_sb,
        unroll_bo=plan.get("unroll_bo"), unroll_br=plan.get("unroll_br"))
    return statics, dev


def replan_chunks(tables, model, nwalkers: int,
                  budget: int = _SCOPED_VMEM_BUDGET, spec=None,
                  probe: bool | None = None):
    """Re-plan the chunking for a different ensemble size from
    already-built tables (table construction costs seconds on a 35k-line
    catalog; the sharded composition plans per-DEVICE walker counts from
    the single table build the pipeline already made). Returns a plan
    dict or None.

    Pass `spec` to enable the deviceless-Mosaic probe tier for
    candidates past the analytic line (same auto/off semantics as
    plan_fused_gather's `probe`); without it the plan is analytic-only
    — conservative, and per-device working sets shrink with sharding,
    so the 12 MiB line usually suffices on a mesh."""
    import os
    qm = model.q_model
    n_states = device_n_states(qm)
    C = int(model.n_channels)
    prober = None
    if spec is not None:
        if probe is None:
            probe = (os.environ.get("CHA1_VMEM_PROBE", "1") != "0"
                     and jax.default_backend() != "cpu")
        if probe:
            prober = _make_prober(model, spec, nwalkers)
    picked = _pick_chunks(tables, C, n_states, nwalkers, budget, prober)
    if picked is None:
        return None
    wchunk, cblock, unroll_bo, unroll_br = picked
    return dict(tables=tables, wchunk=wchunk, unroll_bo=unroll_bo,
                unroll_br=unroll_br, **_geom(tables, C, n_states, cblock))
