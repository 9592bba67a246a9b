"""Deviceless scoped-VMEM probe for the dense fused gather program.

The relay terminal-compiles heavy Mosaic programs in ~30 minutes (BENCH r4
dense section: one failed attempt held the queue 20:38 -> 21:10), so
kernel VMEM regressions must be caught locally. The axon client can't do
it: with remote compile off it AOT-compiles locally but then REJECTS the
result at its libtpu version handshake — even for compile-only use. This
probe sidesteps axon entirely with JAX's deviceless AOT path: a
`jax.experimental.topologies` compile-only v5e:1x1x1 topology built from
the *local* libtpu, inputs described as ShapeDtypeStructs sharded onto the
compile-only device, `.trace().lower().compile()` — the full Mosaic
pipeline runs, "Scoped allocation ... exceeded scoped vmem limit" errors
surface in local-compile time, and nothing ever touches the chip or the
relay (it is safe to run while another process holds the TPU).

Caveat: the local libtpu build can be newer than the relay terminal's
(observed: Jan 2026 vs Nov 2025), so treat the verdict as a strong
predictor, not a guarantee — though every time both were observed they
agreed exactly (e.g. both rejected the dense_full w64 rest-unrolled plan
at "size 17.53M"). Since 2026-08-19 the planner itself runs this compile
automatically for uncertain candidates (sampler/vmem_probe.py subprocess,
cached verdicts — see fused_gather._make_prober); this tool remains the
manual/CI probe with walk-mode and wchunk override flags.

Probes the fused channel-major step program (sampler/fused_gather.py) at
the two dense problem sizes the driver exercises:
  * bench.py's dense section (35,460-line 1-cyanonaphthalene x 2048
    channels, the SURVEY §6 stress row), and
  * the dense_full_fit datagrid (tests/golden/dense_synth.npz) — served
    by the channel-BLOCKED kernel (fori_loop walks; the pre-blocking
    kernel's whole-width overflow scatter could not fit scoped VMEM).

Usage (no TPU needed, CPU platform):
  PYTHONPATH=/root/repo python tools/aot_probe_fused_gather.py

Experiment flags (both optional):
  --unroll N   force BOTH channel-walk regions unrolled (N=1) or fori
               (N=0), overriding the plan's unroll_bo/unroll_br —
               answers "does this walk mode fit the scoped stack?"
               without a relay compile. (The 2026-08-19 on-chip ablation
               settled the default: the unrolled accumulator walk is
               2-4x faster per eval and compiles at the bench-dense
               geometry, so the planner now prefers it up to
               _UNROLL_BLOCKS blocks per region, falling back to fori
               when the seam charge would blow the budget.)
  --wchunk N   override the planned walker chunk.
  --bench-only / --full-only   probe a single problem.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402


def _bench_dense_problem():
    """The exact problem bench.py's dense section builds (bench.py
    bench_dense), so a PASS here predicts the driver's compile."""
    from cha1_mcmc_tpu.catalogs import load_catalog
    from cha1_mcmc_tpu.inference import ParamSpec
    from cha1_mcmc_tpu.models.forward import SpectralModel

    cat_path = "/root/reference/catalog/1-cyanonapthalene.cat"
    channels = 2048
    catalog = load_catalog(cat_path)
    lo, hi = float(catalog.frequency.min()), float(catalog.frequency.max())
    ll, ul = lo - 1.0, hi + 1.0
    grid_freq = np.linspace(lo, hi, channels)
    i, i2 = catalog.trim_indices(ll, ul)
    covered = np.arange(i2 - i)
    center = 5.8
    model = SpectralModel.build(
        catalog, covered, grid_freq, ll=ll, ul=ul, dish_size=100.0,
        vel_offset=center, mask_center=center)
    spec = ParamSpec(ncomp=1, fixed_source_size=52.0)
    bounds = {"Ncol": (1e8, 1e14), "Tex": (3.5, 12.0),
              "vlsr": (4.0, 7.5), "dV": (0.4, 1.5)}
    # Attach the device Chebyshev Q surrogate exactly as bench.py and
    # the fit pipeline do, so the probed program is the one they run.
    import dataclasses as _dc
    from cha1_mcmc_tpu.catalogs.partition import fit_device_cheb
    model = _dc.replace(model, q_model=fit_device_cheb(
        model.q_model, *bounds["Tex"]))
    prior_means = np.array([3.4e10, 8.0, center, 0.7575])
    prior_stds = np.array([0.34e10, 3.0, 0.06, 0.22])
    rng = np.random.default_rng(2)
    ints = rng.standard_normal(channels).astype(np.float32) * 1e-3
    yerrs = np.full(channels, 1e-3, np.float32)
    return model, spec, ints, yerrs, bounds, prior_means, prior_stds


def _dense_full_fit_problem():
    from tools.dense_full_fit import GOLDEN_PATH, _golden_config

    if not os.path.exists(GOLDEN_PATH):
        return None
    from cha1_mcmc_tpu.pipeline.fit import SpectralFit
    from cha1_mcmc_tpu.reduce.datagrid import Datagrid

    cfg, g = _golden_config(64, 128)
    grid = Datagrid(freqs=np.asarray(g["freqs"], dtype=np.float64),
                    ints=np.asarray(g["ints"], dtype=np.float64),
                    yerrs=np.asarray(g["yerrs"], dtype=np.float64),
                    covered_trans=np.asarray(g["covered_trans"], dtype=int))
    fit = SpectralFit(cfg)
    model = fit.build_model(grid)
    means = np.asarray(cfg.template_means, dtype=np.float64)
    stds = np.asarray(cfg.template_stds, dtype=np.float64)
    return (model, fit.spec, grid.ints, grid.yerrs, cfg.bounds, means, stds)


def _tpu_sharding():
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    topo = topologies.get_topology_desc(
        platform="tpu", topology_name="v5e:1x1x1",
        chips_per_host_bounds=(1, 1, 1), num_slices=1)
    mesh = Mesh(np.array(topo.devices), ("x",))
    return NamedSharding(mesh, PartitionSpec())


def probe(name, problem, sharding, nwalkers=128, nsteps=(2, 64),
          unroll=None, wchunk=None):
    """Compile at each nsteps in order — the scoped-VMEM watermark is set
    inside one half-update, so a small-k program (minutes) gives the
    verdict before the full k=16 program (the better part of an hour)
    confirms it."""
    from cha1_mcmc_tpu.sampler.fused_gather import (
        make_fused_ensemble_gather, plan_fused_gather, _vmem_estimate)

    model, spec, ints, yerrs, bounds, means, stds = problem
    plan = plan_fused_gather(model, spec, bounds["dV"][1], nwalkers=nwalkers)
    if plan is None:
        print(f"[{name}] plan=None (fused kernel not selected; general "
              f"gather chain would run) — nothing to compile")
        return True
    if wchunk is not None:
        plan = dict(plan, wchunk=int(wchunk))
    if unroll is not None:   # experiment: force both walks unrolled/fori
        force = bool(int(unroll))
        plan = dict(plan, unroll_bo=force, unroll_br=force)
        print(f"[{name}] EXPERIMENT: unroll_bo=unroll_br={force} "
              f"wchunk={plan['wchunk']} (plan geometry unchanged)")
    tables = plan["tables"]
    qm = model.q_model
    from cha1_mcmc_tpu.catalogs.partition import device_n_states
    n_states = device_n_states(qm)
    est = _vmem_estimate(tables, int(model.n_channels), n_states,
                         plan["wchunk"], nwalkers, plan["cblock"],
                         plan.get("unroll_bo"), plan.get("unroll_br"))
    print(f"[{name}] L={model.n_lines} C={model.n_channels} "
          f"n_elems={tables['n_elems']} wchunk={plan['wchunk']} "
          f"cblock={plan['cblock']} (overflow x{plan['n_bo']}"
          f"{' unrolled' if plan.get('unroll_bo') else ' fori'}, rest x"
          f"{plan['n_br']}{' unrolled' if plan.get('unroll_br') else ' fori'}"
          f") schunk={plan['schunk']}x{plan['n_sb']} "
          f"estimate={est / 2**20:.1f} MiB")

    run = make_fused_ensemble_gather(
        model, spec, ints, yerrs, bounds, means, stds,
        dv_max=bounds["dV"][1], nwalkers=nwalkers, plan=plan)
    pos0 = jax.ShapeDtypeStruct((nwalkers, spec.ndim), np.float32,
                                sharding=sharding)
    lnp0 = jax.ShapeDtypeStruct((nwalkers,), np.float32, sharding=sharding)
    key = jax.ShapeDtypeStruct((2,), np.uint32, sharding=sharding)
    for n in (nsteps if isinstance(nsteps, tuple) else (nsteps,)):
        t0 = time.perf_counter()
        try:
            lowered = run.trace(pos0, lnp0, key, nsteps=n).lower()
            compiled = lowered.compile()
            dt = time.perf_counter() - t0
        except Exception as exc:
            print(f"[{name}] nsteps={n} COMPILE FAILED after "
                  f"{time.perf_counter() - t0:.0f}s: {exc}", flush=True)
            return False
        mem = ""
        try:
            ma = compiled.memory_analysis()
            mem = (f"  (argument {ma.argument_size_in_bytes / 2**20:.1f} "
                   f"MiB, temp {ma.temp_size_in_bytes / 2**20:.1f} MiB)")
        except Exception:
            pass
        print(f"[{name}] nsteps={n} COMPILED OK in {dt:.0f}s{mem}",
              flush=True)
    return True


def main():
    if os.environ.get("PALLAS_AXON_REMOTE_COMPILE"):
        raise SystemExit("unset PALLAS_AXON_REMOTE_COMPILE: this probe must "
                         "compile against the local libtpu, not the relay")
    ap = argparse.ArgumentParser()
    ap.add_argument("--unroll", type=int, default=None)
    ap.add_argument("--wchunk", type=int, default=None)
    ap.add_argument("--bench-only", action="store_true")
    ap.add_argument("--full-only", action="store_true")
    args = ap.parse_args()
    jax.config.update("jax_platforms", "cpu")  # before any backend init
    sharding = _tpu_sharding()
    print(f"compile-only topology: {sharding.mesh.devices}")
    ok = True
    if not args.full_only:
        ok = probe("bench_dense", _bench_dense_problem(), sharding,
                   unroll=args.unroll, wchunk=args.wchunk)
    if not args.bench_only:
        p2 = _dense_full_fit_problem()
        if p2 is not None:
            ok = probe("dense_full_fit", p2, sharding,
                       unroll=args.unroll, wchunk=args.wchunk) and ok
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
