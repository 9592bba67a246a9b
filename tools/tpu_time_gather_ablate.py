"""On-chip timing bisect for the dense fused gather kernel.

Round-4 context: the trajectory validator measured the fused whole-chain
kernel at ~90 ms/step and the general chain at ~4 ms/step in the same
window, while the 2026-08-18 bench capture had the general chain at
123 us/step — and a first ablation pass accidentally hit the runtime's
identical-call result cache (CLAUDE.md "Microbenchmark trap") and
produced impossible numbers (a 10 us/step chain over an 86 us lnprob).
This pass uses bench.py's exact methodology everywhere: two run lengths,
inputs varied per rep by a fold/tag, MIN of reps per length (contention
only adds time), slope = (t2-t1)/(n2-n1).

Sections, one process, one TPU session:
  1. general dense chain (64 vs 256 steps)
  2. fused whole-chain gather kernel (64 vs 256 steps)
  3. batched split-gather lnprob (scan of 30 vs 120 evals)
  4. isolated in-kernel lnprob (pallas_call) + ablations: analytic-Q
     swap, cblock 512/2048, wchunk 8/64, fully-unrolled channel walk

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
         timeout 4500 python tools/tpu_time_gather_ablate.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REPO = "/root/repo"
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def slope_time(run, n1, n2, reps=3):
    """bench.py _slope_timed: run(n, tag) -> value to block on; inputs
    must differ per tag (defeats identical-call result caching); min of
    reps per length; returns seconds per unit."""
    jax.block_until_ready(run(n1, 0))   # compile + warm both lengths
    jax.block_until_ready(run(n2, 0))
    t1 = t2 = float("inf")
    for rep in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(n1, 2 * rep + 1))
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(run(n2, 2 * rep + 2))
        t2 = min(t2, time.perf_counter() - t0)
    return (t2 - t1) / (n2 - n1)


def main():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tools.aot_probe_fused_gather import _bench_dense_problem
    from cha1_mcmc_tpu.inference import single_component_lnprior
    from cha1_mcmc_tpu.inference.likelihood import build_lnprob_batched
    from cha1_mcmc_tpu.sampler import run_ensemble
    import cha1_mcmc_tpu.sampler.fused_gather as fg

    out = {"device": str(jax.devices()[0])}
    print(f"devices: {jax.devices()}", flush=True)
    model, spec, ints, yerrs, bounds, means, stds = _bench_dense_problem()
    nwalkers = 128
    h = nwalkers // 2
    lnprior = single_component_lnprior(spec, bounds, means, stds)
    lnprob_ref = build_lnprob_batched(model, spec, ints, yerrs, lnprior,
                                      use_pallas=True,
                                      dv_max=bounds["dV"][1])
    rng = np.random.default_rng(3)
    pos0 = jnp.asarray(np.array([3.24e12, 7.5, 5.8, 0.78])
                       * (1 + 0.01 * rng.standard_normal((nwalkers, 4))),
                       jnp.float32)
    th_h = pos0[:h]

    # --- 1. general chain ---------------------------------------------
    lnp0 = lnprob_ref(pos0)
    key = jax.random.PRNGKey(12)
    chain, _, _, (gpos, glnp) = run_ensemble(
        lnprob_ref, pos0, lnp0, key, nsteps=64, batched=True)
    jax.block_until_ready(chain)
    glnp = jnp.asarray(glnp)

    s = slope_time(
        lambda n, tag: run_ensemble(lnprob_ref, gpos, glnp,
                                    jax.random.fold_in(key, tag),
                                    nsteps=n, batched=True)[0], 64, 256)
    out["general_chain_us_per_step"] = round(s * 1e6, 2)
    print(f"general chain: {s * 1e6:.1f} us/step", flush=True)

    # --- 2. fused whole-chain kernel ------------------------------------
    base_plan = fg.plan_fused_gather(model, spec, bounds["dV"][1],
                                     nwalkers=nwalkers)
    assert base_plan is not None
    out["plan"] = {k: int(base_plan[k]) for k in
                   ("wchunk", "cblock", "n_bo", "n_br", "schunk", "n_sb")}
    run_fused = fg.make_fused_ensemble_gather(
        model, spec, ints, yerrs, bounds, means, stds,
        dv_max=bounds["dV"][1], nwalkers=nwalkers, plan=base_plan)
    fchain, _, _, (fpos, flnp) = run_fused(pos0, lnp0, key, 64)
    jax.block_until_ready(fchain)
    flnp = jnp.asarray(flnp)
    s = slope_time(
        lambda n, tag: run_fused(fpos, flnp, jax.random.fold_in(key, tag),
                                 n)[0], 64, 256)
    out["fused_chain_us_per_step"] = round(s * 1e6, 2)
    print(f"fused whole-chain: {s * 1e6:.1f} us/step", flush=True)

    # --- 2a. fused whole-chain at wchunk=64 (one chunk per half) --------
    # With the Chebyshev Q surrogate the isolated-lnprob ablation ranked
    # wchunk=64 ~10x faster than 32 (kern_w64 0.002 vs kern_base 0.022
    # ms/eval, 2026-08-19): Q's per-chunk serialization is gone, so the
    # remaining per-chunk overhead dominates and ONE chunk per half wins.
    # The w64 chain program models OVER the 12 MiB planning budget
    # (14.98 MiB fori / 16.98 rest-unrolled), so this section is the
    # measured-evidence probe for relaxing the plan — it must never run
    # by default without a deviceless compile check first
    # (tools/aot_probe_fused_gather.py --wchunk 64).
    if "--chain-w64" in sys.argv:
        for tag_w, ubo, ubr in (("w64_fori", False, False),
                                ("w64_ur", False, True)):
            try:
                plan_w = dict(base_plan, wchunk=64,
                              unroll_bo=ubo, unroll_br=ubr)
                run_w = fg.make_fused_ensemble_gather(
                    model, spec, ints, yerrs, bounds, means, stds,
                    dv_max=bounds["dV"][1], nwalkers=nwalkers, plan=plan_w)
                fchain_w, _, _, (fpos_w, flnp_w) = run_w(pos0, lnp0, key, 64)
                jax.block_until_ready(fchain_w)
                flnp_w = jnp.asarray(flnp_w)
                s = slope_time(
                    lambda n, tag: run_w(fpos_w, flnp_w,
                                         jax.random.fold_in(key, tag),
                                         n)[0], 64, 256)
                out[f"fused_chain_{tag_w}_us_per_step"] = round(s * 1e6, 2)
                print(f"fused whole-chain ({tag_w}): {s * 1e6:.1f} us/step",
                      flush=True)
            except Exception as exc:  # noqa: BLE001 - record and continue
                out[f"fused_chain_{tag_w}_error"] = (
                    f"{type(exc).__name__}: {exc}")
                print(f"fused {tag_w} chain: FAILED {exc}", flush=True)

    # --- 2b. fused whole-chain, forced-fori channel walk ----------------
    # The 2026-08-19 ablation settled the default: the unrolled
    # accumulator walk measured 43.8 us/step whole-chain vs 68.3 fori and
    # compiles on-chip (it does NOT pin the scoped stack — only the (n,1)
    # partial survives each block's add), so the planner now prefers it
    # (plan keys unroll_bo/unroll_br). This section times the fori walk
    # for comparison by forcing both flags off.
    if "--no-fori-chain" not in sys.argv:
        try:
            plan_f = dict(base_plan, unroll_bo=False, unroll_br=False)
            run_fu = fg.make_fused_ensemble_gather(
                model, spec, ints, yerrs, bounds, means, stds,
                dv_max=bounds["dV"][1], nwalkers=nwalkers, plan=plan_f)
            fchain_u, _, _, (fpos_u, flnp_u) = run_fu(pos0, lnp0, key, 64)
            jax.block_until_ready(fchain_u)
            flnp_u = jnp.asarray(flnp_u)
            s = slope_time(
                lambda n, tag: run_fu(fpos_u, flnp_u,
                                      jax.random.fold_in(key, tag), n)[0],
                64, 256)
            out["fused_chain_fori_us_per_step"] = round(s * 1e6, 2)
            print(f"fused whole-chain (forced fori walk): {s * 1e6:.1f} "
                  f"us/step", flush=True)
        except Exception as exc:  # noqa: BLE001 - record and continue
            out["fused_chain_fori_error"] = f"{type(exc).__name__}: {exc}"
            print(f"fused fori chain: FAILED {exc}", flush=True)

    # --- 3. batched lnprob alone (scan, tag-varied) ---------------------
    def scan_run(fn, th):
        def go(th, n):
            def body(c, _):
                lnp = fn(th * (1.0 + 1e-6 * jnp.sin(c)))
                return jnp.float32(jnp.mean(lnp)), ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return c

        go_j = jax.jit(go, static_argnames="n")
        return lambda n, tag: go_j(th * (1.0 + 1e-9 * tag), n)

    s = slope_time(scan_run(lnprob_ref, pos0), 30, 120)
    out["batched_lnprob_ms_per_eval"] = round(s * 1e3, 4)
    print(f"batched split-gather lnprob: {s * 1e3:.3f} ms/eval (128 w)",
          flush=True)

    # --- 4. isolated in-kernel lnprob + ablations -----------------------
    def kernel_lnprob(plan, q_ones=False):
        statics, dev = fg.gather_statics_tables(
            model, spec, ints, yerrs, bounds, means, stds, plan)
        if q_ones:  # ablation: kill the state-sum walk, keep all else
            statics = dict(statics, q_kind="poly", q_coeffs=(1.0,),
                           q_power=None, q_scale=1.0)

        def kern(th_ref, *refs):
            table_refs, o_ref, scr = refs[:6], refs[6], refs[7]
            lnp = fg._make_gather_lnprob(*table_refs, out_scratch=scr,
                                         **statics)
            o_ref[:] = lnp(th_ref[:])

        call = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((h, 1), jnp.float32),
            scratch_shapes=[pltpu.VMEM((h, 1), jnp.float32)])
        return lambda th: call(th, *dev)[:, 0]

    qm = model.q_model
    from cha1_mcmc_tpu.catalogs.partition import device_n_states
    n_states = device_n_states(qm)
    C = int(model.n_channels)

    def variant(tag, plan, **kw):
        try:
            fn = kernel_lnprob(plan, **kw)
            s = slope_time(scan_run(fn, th_h), 30, 120)
            out[tag] = round(s * 1e3, 4)
            print(f"{tag}: {s * 1e3:.3f} ms/eval (h={h}, "
                  f"wchunk={plan['wchunk']}, cblock={plan['cblock']})",
                  flush=True)
        except Exception as exc:  # noqa: BLE001 - record and continue
            out[tag + "_error"] = f"{type(exc).__name__}: {exc}"
            print(f"{tag}: FAILED {type(exc).__name__}: {exc}", flush=True)

    def replan(cblock=None, wchunk=None):
        p = dict(base_plan)
        if cblock is not None:
            p = dict(p, **fg._geom(p["tables"], C, n_states, cblock))
        if wchunk is not None:
            p = dict(p, wchunk=wchunk)
        return p

    variant("kern_base_ms", base_plan)                     # planned geometry
    variant("kern_qones_ms", base_plan, q_ones=True)       # no state-sum
    variant("kern_cb512_ms", replan(cblock=512))
    variant("kern_cb2048_ms", replan(cblock=2048, wchunk=8))
    variant("kern_w8_ms", replan(wchunk=8))
    variant("kern_w64_ms", replan(wchunk=64))
    # forced fori channel walk (the pre-2026-08-19 default)
    fori_plan = dict(base_plan, unroll_bo=False, unroll_br=False)
    variant("kern_fori_ms", fori_plan)
    variant("kern_fori_qones_ms", fori_plan, q_ones=True)

    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
