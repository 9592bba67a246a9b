"""On-chip isolation: is the fused gather kernel's IN-KERNEL lnprob wrong,
or the step machinery around it?

Wraps _make_gather_lnprob alone in a minimal pallas_call (no stretch-move
machinery) on the real bench-dense tables and compares against the
user-facing batched gather lnprob for the same thetas. Ablation flags
narrow the miscompiling construct:

  --no-statesum   force the analytic-Q branch out (skip, bench_dense has
                  a state-sum Q; this flag replaces q_of with ones)
  --wchunk N      override the planned walker chunk
  --cblock N      override the planned channel block (replans geometry)

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
         python tools/tpu_isolate_gather_lnprob.py [--interpret]
"""

from __future__ import annotations

import functools
import sys

import numpy as np

REPO = "/root/repo"
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax  # noqa: E402

INTERPRET = "--interpret" in sys.argv


def main():
    if INTERPRET:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tools.aot_probe_fused_gather import _bench_dense_problem
    from cha1_mcmc_tpu.inference import single_component_lnprior
    from cha1_mcmc_tpu.inference.likelihood import build_lnprob_batched
    from cha1_mcmc_tpu.sampler.fused_gather import (
        _make_gather_lnprob, gather_statics_tables, plan_fused_gather,
        _geom)

    print(f"devices: {jax.devices()}", flush=True)
    model, spec, ints, yerrs, bounds, means, stds = _bench_dense_problem()
    nwalkers = 16
    plan = plan_fused_gather(model, spec, bounds["dV"][1], nwalkers=nwalkers)
    assert plan is not None
    for flag, key in (("--wchunk", "wchunk"), ("--cblock", "cblock")):
        if flag in sys.argv:
            v = int(sys.argv[sys.argv.index(flag) + 1])
            if key == "wchunk":
                plan = dict(plan, wchunk=v)
            else:
                qm = model.q_model
                ns = 0 if qm.kind == "analytic" else int(np.size(qm.g))
                plan = dict(plan, wchunk=plan["wchunk"],
                            **_geom(plan["tables"], int(model.n_channels),
                                    ns, v))
    print({k: plan[k] for k in ("wchunk", "cblock", "n_bo", "n_br",
                                "schunk", "n_sb")}, flush=True)
    statics, dev = gather_statics_tables(model, spec, ints, yerrs, bounds,
                                         means, stds, plan)

    h = nwalkers // 2

    def kern(th_ref, *refs):
        table_refs, o_ref, scr = refs[:6], refs[6], refs[7]
        lnp = _make_gather_lnprob(*table_refs, out_scratch=scr, **statics)
        o_ref[:] = lnp(th_ref[:])

    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((h, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((h, 1), jnp.float32)],
        interpret=INTERPRET,
    )

    lnprior = single_component_lnprior(spec, bounds, means, stds)
    lnprob_ref = build_lnprob_batched(model, spec, ints, yerrs, lnprior,
                                      use_pallas=not INTERPRET,
                                      dv_max=bounds["dV"][1],
                                      interpret=INTERPRET)

    rng = np.random.default_rng(3)
    th = jnp.asarray(np.array([3.24e12, 7.5, 5.8, 0.78])
                     * (1 + 0.01 * rng.standard_normal((h, 4))), jnp.float32)
    got = np.asarray(jax.jit(lambda t: call(t, *dev))(th))[:, 0]
    want = np.asarray(lnprob_ref(th))
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-30)
    print("in-kernel :", got[:4], flush=True)
    print("reference :", want[:4], flush=True)
    print(f"max rel dev: {rel.max():.3e}  "
          f"{'OK' if rel.max() < 1e-4 else 'WRONG'}", flush=True)
    return 0 if rel.max() < 1e-4 else 1


if __name__ == "__main__":
    raise SystemExit(main())
