"""Deviceless scoped-VMEM verdict for ONE fused-gather plan (subprocess).

The analytic working-set model (fused_gather._vmem_estimate) cannot order
all geometries correctly against Mosaic's real allocator: on 2026-08-19 a
dense_full plan modeled at 15.2 MiB failed its v5e terminal compile at
"Scoped allocation with size 17.53M", while a bench-dense plan modeled at
29.0 MiB compiled fine — the model's error changes SIGN with geometry.
The ground truth is the Mosaic pipeline itself, and it runs locally in
compile-only mode: a `jax.experimental.topologies` v5e:1x1x1 topology
built from the *local* libtpu compiles the full kernel in seconds-to-
minutes with no chip and no relay (the same escape hatch
tools/aot_probe_fused_gather.py documents — including its caveat that the
local libtpu can be newer than the relay terminal's; observed so far the
two agree exactly, e.g. both rejected the plan above at 17.53M).

This module is the subprocess half of fused_gather._probe_verdict: the
planner pickles (model, spec, plan, nwalkers) to a temp file and runs
`python -m cha1_mcmc_tpu.sampler.vmem_probe <file>` in a clean CPU
process (the parent may hold the real TPU — deviceless compilation never
touches the chip, so the two coexist). Only SHAPES matter for the
verdict, so data arrays (spectrum, priors, bounds) are synthesized here.

Exit codes: 0 = compiled (plan fits the scoped-VMEM stack), 1 = scoped
VMEM / RESOURCE_EXHAUSTED failure, 3 = infrastructure error (no verdict).
"""

from __future__ import annotations

import os
import pickle
import sys


def main(path: str) -> int:
    # Compile against the LOCAL libtpu: remote-compile mode would queue
    # through the TPU relay (~30 min per heavy Mosaic program) and the
    # axon platform must not initialize at all in this process.
    os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    import jax

    # Before any backend init (sitecustomize pre-imports jax but does not
    # initialize a backend; this is the only ordering that sticks).
    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    topo = topologies.get_topology_desc(
        platform="tpu", topology_name="v5e:1x1x1",
        chips_per_host_bounds=(1, 1, 1), num_slices=1)
    sharding = NamedSharding(Mesh(np.array(topo.devices), ("x",)),
                             PartitionSpec())

    with open(path, "rb") as f:
        payload = pickle.load(f)
    model = payload["model"]
    spec = payload["spec"]
    plan = payload["plan"]
    nwalkers = int(payload["nwalkers"])

    from cha1_mcmc_tpu.sampler.fused_gather import make_fused_ensemble_gather

    # Values are compile-time irrelevant — synthesize well-formed ones.
    C = int(model.n_channels)
    dt = np.dtype(model.dtype)
    ints = np.zeros(C, dt)
    yerrs = np.ones(C, dt)
    names = (["Ncol", "Tex", "vlsr", "dV"]
             if spec.fixed_source_size is not None
             else ["source_size", "Ncol", "Tex", "vlsr", "dV"])
    bounds = {k: (0.1, 1.0) for k in names}
    means = np.ones(spec.ndim)
    stds = np.ones(spec.ndim)

    run = make_fused_ensemble_gather(
        model, spec, ints, yerrs, bounds, means, stds,
        dv_max=1.0, nwalkers=nwalkers, plan=plan)
    pos0 = jax.ShapeDtypeStruct((nwalkers, spec.ndim), dt, sharding=sharding)
    lnp0 = jax.ShapeDtypeStruct((nwalkers,), dt, sharding=sharding)
    key = jax.ShapeDtypeStruct((2,), np.uint32, sharding=sharding)
    try:
        # The scoped-VMEM watermark is set inside one half-update, so the
        # smallest chain program (nsteps=2) already gives the verdict.
        run.trace(pos0, lnp0, key, nsteps=2).lower().compile()
    except Exception as exc:  # noqa: BLE001 - classify, don't crash
        msg = f"{type(exc).__name__}: {exc}"
        low = msg.lower()
        if "scoped vmem" in low or "resource_exhausted" in low:
            print(f"VMEM_PROBE_FAIL {msg[:400]}", flush=True)
            return 1
        print(f"VMEM_PROBE_ERROR {msg[:400]}", flush=True)
        return 3
    print("VMEM_PROBE_OK", flush=True)
    return 0


if __name__ == "__main__":
    if len(sys.argv) != 2:
        print("usage: python -m cha1_mcmc_tpu.sampler.vmem_probe "
              "<payload.pkl>", file=sys.stderr)
        raise SystemExit(3)
    try:
        raise SystemExit(main(sys.argv[1]))
    except SystemExit:
        raise
    except Exception as exc:  # noqa: BLE001
        print(f"VMEM_PROBE_ERROR {type(exc).__name__}: {exc}", flush=True)
        raise SystemExit(3)
