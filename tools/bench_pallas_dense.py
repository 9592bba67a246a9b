"""Measure the dense-catalog opacity kernel variants on the real TPU.

Stress case from SURVEY §6: the 35,460-transition 1-cyanonaphthalene
catalog (reference catalog/1-cyanonapthalene.cat) against a 2048-channel
grid at 128 walkers — the HBM-bandwidth headline. Compares:

  jnp       — pure-jnp einsum path (what XLA does unaided)
  pallas    — block-sparse Pallas kernel, current unrolled-VPU reduction
  pallas_mxu— same kernel with the line contraction as one batched
              dot_general on the MXU

Timing rules for this image (CLAUDE.md): identical (executable, inputs)
calls can be served from a result cache, so each rep feeds the previous
output back into the inputs via a lax.scan data dependence.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_pallas_dense.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

REFERENCE_ROOT = "/root/reference"
W, C = 128, 2048
DV_MAX = 1.5
NEVALS = 30


def build_problem():
    from cha1_mcmc_tpu.catalogs import load_catalog
    from cha1_mcmc_tpu.constants import CKM

    cat = load_catalog(os.path.join(REFERENCE_ROOT, "catalog",
                                    "1-cyanonapthalene.cat"))
    line_freq = np.asarray(cat.frequency, np.float64)
    L = line_freq.size
    lo, hi = line_freq.min(), line_freq.max()
    grid_freq = np.linspace(lo, hi, C)
    vel_grid = (line_freq[:, None] - grid_freq[None, :]) / line_freq[:, None] * CKM + 5.8

    rng = np.random.default_rng(0)
    taus = 10.0 ** rng.uniform(-6, -2, (W, L)).astype(np.float32)
    vlsr = (5.8 + 0.02 * rng.standard_normal(W)).astype(np.float32)
    dV = rng.uniform(0.5, 1.2, W).astype(np.float32)
    return (jnp.asarray(taus, jnp.float32), jnp.asarray(vlsr, jnp.float32),
            jnp.asarray(dV, jnp.float32), jnp.asarray(vel_grid, jnp.float32), L)


def time_fn(fn, taus, vlsr, dV, vel_grid, label, *tables):
    """Scan NEVALS evals with a data dependence so no rep is cache-served.
    vel_grid (the ~300 MB array) and the kernels' static tables are jit
    *arguments* — closing over them would embed them as HLO constants and
    blow the compile relay's request limit."""

    @jax.jit
    def run(taus, vlsr, dV, vel_grid, *tables):
        def body(carry, _):
            out = fn(taus * (1.0 + 1e-6 * carry), vlsr, dV, vel_grid, *tables)
            return jnp.float32(jnp.mean(out)), ()

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=NEVALS)
        return carry

    r = run(taus, vlsr, dV, vel_grid, *tables)
    jax.block_until_ready(r)  # compile + warm
    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        r = run(taus * (1.0 + 1e-9 * rep), vlsr, dV, vel_grid, *tables)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / NEVALS)
    print(f"{label:12s} {best*1e3:8.2f} ms/eval")
    return best


def main():
    from cha1_mcmc_tpu.constants import FWHM_TO_SIGMA_MODEL, VELOCITY_WINDOW_DV
    from cha1_mcmc_tpu.models import pallas_kernels as pk

    taus, vlsr, dV, vel_grid, L = build_problem()
    center = 5.8
    block_mask = pk.block_activity_mask(np.asarray(vel_grid), center, DV_MAX)
    print(f"L={L} C={C} W={W}  block density "
          f"{block_mask.mean():.3f}  device={jax.devices()[0]}")

    block_mask_j = jnp.asarray(block_mask)

    def jnp_path(taus, vlsr, dV, vg):
        sigma = (dV / FWHM_TO_SIGMA_MODEL)[:, None, None]
        window = jnp.abs(vg - center) < VELOCITY_WINDOW_DV * dV[:, None, None]
        z = (vg - vlsr[:, None, None]) / sigma
        gauss = jnp.where(window, jnp.exp(-0.5 * z * z), 0.0)
        return jnp.einsum("wl,wlc->wc", taus, gauss)

    def pallas(t, v, d, vg):
        return pk.opacity_pallas(t, v, d, vg, block_mask_j, mask_center=center)

    def mxu(t, v, d, vg):
        return pk.opacity_pallas_mxu(t, v, d, vg, block_mask_j,
                                     mask_center=center)

    def fused(t, v, d, vg):
        return pk.opacity_pallas_fused(t, v, d, vg, block_mask_j,
                                       mask_center=center)

    results = {}
    results["pallas"] = time_fn(pallas, taus, vlsr, dV, vel_grid, "pallas")
    results["pallas_mxu"] = time_fn(mxu, taus, vlsr, dV, vel_grid, "pallas_mxu")
    results["pallas_fused"] = time_fn(fused, taus, vlsr, dV, vel_grid,
                                      "pallas_fused")
    a = np.asarray(pallas(taus, vlsr, dV, vel_grid))
    for name, fn in (("mxu", mxu), ("fused", fused)):
        b = np.asarray(fn(taus, vlsr, dV, vel_grid))
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-30)
        print(f"{name} vs pallas max rel err: {err:.2e}")

    # tile sweep for the MXU variant: tighter line tiles track the diagonal
    # band of the (line, channel) activity pattern more closely
    for tiles in [(8, 128, 256), (8, 128, 128), (16, 128, 256),
                  (16, 128, 512), (32, 128, 128), (16, 256, 256)]:
        tw, tc, tl = tiles
        bm = jnp.asarray(pk.block_activity_mask(
            np.asarray(vel_grid), center, DV_MAX, tl=tl, tc=tc))
        dens = float(np.asarray(bm).mean())

        def mxu_t(t, v, d, vg, bm=bm, tiles=tiles):
            return pk.opacity_pallas_mxu(t, v, d, vg, bm, mask_center=center,
                                         tiles=tiles)

        key = f"mxu{tiles}"
        results[key] = time_fn(mxu_t, taus, vlsr, dV, vel_grid,
                               f"{key} d={dens:.3f}")
    # compacted (CSR) kernel: static gather tables, per-eval tau gather
    for tw, tlc in [(8, 128), (16, 128), (32, 128), (16, 256)]:
        lt, vc, cnt = pk.build_opacity_csr(np.asarray(vel_grid), center,
                                           DV_MAX, tc=128, tl=tlc)
        lt_j, vc_j = jnp.asarray(lt), jnp.asarray(vc, jnp.float32)
        cnt_j = jnp.asarray(cnt)

        def csr(t, v, d, vg, lt, vc, cnt, tiles=(tw, tlc)):
            return pk.opacity_pallas_csr(t, v, d, lt, vc, cnt,
                                         mask_center=center, n_channels=C,
                                         tiles=tiles)

        def csr_unmasked(t, v, d, vg, lt, vc, cnt, tiles=(tw, tlc)):
            return pk.opacity_pallas_csr(t, v, d, lt, vc, cnt,
                                         mask_center=center, n_channels=C,
                                         tiles=tiles, unmasked=True)

        key = f"csr({tw},{tlc})"
        results[key] = time_fn(csr, taus, vlsr, dV, vel_grid,
                               f"{key} K={lt.shape[1]}", lt_j, vc_j, cnt_j)
        results[key + "u"] = time_fn(csr_unmasked, taus, vlsr, dV, vel_grid,
                                     f"{key} unmasked", lt_j, vc_j, cnt_j)
        b = np.asarray(csr(taus, vlsr, dV, vel_grid, lt_j, vc_j, cnt_j))
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-30)
        print(f"  {key} vs pallas max rel err: {err:.2e}")
    results["jnp"] = time_fn(jnp_path, taus, vlsr, dV, vel_grid, "jnp")
    print({k: round(v * 1e3, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
