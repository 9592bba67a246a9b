"""On-chip micro-probe: which Mosaic constructs miscompile on this stack?

Written mid-debug when the dense fused gather kernel
(sampler/fused_gather.py) — interpret-mode exact — appeared to
terminal-compile to a program with wrong trajectories and a ~25-30x
slowdown under BOTH table layouts. RESOLUTION (2026-08-19): only the
lane-axis pl.ds layout was genuinely miscompiled (divergence from step
0, lnp rel dev 16.5); the sublane-axis row-band layout's "failure" was
the validation gate itself — bitwise-vs-batched-general is unachievable
for a reassociated reduction, and sum-of-reps timing counted the
first-call terminal compile (see tools/tpu_validate_fused_gather.py and
BASELINE.md "On-chip validation (2026-08-19)"). Kept as a reusable
diagnostic: it exercises the construct suspects one at a time as tiny
Pallas programs (each compiles in ~seconds through the relay, so a
bisect costs minutes, not the ~30-minute terminal compile of the full
kernel):

  A. fori_loop accumulating x[pl.ds(i*8, 8), :] row bands (aligned size)
  B. same with pl.multiple_of hint on the offset
  C. same but UNALIGNED band size (50 rows at stride 56 — the kernel's
     5*M1 line-constant planes)
  D. static python-unrolled slices (control — the fused.py discipline)
  E. fori band load + per-plane value sub-slicing (lines_b[i*M:(i+1)*M])
  F. scratch-ref chunk store + re-read (out_scratch[w0:w1] = ...)

Run:  PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
          python tools/mosaic_construct_probe.py
Also runs in interpret mode anywhere (--interpret) as a sanity check.
"""

from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = "--interpret" in sys.argv
NB = 6          # bands
ROWS = 8        # aligned band rows
C = 128


def run(name, kernel, x, expect, out_shape=None, scratch=None):
    out_shape = out_shape or jax.ShapeDtypeStruct((8, C), jnp.float32)
    kw = dict(out_shape=out_shape, interpret=INTERPRET)
    if scratch is not None:
        kw["scratch_shapes"] = scratch
    got = np.asarray(pl.pallas_call(kernel, **kw)(x))
    ok = np.allclose(got, expect, rtol=1e-4, atol=1e-4)
    dev = float(np.max(np.abs(got - expect))) if not ok else 0.0
    print(f"[{name}] {'OK' if ok else f'WRONG max|dev|={dev:.3g}'}",
          flush=True)
    return ok


def main():
    if INTERPRET:  # before any backend init (sitecustomize forces axon)
        jax.config.update("jax_platforms", "cpu")
    print(f"devices: {jax.devices()}  interpret={INTERPRET}", flush=True)
    rng = np.random.default_rng(0)

    # A/B/D: aligned bands ------------------------------------------------
    xa = jnp.asarray(rng.standard_normal((NB * ROWS, C)), jnp.float32)
    expect_a = np.asarray(xa).reshape(NB, ROWS, C).sum(axis=0)

    def kern_a(x_ref, o_ref):
        def body(i, acc):
            return acc + x_ref[pl.ds(i * ROWS, ROWS), :]
        o_ref[:] = jax.lax.fori_loop(0, NB, body,
                                     jnp.zeros((ROWS, C), jnp.float32))

    def kern_b(x_ref, o_ref):
        def body(i, acc):
            r0 = pl.multiple_of(i * ROWS, 8)
            return acc + x_ref[pl.ds(r0, ROWS), :]
        o_ref[:] = jax.lax.fori_loop(0, NB, body,
                                     jnp.zeros((ROWS, C), jnp.float32))

    def kern_d(x_ref, o_ref):
        acc = jnp.zeros((ROWS, C), jnp.float32)
        for i in range(NB):
            acc = acc + x_ref[i * ROWS:(i + 1) * ROWS, :]
        o_ref[:] = acc

    run("A fori+pl.ds aligned", kern_a, xa, expect_a)
    run("B fori+pl.ds+multiple_of", kern_b, xa, expect_a)
    run("D static unroll (control)", kern_d, xa, expect_a)

    # C/E: unaligned band size (the kernel's 5*M1=50-row planes @ stride 56)
    M, R = 10, 56                       # 5*M=50 rows padded to 56
    xc = jnp.asarray(rng.standard_normal((NB * R, C)), jnp.float32)

    def kern_c(x_ref, o_ref):
        def body(i, acc):
            band = x_ref[pl.ds(i * R, 5 * M), :]          # (50, C)
            return acc + sum(band[j * M:(j + 1) * M, :] for j in range(5))
        o_ref[:] = jax.lax.fori_loop(0, NB, body,
                                     jnp.zeros((M, C), jnp.float32))

    xe = np.asarray(xc).reshape(NB, R, C)
    expect_c = xe[:, :50].reshape(NB, 5, M, C).sum(axis=(0, 1))
    run("C fori+pl.ds unaligned 50@56 + value subslice", kern_c, xc,
        expect_c, out_shape=jax.ShapeDtypeStruct((M, C), jnp.float32))

    def kern_e(x_ref, o_ref):
        acc = jnp.zeros((M, C), jnp.float32)
        for i in range(NB):                               # static offsets
            band = x_ref[i * R:i * R + 5 * M, :]
            acc = acc + sum(band[j * M:(j + 1) * M, :] for j in range(5))
        o_ref[:] = acc

    run("E static unaligned 50@56 (control)", kern_e, xc, expect_c,
        out_shape=jax.ShapeDtypeStruct((M, C), jnp.float32))

    # F: scratch chunk store + re-read ------------------------------------
    n = 32
    xf = jnp.asarray(rng.standard_normal((n, C)), jnp.float32)

    def kern_f(x_ref, o_ref, scr):
        for w0 in range(0, n, 8):
            scr[w0:w0 + 8, :] = x_ref[w0:w0 + 8, :] * 2.0
        o_ref[:] = scr[0:n, :]

    run("F scratch chunk store/reload", kern_f, xf, np.asarray(xf) * 2.0,
        out_shape=jax.ShapeDtypeStruct((n, C), jnp.float32),
        scratch=[pltpu.VMEM((n, C), jnp.float32)])

    # G: fori + pl.ds band read FED THROUGH exp/where (VPU chain) ---------
    def kern_g(x_ref, o_ref):
        def body(i, acc):
            band = x_ref[pl.ds(i * ROWS, ROWS), :]
            return acc + jnp.where(band > 0, jnp.exp2(-band * band), 0.0)
        o_ref[:] = jax.lax.fori_loop(0, NB, body,
                                     jnp.zeros((ROWS, C), jnp.float32))

    xg = np.asarray(xa).reshape(NB, ROWS, C)
    expect_g = np.where(xg > 0, np.exp2(-xg * xg), 0.0).sum(axis=0)
    run("G fori+pl.ds -> exp2/where", kern_g, xa, expect_g)


if __name__ == "__main__":
    main()
