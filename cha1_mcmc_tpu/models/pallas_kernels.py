"""Pallas TPU kernel for the Gaussian opacity accumulation.

The hot contraction of the likelihood is
    opac[w, c] = sum_l tau[w, l] * 1{|v[l,c] - center| < 10 dV_w}
                 * exp(-0.5 ((v[l,c] - vlsr_w) / (dV_w / 2.355))^2)

(reference inference.py:50-53 computes this per line in a Numba loop).
The pure-jnp path materializes the (W, L, C) Gaussian intermediate, which
for dense aromatic catalogs (35k+ transitions, reference
catalog/1-cyanonapthalene.cat) is tens of GB of HBM traffic per ensemble
step — pure bandwidth waste, since each element is used exactly once.

This kernel tiles (walkers x channels x lines), keeps every intermediate in
VMEM, and accumulates the line axis in-place in the output block, so
nothing (W, L, C)-sized ever exists. The +-10*dV velocity window becomes
*block sparsity*: a host-precomputed (line-tile x channel-tile) activity
mask (from the static velocity grid and the prior's dV upper bound) lets
inactive tiles skip all VPU work via predicated execution.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cha1_mcmc_tpu.constants import FWHM_TO_SIGMA_MODEL, VELOCITY_WINDOW_DV

__all__ = ["opacity_pallas", "opacity_pallas_mxu", "opacity_pallas_fused",
           "opacity_pallas_csr", "build_opacity_csr", "window_is_exact",
           "block_activity_mask", "block_activity_mask_traced",
           "build_opacity_gather", "opacity_gather",
           "build_opacity_gather_split", "opacity_gather_split"]

# Tile sizes: walker tile x channel tile x line tile. Chosen so the largest
# in-kernel intermediate (TL x TC f32) is 256 KB and the velocity block DMA
# amortizes well.
TW, TC, TL = 8, 128, 512


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def block_activity_mask(vel_grid: np.ndarray, mask_center: float,
                        dv_max: float, *, tl: int = TL,
                        tc: int = TC) -> np.ndarray:
    """(nL, nC) int32 mask: does any (line, channel) in the tile fall inside
    the widest possible velocity window 10 * dv_max? Static per datagrid."""
    L, C = vel_grid.shape
    nL, nC = _ceil_to(L, tl) // tl, _ceil_to(C, tc) // tc
    inside = np.abs(np.asarray(vel_grid) - mask_center) < VELOCITY_WINDOW_DV * dv_max
    padded = np.zeros((nL * tl, nC * tc), dtype=bool)
    padded[:L, :C] = inside
    blocks = padded.reshape(nL, tl, nC, tc).any(axis=(1, 3))
    return blocks.astype(np.int32)


def block_activity_mask_traced(vel_grid, mask_center: float,
                               dv_max: float, *, tl: int = TL,
                               tc: int = TC) -> jnp.ndarray:
    """Traceable variant of block_activity_mask for use inside jit /
    shard_map, where the velocity grid is a (possibly sharded) traced
    array rather than host NumPy."""
    L, C = vel_grid.shape
    Lp, Cp = _ceil_to(L, tl), _ceil_to(C, tc)
    inside = jnp.abs(vel_grid - mask_center) < VELOCITY_WINDOW_DV * dv_max
    padded = jnp.zeros((Lp, Cp), dtype=bool).at[:L, :C].set(inside)
    blocks = padded.reshape(Lp // tl, tl, Cp // tc, tc).any(axis=(1, 3))
    return blocks.astype(jnp.int32)


def _dma_redirect_table(block_mask) -> jnp.ndarray:
    """(nL, nC) int32: the line-block index whose data each grid step should
    fetch. Active tiles fetch themselves; inactive tiles fetch the block
    fetched at the *previous* l step for that channel column, so Pallas's
    pipeline sees an unchanged block index and skips the HBM->VMEM DMA
    entirely (the compute is already skipped via the activity predicate).
    Traced-friendly (cumulative max), so it runs inside jit."""
    nL = block_mask.shape[0]
    l_ids = jax.lax.broadcasted_iota(jnp.int32, block_mask.shape, 0)
    marked = jnp.where(block_mask != 0, l_ids, -1)
    return jnp.maximum(jax.lax.cummax(marked, axis=0), 0).astype(jnp.int32)


def _opacity_kernel(tables_ref, tau_ref, vlsr_ref, dv_ref, vel_ref, out_ref,
                    *, mask_center: float):
    l_idx = pl.program_id(2)
    c_idx = pl.program_id(1)

    @pl.when(l_idx == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(tables_ref[0, l_idx, c_idx] != 0)
    def _accumulate():
        vel = vel_ref[:]                      # (TL, TC)
        rows = []
        # Per-walker row: 2D (TL, TC) intermediates stay in VMEM.
        for w in range(tau_ref.shape[0]):
            vlsr = vlsr_ref[w, 0]
            dv = dv_ref[w, 0]
            sigma = dv / FWHM_TO_SIGMA_MODEL
            window = jnp.abs(vel - mask_center) < VELOCITY_WINDOW_DV * dv
            z = (vel - vlsr) / sigma
            gauss = jnp.where(window, jnp.exp(-0.5 * z * z), 0.0)  # (TL, TC)
            rows.append(jnp.sum(tau_ref[w, :][:, None] * gauss, axis=0))
        out_ref[:] += jnp.stack(rows, axis=0)  # (TW, TC)


def window_is_exact(dv_min: float, max_vlsr_offset: float,
                    margin: float = 1.1) -> bool:
    """Is dropping the per-element ±10·dV window select *exactly* lossless
    in f32 for every in-bounds (vlsr, dV)?

    At the window edge the Gaussian argument is
        z_edge = (10·dV − |vlsr − center|) / (dV / 2.355),
    worst-cased at dV = dv_min and |vlsr − center| = max_vlsr_offset.
    exp(−z²/2) flushes to exactly 0.0 in f32 (TPUs flush subnormals) once
    z ≳ 14.37 (2^−126 ≈ exp(−87.3)); with z_edge above that, every
    out-of-window channel underflows and the select is a no-op. Below it,
    the unmasked kernels would silently diverge from the reference window
    semantics — callers must use the masked variants.
    """
    if dv_min <= 0:
        return False
    z_edge = (VELOCITY_WINDOW_DV * dv_min - max_vlsr_offset) * \
        FWHM_TO_SIGMA_MODEL / dv_min
    return z_edge >= 14.37 * margin


def _opacity_kernel_mxu(tables_ref, tau_ref, vlsr_ref, dv_ref, vel_ref,
                        out_ref, *, mask_center: float, masked: bool = True):
    """Variant: one fused (TW, TL, TC) Gaussian evaluation on the VPU, then
    the line contraction as TW (1, TL) x (TL, TC) jnp.dot products on the
    MXU instead of the per-walker broadcast-multiply-reduce. (A single
    batched dot_general would be ideal, but this Mosaic version cannot
    lower batched dot dimension numbers.)"""
    l_idx = pl.program_id(2)
    c_idx = pl.program_id(1)

    @pl.when(l_idx == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(tables_ref[0, l_idx, c_idx] != 0)
    def _accumulate():
        vel = vel_ref[:][None, :, :]                      # (1, TL, TC)
        vlsr = vlsr_ref[:][:, :, None]                    # (TW, 1, 1)
        dv = dv_ref[:][:, :, None]                        # (TW, 1, 1)
        sigma = dv / FWHM_TO_SIGMA_MODEL
        # exp(-0.5 z^2) as exp2(a (vel-vlsr)^2), a = -log2(e)/(2 sigma^2):
        # folds the 1/sigma and -0.5 multiplies into one per-walker scalar.
        a = (-0.5 * np.log2(np.e)) / (sigma * sigma)
        d = vel - vlsr
        gauss = jnp.exp2(a * (d * d))                          # (TW, TL, TC)
        if masked:
            window = jnp.abs(vel - mask_center) < VELOCITY_WINDOW_DV * dv
            gauss = jnp.where(window, gauss, 0.0)
        # else: caller proved window_is_exact() — at the window edge
        # z >= 14.37·margin, so exp flushes to exactly 0.0 in f32 and the
        # select is a no-op.
        rows = [
            jnp.dot(tau_ref[w:w + 1, :], gauss[w],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)      # (1, TC)
            for w in range(tau_ref.shape[0])
        ]
        out_ref[:] += jnp.concatenate(rows, axis=0)           # (TW, TC)


def _opacity_kernel_fused(tables_ref, tau_ref, vlsr_ref, dv_ref, vel_ref,
                          out_ref, *, mask_center: float):
    """Variant: fully fused VPU path — one (TW, TL, TC) Gaussian evaluation
    and one broadcast-multiply-reduce, no Python unroll."""
    l_idx = pl.program_id(2)
    c_idx = pl.program_id(1)

    @pl.when(l_idx == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(tables_ref[0, l_idx, c_idx] != 0)
    def _accumulate():
        vel = vel_ref[:][None, :, :]                      # (1, TL, TC)
        vlsr = vlsr_ref[:][:, :, None]                    # (TW, 1, 1)
        dv = dv_ref[:][:, :, None]                        # (TW, 1, 1)
        sigma = dv / FWHM_TO_SIGMA_MODEL
        window = jnp.abs(vel - mask_center) < VELOCITY_WINDOW_DV * dv
        z = (vel - vlsr) / sigma
        gauss = jnp.where(window, jnp.exp(-0.5 * z * z), 0.0)  # (TW, TL, TC)
        out_ref[:] += jnp.sum(tau_ref[:][:, :, None] * gauss, axis=1)


def _opacity_call(kernel_body, taus, vlsr, dV, vel_grid, block_mask,
                  mask_center: float, interpret: bool,
                  tiles: tuple[int, int, int] = (TW, TC, TL),
                  **kernel_kwargs):
    """Shared pallas_call plumbing for the opacity kernel variants.
    tiles = (tw, tc, tl); block_mask must have been built with the same
    (tl, tc)."""
    tw, tc, tl = tiles
    W, L = taus.shape
    L2, C = vel_grid.shape
    assert L == L2
    dtype = taus.dtype
    Wp, Lp, Cp = _ceil_to(W, tw), _ceil_to(L, tl), _ceil_to(C, tc)

    taus = jnp.pad(taus, ((0, Wp - W), (0, Lp - L)))
    # Padded walkers get dV=1 (harmless; their rows are dropped at the end).
    vlsr_p = jnp.pad(vlsr.reshape(-1, 1), ((0, Wp - W), (0, 0)))
    dv_p = jnp.pad(dV.reshape(-1, 1), ((0, Wp - W), (0, 0)), constant_values=1.0)
    # Padded velocity entries sit far outside every window.
    vel_p = jnp.pad(vel_grid, ((0, Lp - L), (0, Cp - C)),
                    constant_values=jnp.asarray(1e30, dtype))

    grid = (Wp // tw, Cp // tc, Lp // tl)
    # tables[0] = activity mask (compute predicate); tables[1] = DMA
    # redirect: inactive steps re-fetch the previous block index, which the
    # Pallas pipeline recognizes as "same block" and elides the DMA.
    # Measured (v5e, 35,460-line 1-cyanonaphthalene x 2048 channels x 128
    # walkers, 7.3% block density; tools/bench_pallas_dense.py):
    #   jnp einsum                31.0 ms/eval
    #   _opacity_kernel (this)     6.2 ms/eval  (block sparsity)
    #   _opacity_kernel_mxu        4.8 ms/eval  (+MXU dot, exp2; 4.2 at
    #                                            tiles (16,128,512))
    #   _opacity_kernel_csr        1.17 ms/eval (line compaction + per-tile
    #                                            step predication, tw=32;
    #                                            1.14 unmasked — the window
    #                                            select costs ~3%)
    # The remaining gap to the CSR kernel is elementwise sparsity: only
    # ~0.1% of the elements of *active* blocks are in-window, so the
    # block-sparse kernels still burn most VPU exp work on zeros.
    block_mask = jnp.asarray(block_mask, jnp.int32)
    tables = jnp.stack([block_mask, _dma_redirect_table(block_mask)])
    out = pl.pallas_call(
        functools.partial(kernel_body, mask_center=mask_center,
                          **kernel_kwargs),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # tables
            grid=grid,
            in_specs=[
                pl.BlockSpec((tw, tl), lambda w, c, l, t: (w, t[1, l, c])),
                pl.BlockSpec((tw, 1), lambda w, c, l, t: (w, 0)),
                pl.BlockSpec((tw, 1), lambda w, c, l, t: (w, 0)),
                pl.BlockSpec((tl, tc), lambda w, c, l, t: (t[1, l, c], c)),
            ],
            out_specs=pl.BlockSpec((tw, tc), lambda w, c, l, t: (w, c)),
        ),
        out_shape=jax.ShapeDtypeStruct((Wp, Cp), dtype),
        interpret=interpret,
    )(tables, taus, vlsr_p, dv_p, vel_p)
    return out[:W, :C]


@functools.partial(jax.jit, static_argnames=("mask_center", "interpret"))
def opacity_pallas(taus, vlsr, dV, vel_grid, block_mask, *,
                   mask_center: float, interpret: bool = False):
    """Accumulated Gaussian opacity, (W, C).

    taus: (W, L); vlsr, dV: (W,); vel_grid: (L, C);
    block_mask: (ceil(L/TL), ceil(C/TC)) int32 from block_activity_mask
    (pass all-ones to disable sparsity).
    """
    return _opacity_call(_opacity_kernel, taus, vlsr, dV, vel_grid,
                         block_mask, mask_center, interpret)


@functools.partial(jax.jit,
                   static_argnames=("mask_center", "interpret", "tiles",
                                    "unmasked"))
def opacity_pallas_mxu(taus, vlsr, dV, vel_grid, block_mask, *,
                       mask_center: float, interpret: bool = False,
                       tiles: tuple[int, int, int] = (TW, TC, TL),
                       unmasked: bool = False):
    """opacity_pallas with the line contraction on the MXU (see
    _opacity_kernel_mxu). tiles = (tw, tc, tl); block_mask must come from
    block_activity_mask with the same (tl, tc). unmasked=True drops the
    per-element window select — ONLY valid when the caller has proven
    window_is_exact(dv_min, max_vlsr_offset) for its parameter box."""
    return _opacity_call(_opacity_kernel_mxu, taus, vlsr, dV, vel_grid,
                         block_mask, mask_center, interpret, tiles,
                         masked=not unmasked)


@functools.partial(jax.jit, static_argnames=("mask_center", "interpret"))
def opacity_pallas_fused(taus, vlsr, dV, vel_grid, block_mask, *,
                         mask_center: float, interpret: bool = False):
    """opacity_pallas with a single fused VPU reduction (see
    _opacity_kernel_fused)."""
    return _opacity_call(_opacity_kernel_fused, taus, vlsr, dV, vel_grid,
                         block_mask, mask_center, interpret)


# ---------------------------------------------------------------------------
# Compacted (CSR-style) kernel: per channel tile, gather only the lines whose
# +-10 dv_max window touches that tile. For dense catalogs the velocity
# window is extremely sparse at the element level (1-cyanonaphthalene:
# 0.007% of (line, channel) pairs are in-window, ~0.1% of the elements of
# *active* blocks), so block sparsity alone still burns >99% of the VPU's
# exp work on zeros. Compaction pads each channel tile's active-line list to
# the global max (the band is roughly uniform, so max ~ 2.8x mean), shrinking
# both the exp count and the velocity-grid HBM traffic by ~30x vs the
# block-sparse kernel on the 35k-line catalog.
# ---------------------------------------------------------------------------


def build_opacity_csr(vel_grid: np.ndarray, mask_center: float,
                      dv_max: float, *, tc: int = TC, tl: int = 128):
    """Precompute the static compaction tables for opacity_pallas_csr.

    Returns (line_table (nC, K) int32, vel_compact (nC * K, tc) f32,
    tile_counts (nC,) int32) where K is the max number of active lines over
    channel tiles, padded to a multiple of tl, and tile_counts[j] is the
    number of active lines for channel tile j — the band is uneven, so
    most tiles have far fewer than K active lines; the kernel predicates
    the all-padding line-tile steps off. Padding entries point at velocity
    1e30, which underflows the Gaussian to exactly 0 regardless of tau.
    Static per (datagrid, prior dV bound) — same inputs as
    block_activity_mask.
    """
    vel_grid = np.asarray(vel_grid)
    L, C = vel_grid.shape
    nC = _ceil_to(C, tc) // tc
    inside = np.abs(vel_grid - mask_center) < VELOCITY_WINDOW_DV * dv_max
    active = [np.flatnonzero(inside[:, j * tc:(j + 1) * tc].any(axis=1))
              for j in range(nC)]
    K = _ceil_to(max((len(a) for a in active), default=1), tl)
    line_table = np.zeros((nC, K), dtype=np.int32)
    vel_compact = np.full((nC, K, tc), 1e30, dtype=vel_grid.dtype)
    tile_counts = np.zeros(nC, dtype=np.int32)
    for j, idx in enumerate(active):
        line_table[j, :len(idx)] = idx
        chunk = vel_grid[idx, j * tc:min((j + 1) * tc, C)]
        vel_compact[j, :len(idx), :chunk.shape[1]] = chunk
        tile_counts[j] = len(idx)
    return line_table, vel_compact.reshape(nC * K, tc), tile_counts


def _opacity_kernel_csr(steps_ref, row_ref, tau_ref, vlsr_ref, dv_ref,
                        vel_ref, out_ref, *, mask_center: float,
                        masked: bool = True):
    """Compacted variant of _opacity_kernel_mxu. Padding rows carry
    vel = 1e30 -> gauss exactly 0, so padding needs no masking; line-tile
    steps that are *entirely* padding (most of them — K is the max over
    channel tiles) are predicated off via the prefetched step table, and
    their DMAs elided via the redirect table. The ±10·dV window select is
    applied unless the caller proved window_is_exact()."""
    j_idx = pl.program_id(1)
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(k_idx < steps_ref[j_idx])
    def _accumulate():
        vel = vel_ref[:][None, :, :]                      # (1, TLc, TC)
        vlsr = vlsr_ref[:][:, :, None]                    # (TW, 1, 1)
        dv = dv_ref[:][:, :, None]                        # (TW, 1, 1)
        sigma = dv / FWHM_TO_SIGMA_MODEL
        # See _opacity_kernel_mxu for the exp2 form.
        a = (-0.5 * np.log2(np.e)) / (sigma * sigma)
        d = vel - vlsr
        gauss = jnp.exp2(a * (d * d))                     # (TW, TLc, TC)
        if masked:
            window = jnp.abs(vel - mask_center) < VELOCITY_WINDOW_DV * dv
            gauss = jnp.where(window, gauss, 0.0)
        rows = [
            jnp.dot(tau_ref[w:w + 1, :], gauss[w],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            for w in range(tau_ref.shape[0])
        ]
        out_ref[:] += jnp.concatenate(rows, axis=0)       # (TW, TC)


@functools.partial(jax.jit,
                   static_argnames=("mask_center", "n_channels", "interpret",
                                    "tiles", "unmasked"))
def opacity_pallas_csr(taus, vlsr, dV, line_table, vel_compact, tile_counts,
                       *, mask_center: float, n_channels: int,
                       interpret: bool = False,
                       tiles: tuple[int, int] = (32, 128),
                       unmasked: bool = False):
    """Accumulated Gaussian opacity via line compaction, (W, n_channels).

    taus: (W, L); vlsr, dV: (W,); (line_table, vel_compact, tile_counts)
    from build_opacity_csr (whose tc must equal tiles[1] and whose tl must
    divide the table's K). tiles = (tw, tlc). unmasked=True drops the
    per-element ±10·dV window select — ONLY valid when the caller has
    proven window_is_exact(dv_min, max_vlsr_offset) for its parameter box.
    """
    tw, tlc = tiles
    W, L = taus.shape
    nC, K = line_table.shape
    tc = vel_compact.shape[1]
    dtype = taus.dtype
    Wp = _ceil_to(W, tw)

    # Per-eval gather: only the active lines' taus reach the kernel.
    tau_c = jnp.take(taus, line_table.reshape(-1), axis=1)   # (W, nC * K)
    tau_c = jnp.pad(tau_c, ((0, Wp - W), (0, 0)))
    vlsr_p = jnp.pad(vlsr.reshape(-1, 1), ((0, Wp - W), (0, 0)))
    dv_p = jnp.pad(dV.reshape(-1, 1), ((0, Wp - W), (0, 0)),
                   constant_values=1.0)

    grid = (Wp // tw, nC, K // tlc)
    kpt = K // tlc  # line-tile steps per channel tile
    # tables[0, j]: used line-tile steps for channel tile j (>= 1 so step 0
    # still zero-inits the output); tables[1, j, k]: the block row each
    # step fetches — predicated-off steps re-fetch the previous row, which
    # the Pallas pipeline recognizes as "same block" and elides the DMA.
    steps = jnp.maximum(-(-jnp.asarray(tile_counts, jnp.int32) // tlc), 1)
    k_ids = jnp.arange(kpt, dtype=jnp.int32)[None, :]
    row = jnp.arange(nC, dtype=jnp.int32)[:, None] * kpt + jnp.minimum(
        k_ids, steps[:, None] - 1)
    tables = (steps, row)
    out = pl.pallas_call(
        functools.partial(_opacity_kernel_csr, mask_center=mask_center,
                          masked=not unmasked),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tw, tlc), lambda w, j, k, s, r: (w, r[j, k])),
                pl.BlockSpec((tw, 1), lambda w, j, k, s, r: (w, 0)),
                pl.BlockSpec((tw, 1), lambda w, j, k, s, r: (w, 0)),
                pl.BlockSpec((tlc, tc), lambda w, j, k, s, r: (r[j, k], 0)),
            ],
            out_specs=pl.BlockSpec((tw, tc), lambda w, j, k, s, r: (w, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((Wp, nC * tc), dtype),
        interpret=interpret,
    )(*tables, tau_c, vlsr_p, dv_p, jnp.asarray(vel_compact, dtype))
    return out[:W, :n_channels]


# ---------------------------------------------------------------------------
# Channel-major gather formulation: the window sparsity transposed. The CSR
# kernel compacts lines per 128-channel tile, but each line's ±10·dV window
# covers only ~1-2 channels of the 128 it is then evaluated against, so even
# the compacted kernel burns ~99% of its VPU exp work on zeros
# (1-cyanonaphthalene @ 2048 channels: 4,972 in-window (line, channel) pairs
# out of 72.6M — 2.4 contributing lines per channel on average, max 46).
# Here the static table is per *channel*: line_table[m, c] lists the lines
# whose widest-possible window covers channel c. The opacity becomes a
# gather + (W, M, C) elementwise Gaussian + a length-M reduction — pure jnp
# (no Pallas needed; XLA fuses it), with M ~ tens instead of L ~ tens of
# thousands. Lines that cover no channel at all are dropped from the tau
# computation too (the `active` subset).
# ---------------------------------------------------------------------------


def build_opacity_gather(vel_grid: np.ndarray, mask_center: float,
                         dv_max: float):
    """Static channel-major gather tables for opacity_gather.

    Returns (line_table (M, C) int32, vel_t (M, C) f32, active (La,) int64):
    line_table[m, c] indexes into the `active` line subset (the caller
    computes taus only for catalog lines `active`); vel_t[m, c] is that
    line's velocity at channel c. M is the max number of in-window lines
    over channels. Padding entries carry vel 1e30 (Gaussian exactly 0 in
    f32) and line index 0. Static per (datagrid, prior dV bound) — same
    inputs as block_activity_mask / build_opacity_csr.
    """
    vel_grid = np.asarray(vel_grid)
    L, C = vel_grid.shape
    inside = np.abs(vel_grid - mask_center) < VELOCITY_WINDOW_DV * dv_max
    counts = inside.sum(axis=0)
    M = max(int(counts.max()), 1)
    active = np.flatnonzero(inside.any(axis=1))
    if active.size == 0:
        active = np.array([0], dtype=np.int64)
    remap = np.zeros(L, dtype=np.int32)
    remap[active] = np.arange(active.size, dtype=np.int32)
    line_table = np.zeros((M, C), dtype=np.int32)
    vel_t = np.full((M, C), 1e30, dtype=vel_grid.dtype)
    for c in np.flatnonzero(counts):
        idx = np.flatnonzero(inside[:, c])
        line_table[:idx.size, c] = remap[idx]
        vel_t[:idx.size, c] = vel_grid[idx, c]
    return line_table, vel_t, active


@functools.partial(jax.jit, static_argnames=("mask_center",))
def opacity_gather(taus, vlsr, dV, line_table, vel_t, *, mask_center: float):
    """Accumulated Gaussian opacity via the channel-major gather, (W, C).

    taus: (W, La) over the active-line subset from build_opacity_gather;
    vlsr, dV: (W,); line_table/vel_t: (M, C). Exact ±10·dV window
    semantics (the per-walker window select is kept — it is M-cheap here).
    """
    sigma = (dV / FWHM_TO_SIGMA_MODEL)[:, None, None]
    window = jnp.abs(vel_t - mask_center) < (
        VELOCITY_WINDOW_DV * dV[:, None, None])
    z = (vel_t - vlsr[:, None, None]) / sigma
    gauss = jnp.where(window, jnp.exp(-0.5 * z * z), 0.0)   # (W, M, C)
    tau_g = jnp.take(taus, line_table, axis=-1)             # (W, M, C)
    return jnp.sum(tau_g * gauss, axis=-2)


# ---------------------------------------------------------------------------
# Two-class split of the channel-major gather. The rectangular (M, C) table
# is padded to the *maximum* per-channel line count, but the distribution is
# extremely skewed on dense catalogs (1-cyanonaphthalene @ 2048 channels:
# mean 2.4 lines/channel, max 46 — ~95% of the (M, C) work is padding). The
# split keeps a short (M1, C) table covering every channel's first M1 lines
# and moves the overflow of the few "heavy" channels (hfs clusters /
# line-dense regions) into a second (M2, C2) table over just those C2
# channels, scattered back into the full channel axis with an exact one-hot
# MXU contraction (f32 at HIGHEST precision — the same exactness argument as
# sampler/fused.py's gathers: one-hot times value reconstructs the value).
# ---------------------------------------------------------------------------


def heavy_scatter_onehot(heavy: np.ndarray, n_channels: int) -> np.ndarray:
    """(C2, C) f32 one-hot scatter matrix mapping the heavy-channel
    overflow columns of build_opacity_gather_split back to their channel
    positions — contracted exactly on the MXU by opacity_gather_split
    (value x {0, 1})."""
    onehot = np.zeros((len(heavy), n_channels), dtype=np.float32)
    onehot[np.arange(len(heavy)), heavy] = 1.0
    return onehot


def build_opacity_gather_split(vel_grid: np.ndarray, mask_center: float,
                               dv_max: float, m1: int | None = None,
                               min_saving: float = 1.3):
    """Two-class channel-major gather tables, or None when not worthwhile.

    Returns (table1 (M1, C), vel1 (M1, C), table2 (M2, C2), vel2 (M2, C2),
    heavy (C2,) int64 channel indices, active (La,) int64) with the same
    index/velocity conventions as build_opacity_gather: tables index the
    `active` line subset, padding entries carry vel 1e30 (Gaussian exactly
    0 in f32) and line index 0. M1 is chosen to minimise the modeled
    element work C*M1 + C2*M2; returns None unless that beats the
    rectangular table's M*C by at least `min_saving` x (then callers use
    the plain gather)."""
    vel_grid = np.asarray(vel_grid)
    L, C = vel_grid.shape
    inside = np.abs(vel_grid - mask_center) < VELOCITY_WINDOW_DV * dv_max
    counts = inside.sum(axis=0)
    M = max(int(counts.max()), 1)

    def split_work(cand):
        c2 = int((counts > cand).sum())
        m2 = int(max(counts.max() - cand, 0)) if c2 else 0
        return C * cand + c2 * m2

    if m1 is not None:
        # A caller-chosen m1 is screened against ITS OWN work model, not
        # the work-optimal one the search would pick.
        chosen = (m1, split_work(m1))
    else:
        chosen = min(((cand, split_work(cand)) for cand in range(1, M)),
                     key=lambda t: t[1], default=None)
    if chosen is None or M * C < min_saving * chosen[1]:
        return None
    m1 = chosen[0]
    active = np.flatnonzero(inside.any(axis=1))
    if active.size == 0:
        active = np.array([0], dtype=np.int64)
    remap = np.zeros(L, dtype=np.int32)
    remap[active] = np.arange(active.size, dtype=np.int32)
    heavy = np.flatnonzero(counts > m1)
    M2 = max(int((counts[heavy] - m1).max()), 1) if heavy.size else 1
    table1 = np.zeros((m1, C), dtype=np.int32)
    vel1 = np.full((m1, C), 1e30, dtype=vel_grid.dtype)
    table2 = np.zeros((M2, max(heavy.size, 1)), dtype=np.int32)
    vel2 = np.full((M2, max(heavy.size, 1)), 1e30, dtype=vel_grid.dtype)
    for c in np.flatnonzero(counts):
        idx = np.flatnonzero(inside[:, c])
        k = min(idx.size, m1)
        table1[:k, c] = remap[idx[:k]]
        vel1[:k, c] = vel_grid[idx[:k], c]
    for j, c in enumerate(heavy):
        idx = np.flatnonzero(inside[:, c])[m1:]
        table2[:idx.size, j] = remap[idx]
        vel2[:idx.size, j] = vel_grid[idx, c]
    if heavy.size == 0:
        heavy = np.array([0], dtype=np.int64)
    return table1, vel1, table2, vel2, heavy, active


@functools.partial(jax.jit, static_argnames=("mask_center",))
def opacity_gather_split(taus, vlsr, dV, table1, vel1, table2, vel2,
                         heavy_onehot, *, mask_center: float):
    """Accumulated Gaussian opacity via the split gather, (W, C).

    Same semantics as opacity_gather. heavy_onehot is the (C2, C) f32
    one-hot scatter matrix for the heavy-channel overflow table (row j has
    a single 1 at column heavy[j]); the contraction runs at HIGHEST
    precision so the scattered overflow partial is f32-exact. Light
    channels (count <= M1) are bitwise-identical to the plain gather
    (their overflow partial is exactly 0.0); heavy channels differ only
    by the f32 reassociation of splitting the line sum in two."""
    part1 = opacity_gather(taus, vlsr, dV, table1, vel1,
                           mask_center=mask_center)         # (W, C)
    part2 = opacity_gather(taus, vlsr, dV, table2, vel2,
                           mask_center=mask_center)         # (W, C2)
    return part1 + jnp.dot(part2, heavy_onehot,
                           preferred_element_type=part1.dtype,
                           precision=jax.lax.Precision.HIGHEST)
