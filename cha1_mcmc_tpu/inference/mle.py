"""Maximum-likelihood initialization of the column density.

Role of reference inference.py:344-376: bounded scalar maximization of
lnlike over Ncol with all other parameters pinned at their prior means.

Two implementations:

* ``method="device"`` (default) — a bracketing search compiled to ONE
  device program: each refinement round evaluates lnlike on a K-point
  grid of Ncol candidates in the current bracket (`lax.map`, one candidate
  at a time — a vmapped grid would materialize K (L, C) intermediates,
  ~19 GB for dense catalogs) and shrinks the bracket around the argmax;
  `lax.fori_loop` chains the rounds on device. A log-spaced first round
  covers the six-decade prior box, then linear rounds contract by ~K/2
  each; the round count is derived from xatol (and from f64 resolution
  under the x64 verification mode). This replaces the last per-fit host
  loop (SURVEY §7.7).
* ``method="scipy"`` — the reference-shaped host loop
  (scipy.optimize.minimize_scalar, method='bounded', xatol=1e-6) driving
  the jitted lnlike; kept as the parity oracle for the device search.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
import scipy.optimize as opt

from cha1_mcmc_tpu.inference.params import ParamSpec

__all__ = ["estimate_ncol_mle"]

_GRID_K = 65


def estimate_ncol_mle(lnlike_fn, spec: ParamSpec, fixed_theta, ncol_bounds,
                      xatol: float = 1e-6, method: str = "device",
                      batched: bool = False) -> float:
    """Return the Ncol maximizing lnlike with other params fixed.

    `fixed_theta` is a full theta vector whose Ncol entry is overwritten per
    trial (layout per `spec`; reference inference.py:354-359 builds the same
    trial vectors). Raises RuntimeError if the scipy optimizer fails to
    converge (reference inference.py:371-373); the device search always
    terminates (fixed round count).

    batched=True: `lnlike_fn` maps (N, D) -> (N,) (e.g.
    build_lnlike_batched's sparse-kernel path — the scalar lnlike cannot
    compile on dense catalogs, see inference/likelihood.py).
    """
    theta0 = np.asarray(fixed_theta, dtype=np.float64).copy()
    ncol_index = spec.ncomp if spec.free_source_size else 0
    if spec.ncomp != 1:
        raise ValueError("MLE init is defined for single-component fits")

    if method == "device":
        return _device_search(lnlike_fn, theta0, ncol_index, ncol_bounds,
                              xatol=xatol, batched=batched)

    jitted = jax.jit(lnlike_fn)

    def nll(ncol):
        theta = theta0.copy()
        theta[ncol_index] = ncol
        if batched:
            return -float(jitted(theta[None])[0])
        return -float(jitted(theta))

    result = opt.minimize_scalar(nll, bounds=tuple(ncol_bounds), method="bounded",
                                 options={"xatol": xatol})
    if not result.success:
        raise RuntimeError("MLE for Ncol did not converge.")
    return float(result.x)


def _device_search(lnlike_fn, theta0, ncol_index: int, ncol_bounds,
                   xatol: float = 1e-6, batched: bool = False) -> float:
    # f64 under the x64 verification mode, else the device f32.
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    lo0, hi0 = float(ncol_bounds[0]), float(ncol_bounds[1])
    theta0 = jnp.asarray(theta0, dtype)
    if batched:
        # Sparse-kernel batched lnlike: the grid IS its walker batch.
        grid_lnlike = lnlike_fn
    else:
        # lax.map, not vmap: the scalar lnlike materializes an (L, C)
        # Gaussian intermediate, so a vmapped 65-point grid would need 65x
        # that — ~19 GB for the 35k-line dense catalogs. Mapping evaluates
        # one candidate at a time inside the same compiled program.
        grid_lnlike = functools.partial(jax.lax.map, lnlike_fn)

    # Bracket width after the log round is <= x * (r - 1) with
    # r = (hi/lo)^(2/(K-1)); each linear round divides it by (K-1)/2.
    # Choose rounds so the final width is below max(xatol, f32 resolution).
    ratio = (hi0 / lo0) ** (2.0 / (_GRID_K - 1))
    width0 = hi0 * (ratio - 1.0)
    floor = max(xatol, hi0 * (1e-7 if dtype == jnp.float32 else 1e-15))
    rounds = 1 + max(1, int(np.ceil(
        np.log(max(width0 / floor, 1.0)) / np.log((_GRID_K - 1) / 2))))
    rounds = min(rounds, 16)

    @jax.jit
    def search():
        def body(i, bracket):
            lo, hi = bracket
            xs = jnp.where(
                i == 0,
                jnp.logspace(jnp.log10(lo), jnp.log10(hi), _GRID_K),
                jnp.linspace(lo, hi, _GRID_K),
            ).astype(dtype)
            thetas = jnp.tile(theta0, (_GRID_K, 1)).at[:, ncol_index].set(xs)
            ll = grid_lnlike(thetas)
            j = jnp.argmax(ll)
            return (xs[jnp.maximum(j - 1, 0)], xs[jnp.minimum(j + 1, _GRID_K - 1)])

        lo, hi = jax.lax.fori_loop(
            0, rounds, body, (jnp.asarray(lo0, dtype), jnp.asarray(hi0, dtype)))
        return 0.5 * (lo + hi)

    return float(search())
