"""Persistent XLA compilation cache for fit entry points.

What this does and does not buy, measured on the deployed v5e relay
(2026-08-17, fresh processes, `JAX_DEBUG_LOG_MODULES=jax._src.compilation_cache`):

  * Local XLA compiles here are CHEAP (0.4-0.5 s for the fit's programs;
    jax even skips persisting them under its 1 s threshold). The minutes
    of wall observed on a first run go to the TPU relay's *per-process
    first-dispatch admission* (measured 31-62 s for an already-cached
    program, load-dependent) and to terminal-side compilation of heavy
    Mosaic programs — the relay caches those across processes keyed on
    the program, so identical fits re-pay only the admission.
  * This cache therefore does NOT shorten first dispatch on the relay
    deployment. It removes recompilation cost where local compilation IS
    the cost: CPU runs (the test suite's 8-virtual-device backend) and
    standard TPU hosts with a local libtpu.
  * The lever that DOES amortize relay admission is process reuse: fit
    many molecules in one process (`pipeline/batch.py:fit_molecules`,
    the REPL, or one driver script) rather than one process per fit.

The reference has no analogue (NumPy needs no compilation); enabling the
cache at the entry points is standard JAX hygiene, with the real
deployment economics documented above.
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]

_DISABLED = ("0", "off", "none", "false")


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Idempotently enable JAX's persistent compilation cache.

    Resolution order: an explicit `path` argument, the
    ``CHA1_COMPILE_CACHE`` environment variable, then
    ``~/.cache/cha1_mcmc_tpu/xla``. A user-set
    ``jax_compilation_cache_dir`` (config or JAX_COMPILATION_CACHE_DIR
    env) always wins and is left untouched. Set
    ``CHA1_COMPILE_CACHE=off`` to disable. Returns the cache dir in
    effect (None when disabled).
    """
    import jax

    current = jax.config.jax_compilation_cache_dir
    if current:
        return current
    path = path or os.environ.get("CHA1_COMPILE_CACHE") or os.path.join(
        os.path.expanduser("~"), ".cache", "cha1_mcmc_tpu", "xla")
    if path.lower() in _DISABLED:
        return None
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
    except OSError:  # unwritable home (containers): run uncached
        return None
    return path
