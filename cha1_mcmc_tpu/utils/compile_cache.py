"""Persistent XLA compilation cache for fit entry points.

On this class of deployment the TPU sits behind a compile relay whose
queue can take minutes per uncached XLA program when busy, while the
sampling itself runs in seconds — a cold 10,000-step flagship fit was
measured at ~250 s wall of which ~0.5 s was sampling. JAX's persistent
compilation cache (the same mechanism the test/bench harnesses already
use) makes every rerun of a given (catalog, datagrid, config) geometry
skip the queue entirely.

The reference has no analogue (NumPy needs no compilation); this is the
TPU-native replacement for "the second run is as slow as the first".
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
