"""First-class performance observability.

The reference's only runtime observability is tqdm progress bars and
wall-clock ETA heuristics (reference inference.py:460, functions.py:568-604).
Here walker-steps/sec is a first-class metric and `jax.profiler` traces can
wrap any region.
"""

from __future__ import annotations

import contextlib
import time

__all__ = ["Throughput", "trace_profile"]


class Throughput:
    """Measure walker-steps (likelihood evaluations) per second."""

    def __init__(self):
        self._t0 = None
        self.elapsed = 0.0
        self.walker_steps = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed += time.perf_counter() - self._t0
        self._t0 = None

    def add(self, nsteps: int, nwalkers: int):
        self.walker_steps += nsteps * nwalkers

    @property
    def walker_steps_per_sec(self) -> float:
        return self.walker_steps / self.elapsed if self.elapsed else 0.0

    def summary(self) -> dict:
        return {"walker_steps": self.walker_steps,
                "elapsed_s": round(self.elapsed, 3),
                "walker_steps_per_sec": round(self.walker_steps_per_sec, 1)}

    def save(self, path: str):
        """Persist the measurement alongside the fit artifacts."""
        import json

        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=1)


@contextlib.contextmanager
def trace_profile(log_dir: str | None):
    """Optionally wrap a region in a jax.profiler trace."""
    if log_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
