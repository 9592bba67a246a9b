"""Utilities: throughput metrics, profiling hooks, and the persistent
compilation cache (console color codes live in constants.py)."""

from cha1_mcmc_tpu.utils.compile_cache import enable_compilation_cache
from cha1_mcmc_tpu.utils.metrics import Throughput, trace_profile

__all__ = ["Throughput", "trace_profile", "enable_compilation_cache"]
