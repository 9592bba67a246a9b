"""Utilities: throughput metrics and profiling hooks (console color
codes live in constants.py)."""

from cha1_mcmc_tpu.utils.metrics import Throughput, trace_profile

__all__ = ["Throughput", "trace_profile"]
