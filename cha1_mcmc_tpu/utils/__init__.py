"""Utilities: colored logging and throughput metrics."""

from cha1_mcmc_tpu.utils.metrics import Throughput, trace_profile

__all__ = ["Throughput", "trace_profile"]
