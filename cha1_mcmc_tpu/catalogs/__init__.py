"""Catalog layer: SPCAT parsing and partition-function models.

Host-side (NumPy, float64). Produces frozen static arrays that the jitted
device code treats as constants.
"""

from cha1_mcmc_tpu.catalogs.spcat import Catalog, load_catalog, parse_spcat
from cha1_mcmc_tpu.catalogs.partition import QModel, q_model_for_catalog, calc_qvib

__all__ = ["Catalog", "load_catalog", "parse_spcat", "QModel", "q_model_for_catalog", "calc_qvib"]
