"""Pure compute kernels for LTE radiative transfer.

Every function is written once against an array namespace `xp` (numpy or
jax.numpy): the numpy instantiation is the float64 host oracle used by data
reduction and tests; the jnp instantiation is traced into the jitted
likelihood. This keeps a single source of truth for the physics.
"""

from cha1_mcmc_tpu.ops.lte import (
    planck_J,
    beam_dilution,
    apply_beam,
    apply_beam_interferometer,
    get_beam,
    invert_beam,
    tau_sticks,
    stick_spectrum,
    scale_temp,
)

__all__ = ["planck_J", "beam_dilution", "apply_beam", "apply_beam_interferometer", "get_beam", "invert_beam", "tau_sticks", "stick_spectrum", "scale_temp"]
