"""Goodman & Weare affine-invariant stretch-move ensemble sampler.

Semantics match emcee v3's StretchMove + RedBlueMove driver, which the
reference uses as its sampling engine (reference inference.py:456-473,
requirements.txt pin emcee==3.1.6):

  * per step the ensemble is split into two random halves
    (RedBlueMove randomize_split);
  * halves update sequentially — the second half sees the first half's
    *updated* coordinates;
  * each active walker draws a partner uniformly from the complementary
    half, a stretch factor z with density g(z) = 1/sqrt(z) on [1/a, a]
    via z = ((a-1) u + 1)^2 / a, and proposes Y = c + z (s - c);
  * acceptance: ln U < (ndim - 1) ln z + lnprob(Y) - lnprob(s).

TPU-native realization: the whole chain is one `lax.scan` over steps; each
half-update evaluates the vmapped lnprob for W/2 proposals as a single
fused device program. The reference instead ships each walker's theta to a
forked CPU process through pickled pipes (reference inference.py:456-463).
Fixed PRNG keys make chains bitwise reproducible.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["run_ensemble", "EnsembleSampler"]


def _half_step(lnprob_batch, ndim, a, coords, lnp, active_idx, comp_idx, key):
    """Update walkers `active_idx` using complement `comp_idx`. Returns
    (coords, lnp, n_accepted)."""
    k_z, k_pair, k_acc = jax.random.split(key, 3)
    n_active = active_idx.shape[0]
    s = coords[active_idx]
    c_all = coords[comp_idx]

    u = jax.random.uniform(k_z, (n_active,), dtype=coords.dtype)
    z = ((a - 1.0) * u + 1.0) ** 2 / a
    pair = jax.random.randint(k_pair, (n_active,), 0, comp_idx.shape[0])
    c = c_all[pair]
    proposal = c + z[:, None] * (s - c)

    lnp_new = lnprob_batch(proposal)
    lnpdiff = (ndim - 1.0) * jnp.log(z) + lnp_new - lnp[active_idx]
    accept = jnp.log(jax.random.uniform(k_acc, (n_active,), dtype=coords.dtype)) < lnpdiff

    coords = coords.at[active_idx].set(jnp.where(accept[:, None], proposal, s))
    lnp = lnp.at[active_idx].set(jnp.where(accept, lnp_new, lnp[active_idx]))
    return coords, lnp, jnp.sum(accept)


@partial(jax.jit, static_argnames=("lnprob_fn", "nsteps", "a", "thin", "batched"))
def run_ensemble(lnprob_fn, pos0, lnp0, key, nsteps: int, a: float = 2.0,
                 thin: int = 1, batched: bool = False):
    """Run `nsteps` ensemble steps from (pos0, lnp0).

    lnprob_fn: scalar theta -> lnprob (vmapped internally), or — with
    batched=True — an explicitly batched (N, D) -> (N,) function (e.g. the
    Pallas-backed build_lnprob_batched).
    pos0: (W, D) initial walker coordinates; lnp0: (W,) their lnprob.
    Each of the `nsteps` recorded steps advances the ensemble by `thin`
    raw ensemble moves. Returns (chain (nsteps, W, D), lnps (nsteps, W),
    accepted (nsteps,), final (pos, lnp)).
    """
    W, D = pos0.shape
    n_first = W // 2
    lnprob_batch = lnprob_fn if batched else jax.vmap(lnprob_fn)

    def one_step(carry, step_key):
        coords, lnp = carry
        k_perm, k0, k1 = jax.random.split(step_key, 3)
        perm = jax.random.permutation(k_perm, W)
        first, second = perm[:n_first], perm[n_first:]
        coords, lnp, acc0 = _half_step(lnprob_batch, D, a, coords, lnp, first, second, k0)
        coords, lnp, acc1 = _half_step(lnprob_batch, D, a, coords, lnp, second, first, k1)
        return (coords, lnp), acc0 + acc1

    def thinned_step(carry, step_key):
        if thin == 1:
            carry, acc = one_step(carry, step_key)
        else:
            sub = jax.random.split(step_key, thin)
            carry, accs = jax.lax.scan(one_step, carry, sub)
            acc = jnp.sum(accs)
        coords, lnp = carry
        return carry, (coords, lnp, acc)

    keys = jax.random.split(key, nsteps)
    (pos, lnp), (chain, lnps, accepted) = jax.lax.scan(thinned_step, (pos0, lnp0), keys)
    return chain, lnps, accepted, (pos, lnp)


@dataclasses.dataclass
class EnsembleSampler:
    """Stateful convenience wrapper with the reference chain-file contract.

    The reference drives emcee one step at a time, saving the cumulative
    chain as a (nwalkers, nsteps, ndim) .npy after every step and resuming
    from chain[:, -1, :] (reference inference.py:460-473). At TPU speeds a
    per-step host write would dominate, so steps run on device in blocks of
    `checkpoint_every` and the same .npy contract is honored at block
    boundaries.
    """

    lnprob_fn: callable
    nwalkers: int
    ndim: int
    a: float = 2.0
    dtype: object = jnp.float32
    batched: bool = False  # lnprob_fn already maps (N, D) -> (N,)

    def __post_init__(self):
        self._chain_blocks: list[np.ndarray] = []   # each (W, K, D)
        self._lnp_blocks: list[np.ndarray] = []
        self.accepted = 0
        self.total_proposals = 0

    @property
    def chain(self) -> np.ndarray:
        """(nwalkers, nsteps, ndim), emcee layout (reference inference.py:462)."""
        if not self._chain_blocks:
            return np.empty((self.nwalkers, 0, self.ndim))
        return np.concatenate(self._chain_blocks, axis=1)

    @property
    def lnprobability(self) -> np.ndarray:
        if not self._lnp_blocks:
            return np.empty((self.nwalkers, 0))
        return np.concatenate(self._lnp_blocks, axis=1)

    @property
    def acceptance_fraction(self) -> float:
        return self.accepted / max(self.total_proposals, 1)

    def run_mcmc(self, pos, nsteps: int, key, checkpoint_every: int = 256,
                 chain_file: str | None = None, progress: bool = False, thin: int = 1):
        """Run `nsteps` steps, checkpointing the cumulative chain per block."""
        pos = jnp.asarray(pos, dtype=self.dtype)
        lnp = self.lnprob_fn(pos) if self.batched else jax.vmap(self.lnprob_fn)(pos)
        done = 0
        iterator = None
        if progress:
            from tqdm import tqdm

            iterator = tqdm(total=nsteps, desc="MCMC sampling", colour="white")
        while done < nsteps:
            block = min(checkpoint_every, nsteps - done)
            key, sub = jax.random.split(key)
            chain, lnps, accepted, (pos, lnp) = run_ensemble(
                self.lnprob_fn, pos, lnp, sub, nsteps=block, a=self.a, thin=thin,
                batched=self.batched)
            # device (K, W, D) -> emcee layout (W, K, D)
            self._chain_blocks.append(np.asarray(chain).transpose(1, 0, 2))
            self._lnp_blocks.append(np.asarray(lnps).T)
            self.accepted += int(np.asarray(accepted).sum())
            self.total_proposals += block * thin * self.nwalkers
            done += block
            if chain_file is not None:
                np.save(chain_file, self.chain)
            if iterator is not None:
                iterator.update(block)
        if iterator is not None:
            iterator.close()
        return np.asarray(pos), np.asarray(lnp)
