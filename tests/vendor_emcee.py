"""Vendored reconstruction of emcee 3.1.6's ensemble sampler core.

The reference pins emcee==3.1.6 (reference requirements.txt:8) and drives
it via EnsembleSampler(..., moves=default StretchMove) at
reference inference.py:455-473. emcee cannot be pip-installed in this
image, so this module reconstructs — class for class, following the
published structure of emcee/moves/red_blue.py, emcee/moves/stretch.py
and emcee/ensemble.py (MIT-licensed) — exactly the code paths that
single-process run exercises:

  * ``StretchMove.get_proposal``: z = ((a-1)u + 1)^2 / a drawn once per
    walker in the moving set, proposal q = c[r] - (c[r] - s) * z,
    log factor (ndim - 1) log z.
  * ``RedBlueMove.propose``: walkers split by index parity, the split
    assignment shuffled per step (randomize_split=True default),
    the two halves moved *sequentially* (the second half sees the first
    half's accepted updates), acceptance ln U < factor + dlnp.
  * ``EnsembleSampler.run_mcmc``-lite: the per-step loop recording the
    full chain, with all randomness drawn from one np.random.RandomState
    in emcee's call order (shuffle, then per-split rand/randint/rand).

It exists so the sampler parity suite can test against emcee's published
semantics rather than only against the independently hand-rolled oracle
in tests/test_convergence.py (which could in principle share a
misreading). Behavioral deviations from upstream: none intended; the
live-dangerously vectorize path, blobs, backends, tune and parallel pools
are out of scope (the reference uses none of them for the move math).
"""

from __future__ import annotations

import numpy as np

__all__ = ["StretchMove", "EnsembleSampler"]


class State:
    """emcee.state.State reduced to coords + log_prob."""

    def __init__(self, coords, log_prob=None):
        self.coords = np.atleast_2d(np.asarray(coords, dtype=np.float64))
        self.log_prob = None if log_prob is None else np.asarray(log_prob)


class StretchMove:
    """emcee/moves/stretch.py: the affine-invariant stretch move
    (Goodman & Weare 2010), a=2 default."""

    def __init__(self, a=2.0):
        self.a = a
        self.nsplits = 2
        self.randomize_split = True

    def get_proposal(self, s, c, random):
        c = np.concatenate(c, axis=0)
        Ns, Nc = len(s), len(c)
        ndim = s.shape[1]
        zz = ((self.a - 1.0) * random.rand(Ns) + 1) ** 2.0 / self.a
        factors = (ndim - 1.0) * np.log(zz)
        rint = random.randint(Nc, size=(Ns,))
        return c[rint] - (c[rint] - s) * zz[:, None], factors

    # emcee/moves/red_blue.py:RedBlueMove.propose
    def propose(self, log_prob_fn, state, random):
        nwalkers, ndim = state.coords.shape
        accepted = np.zeros(nwalkers, dtype=bool)
        all_inds = np.arange(nwalkers)
        inds = all_inds % self.nsplits
        if self.randomize_split:
            random.shuffle(inds)
        for split in range(self.nsplits):
            S1 = inds == split
            sets = [state.coords[inds == j] for j in range(self.nsplits)]
            s = sets[split]
            c = sets[:split] + sets[split + 1:]
            q, factors = self.get_proposal(s, c, random)
            new_log_probs = np.array([log_prob_fn(x) for x in q])
            lnpdiff = factors + new_log_probs - state.log_prob[all_inds[S1]]
            accepted[S1] = lnpdiff > np.log(random.rand(len(lnpdiff)))
            # RedBlueMove.update: fold accepted proposals back in
            j = 0
            for i in np.where(S1)[0]:
                if accepted[i]:
                    state.coords[i] = q[j]
                    state.log_prob[i] = new_log_probs[j]
                j += 1
        return state, accepted


class EnsembleSampler:
    """emcee/ensemble.py reduced to the serial sample loop."""

    def __init__(self, nwalkers, ndim, log_prob_fn, moves=None, seed=None):
        self.nwalkers = nwalkers
        self.ndim = ndim
        self.log_prob_fn = log_prob_fn
        self._move = moves or StretchMove()
        self._random = np.random.RandomState(seed)

    def run_mcmc(self, initial_state, nsteps):
        """Returns (chain (nsteps, W, D), accepted-counts (W,))."""
        state = State(np.array(initial_state, dtype=np.float64))
        state.log_prob = np.array(
            [self.log_prob_fn(x) for x in state.coords])
        chain = np.empty((nsteps, self.nwalkers, self.ndim))
        naccepted = np.zeros(self.nwalkers)
        for step in range(nsteps):
            state, accepted = self._move.propose(
                self.log_prob_fn, state, self._random)
            naccepted += accepted
            chain[step] = state.coords
        self.acceptance_fraction = naccepted / nsteps
        return chain, naccepted
