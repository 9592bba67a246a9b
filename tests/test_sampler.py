"""Ensemble sampler: statistical correctness, reproducibility, chain
contract, posterior-as-prior math."""

import numpy as np
import jax
import jax.numpy as jnp

from cha1_mcmc_tpu.sampler import (
    EnsembleSampler,
    run_ensemble,
    chain_to_priors,
    initialize_walkers,
    last_position,
)


def _gauss_target(mean, cov):
    icov = jnp.asarray(np.linalg.inv(cov), dtype=jnp.float32)
    mean = jnp.asarray(mean, dtype=jnp.float32)

    def lnprob(x):
        d = x - mean
        return -0.5 * d @ icov @ d

    return lnprob


def test_gaussian_target_moments():
    mean = np.array([1.0, -2.0, 0.5])
    cov = np.array([[1.0, 0.5, 0.2], [0.5, 2.0, 0.3], [0.2, 0.3, 0.5]])
    lnprob = _gauss_target(mean, cov)
    W = 64
    key = jax.random.PRNGKey(42)
    pos0 = jax.random.normal(key, (W, 3), dtype=jnp.float32) * 0.1 + jnp.asarray(mean, jnp.float32)
    lnp0 = jax.vmap(lnprob)(pos0)
    chain, lnps, acc, _ = run_ensemble(lnprob, pos0, lnp0, key, nsteps=4000)
    samples = np.asarray(chain[800:]).reshape(-1, 3)
    np.testing.assert_allclose(samples.mean(0), mean, atol=0.08)
    np.testing.assert_allclose(np.cov(samples.T), cov, atol=0.15)
    frac = float(np.asarray(acc).sum()) / (4000 * W)
    assert 0.3 < frac < 0.9  # healthy stretch-move acceptance on a Gaussian


def test_bitwise_reproducibility():
    lnprob = _gauss_target(np.zeros(2), np.eye(2))
    key = jax.random.PRNGKey(0)
    pos0 = jax.random.normal(key, (16, 2), dtype=jnp.float32)
    lnp0 = jax.vmap(lnprob)(pos0)
    c1, *_ = run_ensemble(lnprob, pos0, lnp0, key, nsteps=200)
    c2, *_ = run_ensemble(lnprob, pos0, lnp0, key, nsteps=200)
    assert np.array_equal(np.asarray(c1), np.asarray(c2))


def test_stretch_factor_distribution():
    """z must follow g(z) ~ 1/sqrt(z) on [1/a, a]: E[z] = (a-1)^2/(3a) + 1...
    verified empirically via the known CDF transform used in emcee:
    z = ((a-1)u + 1)^2 / a, u~U(0,1)."""
    a = 2.0
    u = np.random.default_rng(0).uniform(size=200_000)
    z = ((a - 1) * u + 1) ** 2 / a
    assert z.min() >= 1 / a and z.max() <= a
    # analytic mean of z: integral z g(z) dz with normalized g = 7/6 for a=2
    assert np.isclose(z.mean(), 7 / 6, atol=2e-3)


def test_ensemble_sampler_wrapper_contract(tmp_path):
    lnprob = _gauss_target(np.zeros(2), np.eye(2))
    s = EnsembleSampler(lnprob_fn=lnprob, nwalkers=16, ndim=2)
    key = jax.random.PRNGKey(1)
    pos0 = np.random.default_rng(0).normal(size=(16, 2))
    chain_file = str(tmp_path / "chain.npy")
    pos, lnp = s.run_mcmc(pos0, 100, key, checkpoint_every=40, chain_file=chain_file)
    assert s.chain.shape == (16, 100, 2)
    saved = np.load(chain_file)
    assert saved.shape == (16, 100, 2)
    # resume contract (reference inference.py:463)
    np.testing.assert_array_equal(last_position(saved), s.chain[:, -1, :])
    np.testing.assert_allclose(last_position(saved), pos, rtol=1e-6)
    assert 0.0 < s.acceptance_fraction <= 1.0


def test_chain_to_priors_percentile_math():
    """Exact reproduction of the reference's posterior-as-prior math
    (reference inference.py:405-408)."""
    rng = np.random.default_rng(5)
    chain = rng.normal(size=(8, 50, 3)) * [1.0, 2.0, 0.5] + [10.0, -3.0, 0.0]
    means, stds = chain_to_priors(chain)
    psamples = chain.T
    exp_means = np.mean(np.percentile(psamples, 50, axis=1), axis=1)
    p16 = np.percentile(psamples, 16, axis=1).mean(axis=1)
    p84 = np.percentile(psamples, 84, axis=1).mean(axis=1)
    exp_stds = np.abs((p16 - exp_means + p84 - exp_means) / 2.0)
    np.testing.assert_allclose(means, exp_means)
    np.testing.assert_allclose(stds, exp_stds)


def test_initialize_walkers_rejection():
    initial = np.array([5.0, 5.0])
    stds = np.array([1.0, 1.0])
    inside = lambda t: all(4.0 < v < 6.0 for v in t)
    pos = initialize_walkers(initial, stds, 32, inside,
                             rng=np.random.default_rng(0))
    assert pos.shape == (32, 2)
    assert all(inside(p) for p in pos)


def test_infinite_lnprob_walkers_recover():
    """Walkers starting at -inf lnprob must be able to move (proposals with
    finite lnprob always accept since lnpdiff = +inf)."""
    def lnprob(x):
        inside = jnp.all(jnp.abs(x) < 1.0)
        return jnp.where(inside, -0.5 * jnp.sum(x * x), -jnp.inf)

    # Outside walkers at 1.5: stretch proposals toward the inside complement
    # (z in [1/2, 2]) can land inside |x| < 1, so recovery is possible.
    pos0 = jnp.concatenate([
        jnp.full((4, 2), 1.5),                      # outside: -inf
        jax.random.normal(jax.random.PRNGKey(0), (12, 2)) * 0.1])
    lnp0 = jax.vmap(lnprob)(pos0)
    assert np.isinf(np.asarray(lnp0[:4])).all()
    chain, lnps, *_ = run_ensemble(lnprob, pos0, lnp0, jax.random.PRNGKey(2), nsteps=200)
    assert np.isfinite(np.asarray(lnps[-1])).all()


def test_run_ensemble_chains_matches_individual():
    """K vmapped chains equal K individually-run chains with the same keys."""
    from cha1_mcmc_tpu.sampler import run_ensemble_chains

    lnprob = _gauss_target(np.zeros(2), np.eye(2))
    K, W = 3, 16
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(jax.random.PRNGKey(7), K)
    pos0 = jax.random.normal(key, (K, W, 2), dtype=jnp.float32)
    lnp0 = jax.vmap(jax.vmap(lnprob))(pos0)
    chains, lnps, acc, (pos, lnp) = run_ensemble_chains(lnprob, pos0, lnp0, keys, nsteps=50)
    assert np.asarray(chains).shape == (K, 50, W, 2)
    for k in range(K):
        ck, *_ = run_ensemble(lnprob, pos0[k], lnp0[k], keys[k], nsteps=50)
        np.testing.assert_array_equal(np.asarray(chains[k]), np.asarray(ck))


def test_multichain_sampler_pools_chains(tmp_path):
    """MultiChainSampler: the pooled (K*W, S, D) chain equals K separate
    run_ensemble histories stacked chains-contiguous, the .npy/.state.npz
    contract holds, and resume continues exactly."""
    from cha1_mcmc_tpu.sampler import MultiChainSampler

    lnprob = _gauss_target(np.zeros(2), np.eye(2))
    K, W = 2, 8
    pos0 = jax.random.normal(jax.random.PRNGKey(1), (K, W, 2), dtype=jnp.float32)
    chain_file = str(tmp_path / "mc.npy")

    s = MultiChainSampler(lnprob_fn=lnprob, nwalkers=K * W, ndim=2, n_chains=K)
    s.run_mcmc(pos0, 30, jax.random.PRNGKey(5), checkpoint_every=10,
               chain_file=chain_file)
    pooled = s.chain
    assert pooled.shape == (K * W, 30, 2)

    # per-chain recovery: rows [k*W:(k+1)*W] are chain k
    key = jax.random.PRNGKey(5)
    done = 0
    ref_blocks = {k: [] for k in range(K)}
    pos, lnp = pos0, jax.vmap(jax.vmap(lnprob))(pos0)
    while done < 30:
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, K)
        new_pos, new_lnp = [], []
        for k in range(K):
            ck, lk, _, (pk, lpk) = run_ensemble(lnprob, pos[k], lnp[k],
                                                keys[k], nsteps=10)
            ref_blocks[k].append(np.asarray(ck).transpose(1, 0, 2))
            new_pos.append(pk), new_lnp.append(lpk)
        pos, lnp = jnp.stack(new_pos), jnp.stack(new_lnp)
        done += 10
    for k in range(K):
        ref = np.concatenate(ref_blocks[k], axis=1)
        np.testing.assert_array_equal(pooled[k * W:(k + 1) * W], ref)

    # exact resume through the sidecar
    s2 = MultiChainSampler(lnprob_fn=lnprob, nwalkers=K * W, ndim=2, n_chains=K)
    prev = np.load(chain_file)
    s2.preload(prev)
    pos_r, lnp_r, key_r = s2.load_state(chain_file)
    assert pos_r.shape == (K, W, 2)
    s.run_mcmc(pos, 10, key, checkpoint_every=10)  # uninterrupted continuation
    s2.run_mcmc(pos_r, 10, key_r, checkpoint_every=10, lnp0=lnp_r)
    np.testing.assert_array_equal(s.chain, s2.chain)


def test_state_sidecar_path_without_npy_suffix(tmp_path):
    """Resume sidecars pair correctly when the chain path has no .npy
    extension (regression: chain_file[:-4] mangled such paths)."""
    lnprob = _gauss_target(np.zeros(2), np.eye(2))
    s = EnsembleSampler(lnprob_fn=lnprob, nwalkers=8, ndim=2)
    chain_file = str(tmp_path / "chain")  # no extension
    pos0 = np.random.default_rng(0).normal(size=(8, 2))
    s.run_mcmc(pos0, 10, jax.random.PRNGKey(0), checkpoint_every=10,
               chain_file=chain_file)
    import os
    assert os.path.exists(str(tmp_path / "chain.state.npz"))
    assert s.load_state(chain_file) is not None


def test_thin_records_every_thin_th_raw_state():
    """thin=t records exactly the raw trajectory's every t-th state: the
    bulk PRNG layout draws n_raw = nsteps * thin identically in both
    parameterizations, so the thinned chain is a bitwise subsample."""
    lnprob = _gauss_target(np.zeros(2), np.eye(2))
    key = jax.random.PRNGKey(7)
    pos0 = jax.random.normal(key, (16, 2), dtype=jnp.float32)
    lnp0 = jax.vmap(lnprob)(pos0)
    ct, lt, at, (pt, lpt) = run_ensemble(lnprob, pos0, lnp0, key,
                                         nsteps=10, thin=3)
    cr, lr, ar, (pr, lpr) = run_ensemble(lnprob, pos0, lnp0, key, nsteps=30)
    np.testing.assert_array_equal(np.asarray(ct), np.asarray(cr)[2::3])
    np.testing.assert_array_equal(np.asarray(lt), np.asarray(lr)[2::3])
    np.testing.assert_array_equal(np.asarray(at),
                                  np.asarray(ar).reshape(10, 3).sum(1))
    np.testing.assert_array_equal(np.asarray(pt), np.asarray(pr))
    np.testing.assert_array_equal(np.asarray(lpt), np.asarray(lpr))


def test_ensemble_sampler_thin_chain_contract(tmp_path):
    """run_mcmc(thin=t) yields the same recorded chain as thin=1 with
    t x the steps, subsampled — and books t x the proposals."""
    lnprob = _gauss_target(np.zeros(2), np.eye(2))
    key = jax.random.PRNGKey(3)
    pos0 = jax.random.normal(key, (16, 2), dtype=jnp.float32)

    s_thin = EnsembleSampler(lnprob_fn=lnprob, nwalkers=16, ndim=2)
    s_thin.run_mcmc(pos0, 8, key, checkpoint_every=64, thin=2)
    s_raw = EnsembleSampler(lnprob_fn=lnprob, nwalkers=16, ndim=2)
    s_raw.run_mcmc(pos0, 16, key, checkpoint_every=64)
    np.testing.assert_array_equal(s_thin.chain, s_raw.chain[:, 1::2, :])
    assert s_thin.total_proposals == s_raw.total_proposals
    assert s_thin.accepted == s_raw.accepted
