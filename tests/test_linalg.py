"""Unit tests for the Cholesky / MVN log-density layer against scipy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from causalgpslc_tpu.ops import (
    chol_logdet,
    chol_solve,
    mvn_logpdf,
    mvn_logpdf_chol,
    mvn_sample,
    safe_cholesky,
    symmetrize,
)


def random_spd(rng, n):
    a = rng.normal(size=(n, n))
    return a @ a.T + n * np.eye(n)


def test_mvn_logpdf_matches_scipy():
    rng = np.random.default_rng(1)
    cov = random_spd(rng, 6)
    x = rng.normal(size=6)
    expected = stats.multivariate_normal(np.zeros(6), cov).logpdf(x)
    got = mvn_logpdf(jnp.asarray(x), jnp.asarray(cov))
    assert float(got) == pytest.approx(expected, rel=1e-10)

    mean = rng.normal(size=6)
    expected = stats.multivariate_normal(mean, cov).logpdf(x)
    got = mvn_logpdf(jnp.asarray(x), jnp.asarray(cov), mean=jnp.asarray(mean))
    assert float(got) == pytest.approx(expected, rel=1e-10)


def test_chol_solve_and_logdet():
    rng = np.random.default_rng(2)
    cov = random_spd(rng, 8)
    b = rng.normal(size=8)
    B = rng.normal(size=(8, 3))
    chol = safe_cholesky(jnp.asarray(cov))
    np.testing.assert_allclose(chol_solve(chol, jnp.asarray(b)), np.linalg.solve(cov, b), atol=1e-9)
    np.testing.assert_allclose(chol_solve(chol, jnp.asarray(B)), np.linalg.solve(cov, B), atol=1e-9)
    assert float(chol_logdet(chol)) == pytest.approx(np.linalg.slogdet(cov)[1], rel=1e-12)


def test_batched_cholesky_logpdf():
    rng = np.random.default_rng(3)
    covs = np.stack([random_spd(rng, 5) for _ in range(4)])
    xs = rng.normal(size=(4, 5))
    chols = safe_cholesky(jnp.asarray(covs))
    got = mvn_logpdf_chol(jnp.asarray(xs), chols)
    expected = [stats.multivariate_normal(np.zeros(5), covs[i]).logpdf(xs[i]) for i in range(4)]
    np.testing.assert_allclose(got, expected, rtol=1e-10)


def test_symmetrize():
    a = jnp.asarray(np.arange(9.0).reshape(3, 3))
    s = symmetrize(a)
    np.testing.assert_allclose(s, np.asarray(s).T)


def test_mvn_sample_moments():
    rng = np.random.default_rng(4)
    cov = random_spd(rng, 3)
    mean = jnp.asarray([1.0, -2.0, 0.5])
    chol = safe_cholesky(jnp.asarray(cov))
    keys = jax.random.split(jax.random.PRNGKey(0), 20000)
    draws = jax.vmap(lambda k: mvn_sample(k, mean, chol))(keys)
    np.testing.assert_allclose(draws.mean(axis=0), mean, atol=0.15)
    np.testing.assert_allclose(np.cov(np.asarray(draws).T), cov, atol=0.4)


def test_float32_jitter_policy():
    # a matrix that is singular at float32 resolution must still factorize
    n = 16
    cov = np.ones((n, n)) + 1e-13 * np.eye(n)
    chol64 = safe_cholesky(jnp.asarray(cov, dtype=jnp.float64))
    assert bool(jnp.all(jnp.isfinite(chol64)))
    chol32 = safe_cholesky(jnp.asarray(cov, dtype=jnp.float32))
    assert bool(jnp.all(jnp.isfinite(chol32)))
