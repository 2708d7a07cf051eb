"""Diagnostics: ESS/R-hat sanity on known processes."""

import numpy as np
import pytest

from causalgpslc_tpu.diagnostics import effective_sample_size, split_rhat


def ar1(rng, rho, n, chains):
    x = np.zeros((chains, n))
    innov = rng.normal(size=(chains, n))
    for t in range(1, n):
        x[:, t] = rho * x[:, t - 1] + np.sqrt(1 - rho**2) * innov[:, t]
    return x


def test_ess_iid_close_to_n():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 1000))
    ess = effective_sample_size(x)
    assert 2000 < ess <= 4000


def test_ess_correlated_much_smaller():
    rng = np.random.default_rng(1)
    x = ar1(rng, 0.95, 2000, 4)
    ess = effective_sample_size(x)
    # AR(1) ESS factor ~ (1-rho)/(1+rho) ~ 1/39
    assert ess < 8000 / 15


def test_ess_constant_chain_degenerates_gracefully():
    x = np.ones((2, 100))
    assert np.isfinite(effective_sample_size(x))


def test_split_rhat_converged_vs_not():
    rng = np.random.default_rng(2)
    good = rng.normal(size=(4, 500))
    assert split_rhat(good) == pytest.approx(1.0, abs=0.05)
    bad = rng.normal(size=(4, 500)) + np.asarray([0.0, 0.0, 5.0, 5.0])[:, None]
    assert split_rhat(bad) > 1.5
