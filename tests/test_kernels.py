"""Unit tests for the kernel ops layer.

Golden values mirror the reference's kernel suite (`test/kernel.jl`):
the "magic matrix" -[0 8 32; 8 0 8; 32 8 0] hand-computed RBF case
(`test/kernel.jl:56-67`), processCov scale/noise cases (`:69-90`) and
logit/expit (`:91-96`).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from causalgpslc_tpu.ops import (
    expit,
    logit,
    process_cov,
    rbf_kernel_log,
    rbf_kernel_log_scalar,
)

MAGIC = -np.array([[0.0, 8.0, 32.0], [8.0, 0.0, 8.0], [32.0, 8.0, 0.0]])


def test_rbf_scalar():
    assert rbf_kernel_log_scalar(jnp.array([1.0]), jnp.array([3.0]), jnp.array([1.0])) == -4.0
    # ARD: per-dim lengthscales
    v = rbf_kernel_log_scalar(jnp.array([1.0, 2.0]), jnp.array([3.0, 0.0]), jnp.array([2.0, 1.0]))
    assert v == pytest.approx(-(4.0 / 4.0 + 4.0 / 1.0))


def test_rbf_magic_matrix_1d():
    # points 1,3,5 with lengthscale 1/sqrt(2): -(xi-xj)^2 * 2
    x = jnp.array([1.0, 3.0, 5.0])
    ls = 1.0 / np.sqrt(2.0)
    np.testing.assert_allclose(rbf_kernel_log(x, x, ls), MAGIC, atol=1e-12)


def test_rbf_matrix_matches_scalar_loop():
    rng = np.random.default_rng(0)
    x1 = rng.normal(size=(7, 3))
    x2 = rng.normal(size=(5, 3))
    ls = np.abs(rng.normal(size=3)) + 0.5
    expected = np.zeros((7, 5))
    for i in range(7):
        for j in range(5):
            expected[i, j] = -np.sum((x1[i] - x2[j]) ** 2 / ls**2)
    for method in ("diff", "dot"):
        got = rbf_kernel_log(jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(ls), method=method)
        np.testing.assert_allclose(got, expected, atol=1e-9)


def test_rbf_scalar_lengthscale_broadcast():
    x = jnp.array([[0.0, 0.0], [1.0, 1.0]])
    got = rbf_kernel_log(x, x, 2.0)
    np.testing.assert_allclose(got, [[0.0, -0.5], [-0.5, 0.0]], atol=1e-12)


def test_process_cov():
    log_cov = jnp.asarray(MAGIC)
    cov = process_cov(log_cov, 2.0, 0.0)
    np.testing.assert_allclose(cov, np.exp(MAGIC) * 2.0, atol=1e-12)
    cov = process_cov(log_cov, 1.0, 3.0)
    np.testing.assert_allclose(cov, np.exp(MAGIC) + 3.0 * np.eye(3), atol=1e-12)
    # no-noise overload (src/kernel.jl:57-59)
    np.testing.assert_allclose(process_cov(log_cov, 3.0), np.exp(MAGIC) * 3.0, atol=1e-12)


def test_logit_expit():
    assert float(logit(0.5)) == 0.0
    assert float(expit(0.0)) == 0.5
    for p in (0.01, 0.3, 0.77, 0.99):
        assert float(expit(logit(p))) == pytest.approx(p, abs=1e-12)
