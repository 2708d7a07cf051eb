"""Pallas fused-RBF covariance kernel vs the XLA reference path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from causalgpslc_tpu.ops import process_cov, rbf_kernel_log
from causalgpslc_tpu.ops.pallas import fused_rbf_cov


@pytest.mark.parametrize("n,d", [(5, 2), (128, 1), (130, 3), (257, 5)])
def test_fused_rbf_cov_matches_xla(n, d):
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(n, d)))
    scale, noise = jnp.asarray(1.3), jnp.asarray(0.7)
    ref = process_cov(rbf_kernel_log(z, z, 1.0), 1.3, 0.7)
    got = fused_rbf_cov(z, scale, noise, tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-12)


def test_fused_rbf_cov_float32():
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.normal(size=(100, 2)), dtype=jnp.float32)
    got = fused_rbf_cov(z, jnp.float32(2.0), jnp.float32(0.1), tile=128, interpret=True)
    ref = process_cov(rbf_kernel_log(z, z, jnp.float32(1.0)), jnp.float32(2.0), jnp.float32(0.1))
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fused_rbf_cov_diag_noise_only_on_diagonal():
    z = jnp.zeros((10, 1))
    got = np.asarray(fused_rbf_cov(z, jnp.asarray(1.0), jnp.asarray(0.5), tile=128, interpret=True))
    np.testing.assert_allclose(got, np.ones((10, 10)) + 0.5 * np.eye(10), atol=1e-12)
