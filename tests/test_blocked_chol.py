"""Tests for the quantum-free blocked Cholesky layer (ops/blocked_chol.py).

The Pallas base-case kernel runs in interpreter mode on CPU; the XLA-base
variant (``use_pallas=False``) is what CAUSALGPSLC_QFC=cpu uses in
integration. Both must match LAPACK to near machine precision.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg
import scipy.stats

from causalgpslc_tpu.ops.blocked_chol import (
    CholFactors,
    _inv_lower,
    blocked_cholesky,
    chol_solve_b,
    mvn_logpdf_b,
    tri_solve_lower,
    tri_solve_upper,
)


def _spd(rng, b, n):
    a = rng.normal(size=(b, n, n))
    return a @ np.swapaxes(a, -1, -2) / n + 2.0 * np.eye(n)


@pytest.mark.parametrize("n", [40, 128, 200, 500])
@pytest.mark.parametrize("use_pallas", [False, True])
def test_factor_solve_logpdf_match_lapack(n, use_pallas):
    rng = np.random.default_rng(0)
    b = 3
    cov = _spd(rng, b, n)
    y = rng.normal(size=(b, n))

    f = blocked_cholesky(jnp.asarray(cov), use_pallas=use_pallas, interpret=use_pallas)
    l_ref = np.linalg.cholesky(cov)
    np.testing.assert_allclose(np.asarray(f.l)[:, :n, :n], l_ref, atol=1e-10)

    fwd = np.asarray(tri_solve_lower(f, jnp.asarray(y)))
    fwd_ref = np.stack(
        [scipy.linalg.solve_triangular(l_ref[i], y[i], lower=True) for i in range(b)]
    )
    np.testing.assert_allclose(fwd, fwd_ref, atol=1e-9)

    bwd = np.asarray(tri_solve_upper(f, jnp.asarray(y)))
    bwd_ref = np.stack(
        [scipy.linalg.solve_triangular(l_ref[i].T, y[i], lower=False) for i in range(b)]
    )
    np.testing.assert_allclose(bwd, bwd_ref, atol=1e-9)

    sol = np.asarray(chol_solve_b(f, jnp.asarray(y)))
    sol_ref = np.stack([np.linalg.solve(cov[i], y[i]) for i in range(b)])
    np.testing.assert_allclose(sol, sol_ref, atol=1e-8)

    lp = np.asarray(mvn_logpdf_b(jnp.asarray(y), f))
    lp_ref = np.stack(
        [scipy.stats.multivariate_normal(np.zeros(n), cov[i]).logpdf(y[i]) for i in range(b)]
    )
    np.testing.assert_allclose(lp, lp_ref, atol=1e-6)


def test_newton_triangular_inverse_exact():
    rng = np.random.default_rng(1)
    l = np.tril(rng.normal(size=(4, 128, 128))) + 4.0 * np.eye(128)
    inv = np.asarray(_inv_lower(jnp.asarray(l)))
    np.testing.assert_allclose(inv, np.linalg.inv(l), atol=1e-9)


def test_vmap_flattens_into_kernel_batch():
    """vmapped factorizations must agree with the flat path (the custom_vmap
    rule collapses chain batches into one launch)."""
    rng = np.random.default_rng(2)
    c, b, n = 4, 3, 200
    cov = _spd(np.random.default_rng(2), c * b, n).reshape(c, b, n, n)
    y = rng.normal(size=(c, b, n))

    def per_chain(cov_c, y_c):
        return mvn_logpdf_b(y_c, blocked_cholesky(cov_c, use_pallas=False))

    lp_vmap = np.asarray(jax.vmap(per_chain)(jnp.asarray(cov), jnp.asarray(y)))
    lp_flat = np.asarray(
        mvn_logpdf_b(
            jnp.asarray(y.reshape(c * b, n)),
            blocked_cholesky(jnp.asarray(cov.reshape(c * b, n, n)), use_pallas=False),
        )
    ).reshape(c, b)
    np.testing.assert_allclose(lp_vmap, lp_flat, rtol=1e-12)


def test_stacked_mvn_logliks_dispatch_parity(monkeypatch):
    """CAUSALGPSLC_QFC=cpu (blocked) must match the XLA cholesky path."""
    from causalgpslc_tpu.ops import linalg

    rng = np.random.default_rng(3)
    cov = jnp.asarray(_spd(rng, 5, 150), jnp.float32)
    y = jnp.asarray(rng.normal(size=(5, 150)), jnp.float32)

    monkeypatch.setenv("CAUSALGPSLC_QFC", "off")
    lp_xla = np.asarray(linalg.stacked_mvn_logliks(cov, y))
    monkeypatch.setenv("CAUSALGPSLC_QFC", "cpu")
    lp_qf = np.asarray(linalg.stacked_mvn_logliks(cov, y))
    np.testing.assert_allclose(lp_qf, lp_xla, rtol=1e-4)


def test_batched_leading_dims_and_unbatched_factor_broadcast():
    """mvn_logpdf_b broadcasts a shared (unbatched) factor over batched rhs
    (the U-prior sum over confounder columns uses this)."""
    rng = np.random.default_rng(4)
    n = 150
    cov = _spd(rng, 1, n)[0]
    y = rng.normal(size=(6, n))
    f = blocked_cholesky(jnp.asarray(cov), use_pallas=False)
    lp = np.asarray(mvn_logpdf_b(jnp.asarray(y), f))
    mvn = scipy.stats.multivariate_normal(np.zeros(n), cov)
    np.testing.assert_allclose(lp, mvn.logpdf(y), atol=1e-6)


def test_base_mode_unrolled_matches_pallas_kernel():
    """The straight-line XLA base (`CAUSALGPSLC_CHOL_BASE=unrolled`, the TPU
    default since round 4 — no Pallas grid-step quanta) is the SAME
    right-looking sub-panel algorithm as the Pallas kernel; factors must
    agree to rounding (bit-identical on TPU, same-order f64 here)."""
    from causalgpslc_tpu.ops import blocked_chol as bc

    rng = np.random.default_rng(7)
    d = _spd(rng, 4, 128)
    got_u = np.asarray(bc._chol_base_unrolled_xla(jnp.asarray(d)))
    got_p = np.asarray(bc._chol_base_call(jnp.asarray(d), interpret=True))
    np.testing.assert_allclose(got_u, got_p, rtol=1e-13, atol=1e-13)
    np.testing.assert_allclose(got_u, np.linalg.cholesky(d), atol=1e-10)
