"""Dense linear-algebra ops for GP log-densities and conditioning.

The reference delegates all of this to Julia's LinearAlgebra/LAPACK via
``Distributions.MvNormal`` (Cholesky + logdet per density evaluation) and
``CovWWp \\ Y`` solves (``/root/reference/src/likelihood.jl:42-49``). Here it
is an explicit, batched (vmap-friendly) Cholesky layer so that thousands of
chains x posterior samples factorize as one big batched ``cholesky`` /
``triangular_solve`` that XLA tiles onto the MXU.

Precision policy: the package is dtype-polymorphic. In float64 (CPU parity
tests) no extra jitter is added so the reference's constants
(``sigmaUNoise=1e-13``, ``predictionCovarianceNoise=1e-10``) are honored
exactly; in float32 (TPU speed path) :func:`safe_cholesky` adds a relative
diagonal jitter because the reference's constants are below float32 epsilon.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

__all__ = [
    "symmetrize",
    "add_jitter",
    "stabilize_cov",
    "safe_cholesky",
    "chol_solve",
    "chol_logdet",
    "mvn_logpdf_chol",
    "mvn_logpdf",
    "mvn_sample",
    "use_quantum_free",
    "stacked_mvn_logliks",
]

_F32_REL_JITTER = 1e-5


def symmetrize(a: jax.Array) -> jax.Array:
    """Exact symmetrization ``(A + A.T) / 2`` (reference uses ``Symmetric``)."""
    return 0.5 * (a + jnp.swapaxes(a, -1, -2))


def add_jitter(cov: jax.Array, jitter) -> jax.Array:
    n = cov.shape[-1]
    return cov + jnp.eye(n, dtype=cov.dtype) * jitter


def stabilize_cov(cov: jax.Array, jitter=None) -> jax.Array:
    """Symmetrize + dtype-aware stabilization (shared by both chol backends).

    - explicit ``jitter``: always added.
    - float64: as-is (parity with Julia ``cholesky``).
    - float32: add ``1e-5 * mean(diag)`` — the reference's 1e-13-scale
      diagonal terms vanish in float32, so a relative floor is required.
    """
    cov = symmetrize(cov)
    if jitter is not None:
        return add_jitter(cov, jitter)
    if cov.dtype == jnp.float32:
        diag = jnp.diagonal(cov, axis1=-2, axis2=-1)
        return add_jitter(cov, _F32_REL_JITTER * jnp.mean(diag, axis=-1, keepdims=True)[..., None])
    return cov


def safe_cholesky(cov: jax.Array, jitter=None) -> jax.Array:
    """Lower Cholesky factor with a dtype-aware stabilization policy."""
    return jnp.linalg.cholesky(stabilize_cov(cov, jitter))


def quantum_free_mode(dtype):
    """How to factorize: None (XLA cholesky), "pallas" (blocked driver with
    the unrolled Pallas base kernel), or "xla-base" (blocked driver with an
    XLA base case — CPU-testable, used by CAUSALGPSLC_QFC=cpu).

    On the axon TPU backend every XLA While iteration pays a fixed dispatch
    quantum, and XLA's cholesky/triangular_solve are internally blocked While
    loops (~3 ms each at n=512, any batch size) — the blocked path replaces
    them with straight-line matmuls plus one unrolled Pallas base-case
    kernel. Opt-out with CAUSALGPSLC_QFC=off."""
    import os

    mode = os.environ.get("CAUSALGPSLC_QFC", "auto")
    if mode == "off":
        return None
    if mode == "cpu":
        return "xla-base"
    if dtype == jnp.float64:
        return None  # TPU Pallas has no f64; CPU parity path stays on LAPACK
    try:
        return "pallas" if jax.default_backend() == "tpu" else None
    except Exception:  # pragma: no cover
        return None


def use_quantum_free(dtype) -> bool:
    return quantum_free_mode(dtype) is not None


def stacked_mvn_logliks(covs: jax.Array, targets: jax.Array, jitter=None) -> jax.Array:
    """``log N(targets[i]; 0, covs[i])`` for a stacked (B, n, n) batch.

    The single scoring primitive of the whole sampler: every MH sweep, ESS
    iteration, and block-lp refresh funnels through here. Dispatches to the
    quantum-free blocked factorization on TPU float32, LAPACK-style XLA ops
    elsewhere."""
    covs = stabilize_cov(covs, jitter)
    mode = quantum_free_mode(covs.dtype)
    if mode is not None:
        from .blocked_chol import blocked_cholesky, mvn_logpdf_b

        return mvn_logpdf_b(targets, blocked_cholesky(covs, use_pallas=mode == "pallas"))
    chols = jnp.linalg.cholesky(covs)
    return jax.vmap(mvn_logpdf_chol)(targets, chols)


def chol_solve(chol: jax.Array, b: jax.Array) -> jax.Array:
    """Solve ``A x = b`` given ``A = L L.T``; supports batched ``L`` and matrix b."""
    b2 = b[..., None] if b.ndim == chol.ndim - 1 else b
    y = solve_triangular(chol, b2, lower=True)
    x = solve_triangular(jnp.swapaxes(chol, -1, -2), y, lower=False)
    return x[..., 0] if b.ndim == chol.ndim - 1 else x


def chol_logdet(chol: jax.Array) -> jax.Array:
    """log det(A) from its Cholesky factor."""
    diag = jnp.diagonal(chol, axis1=-2, axis2=-1)
    return 2.0 * jnp.sum(jnp.log(diag), axis=-1)


def mvn_logpdf_chol(x: jax.Array, chol: jax.Array, mean=None) -> jax.Array:
    """N(x; mean, L L.T) log-density from a precomputed Cholesky factor."""
    n = x.shape[-1]
    dev = x if mean is None else x - mean
    alpha = solve_triangular(chol, dev[..., None], lower=True)[..., 0]
    quad = jnp.sum(alpha * alpha, axis=-1)
    ld = chol_logdet(chol)
    cst = n * jnp.log(jnp.asarray(2.0 * jnp.pi, dtype=x.dtype))
    return -0.5 * (quad + ld + cst)


def mvn_logpdf(x: jax.Array, cov: jax.Array, mean=None, jitter=None) -> jax.Array:
    """Dense multivariate-normal log-density (``Distributions.mvnormal`` analog)."""
    return mvn_logpdf_chol(x, safe_cholesky(cov, jitter), mean)


def mvn_sample(key: jax.Array, mean: jax.Array, chol: jax.Array) -> jax.Array:
    """Draw ``mean + L z`` with ``z ~ N(0, I)``; batched over leading dims of L."""
    z = jax.random.normal(key, mean.shape, dtype=mean.dtype)
    return mean + jnp.einsum("...ij,...j->...i", chol, z)
