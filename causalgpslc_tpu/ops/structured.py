"""O(N) ops for the structured latent-confounder prior SigmaU.

The reference materializes SigmaU as a dense N x N block matrix
(``generateSigmaU``, ``/root/reference/src/utils.jl:17-33``: within-object
blocks of ``cov``, diagonal ``1 + eps``) and pays dense-MVN costs against it
(``generateUfromSigmaU``, ``src/model_likelihood.jl:4-10``).  But each
object's block is ``b * ones(m, m) + a * I`` with ``a = 1 + eps - cov`` and
``b = cov`` — a rank-one perturbation of the identity — so by
Sherman-Morrison every SigmaU operation the sampler needs is closed-form and
O(N):

  logdet(a I + b 1 1ᵀ) = (m-1) log a + log(a + m b)
  yᵀ (a I + b 1 1ᵀ)⁻¹ y = (‖y‖² − b (Σy)² / (a + m b)) / a
  sample: x = √a · z + √b · g · 1   with z ~ N(0, I_m), g ~ N(0, 1)

This removes the N x N SigmaU entirely from the large-N path: U-prior
density evaluations and elliptical-slice ``nu`` draws are vector ops, leaving
the GP covariances over (U, X, T) as the only N x N objects (handled by
``ops/dist_linalg``).  Object blocks of unequal size vectorize with segment
sums over a per-individual object-id array.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "segment_ids_from_counts",
    "sigma_u_logpdf",
    "sigma_u_sample",
]


def segment_ids_from_counts(counts) -> jnp.ndarray:
    """Per-individual object ids from sorted group sizes (host-side)."""
    import numpy as np

    counts = np.asarray(counts, dtype=np.int64)
    return jnp.asarray(np.repeat(np.arange(len(counts)), counts))


def _block_params(counts, scale, eps, cov, dtype):
    """(a, b, m) per block after multiplying SigmaU by ``scale`` (= uNoise)."""
    m = jnp.asarray(counts, dtype=dtype)
    a = scale * jnp.asarray(1.0 + eps - cov, dtype=dtype)
    b = scale * jnp.asarray(cov, dtype=dtype)
    return a, b, m


def sigma_u_logpdf(y, seg_ids, counts, scale, *, eps=1e-13, cov=1.0):
    """``log N(y; 0, scale * SigmaU)`` in O(N).

    Args:
      y: (N,) or (K, N) stacked vectors (e.g. the nU confounder columns).
      seg_ids: (N,) object id per individual (``segment_ids_from_counts``).
      counts: (n_obj,) static block sizes.
      scale: the uNoise multiplier (``uCov = SigmaU * uNoise``,
        ``src/inference.jl:48``).
    """
    y = jnp.asarray(y)
    squeeze = y.ndim == 1
    yk = y[None, :] if squeeze else y
    dtype = yk.dtype
    n = yk.shape[-1]
    n_obj = len(counts)
    a, b, m = _block_params(counts, scale, eps, cov, dtype)

    seg_sums = jax.vmap(
        lambda v: jax.ops.segment_sum(v, seg_ids, num_segments=n_obj)
    )(yk)  # (K, n_obj)
    sq = jnp.sum(yk * yk, axis=-1)  # (K,)
    quad = (sq - jnp.sum(b * seg_sums**2 / (a + m * b), axis=-1)) / a
    logdet = jnp.sum((m - 1.0) * jnp.log(a) + jnp.log(a + m * b))
    cst = n * jnp.log(jnp.asarray(2.0 * jnp.pi, dtype=dtype))
    out = -0.5 * (quad + logdet + cst)
    return out[0] if squeeze else out


def sigma_u_sample(key, seg_ids, counts, scale, *, eps=1e-13, cov=1.0, dtype=jnp.float64):
    """One draw from ``N(0, scale * SigmaU)`` in O(N) (ESS ``nu`` draws)."""
    n = seg_ids.shape[0]
    n_obj = len(counts)
    a, b, _ = _block_params(counts, scale, eps, cov, dtype)
    kz, kg = jax.random.split(key)
    z = jax.random.normal(kz, (n,), dtype=dtype)
    g = jax.random.normal(kg, (n_obj,), dtype=dtype)
    return jnp.sqrt(a) * z + jnp.sqrt(b) * g[seg_ids]
