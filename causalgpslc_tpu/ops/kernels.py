"""Covariance-kernel construction ops.

TPU-first re-design of the reference's kernel layer
(``/root/reference/src/kernel.jl:13-59``): the reference builds every n x n
RBF log-kernel with a scalar double loop (``rbfKernelLog``,
``src/kernel.jl:24-42``); here the same math is a vectorized pairwise
computation with two execution strategies:

- ``diff``: broadcasted ``(n, m, d)`` squared differences — exact, cheap for
  the small ``d`` (d = nU or nX, single digits) that GPSLC uses, and free of
  cancellation error. Best for small/medium ``n``.
- ``dot``: the Gram-matrix identity ``|zi - zj|^2 = |zi|^2 + |zj|^2 - 2 zi.zj``
  which routes the O(n^2 d) work through a single matmul on the MXU and uses
  O(n^2) memory instead of O(n^2 d). Best for large ``n``.

All kernels are *log-space*: additive combination of log-kernels is the
product of RBF kernels over (U, X, T), exactly as the reference composes
``uyCovLog .+ xyCovLog .+ tyCovLog`` (``src/model_likelihood.jl:83-91``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "rbf_kernel_log",
    "rbf_kernel_log_scalar",
    "process_cov",
    "logit",
    "expit",
]

# Above this many broadcasted elements (n*m*d) the `dot` strategy is used.
_DIFF_ELEMENT_BUDGET = 1 << 24


def _as_2d(x: jax.Array) -> jax.Array:
    """Promote a length-n vector to an (n, 1) matrix of 1-d points."""
    x = jnp.asarray(x)
    if x.ndim == 1:
        return x[:, None]
    if x.ndim != 2:
        raise ValueError(f"rbf inputs must be 1-D or 2-D, got shape {x.shape}")
    return x


def rbf_kernel_log_scalar(xi: jax.Array, xj: jax.Array, ls: jax.Array) -> jax.Array:
    """Log-RBF between two points: ``-sum((xi - xj)^2 / ls^2)``.

    Parity target: ``rbfKernelLogScalar`` (``src/kernel.jl:13-19``).
    """
    xi = jnp.asarray(xi)
    xj = jnp.asarray(xj)
    ls = jnp.asarray(ls)
    return -jnp.sum((xi - xj) ** 2 / ls**2)


def rbf_kernel_log(
    x1: jax.Array,
    x2: jax.Array,
    ls: jax.Array,
    *,
    method: str = "auto",
) -> jax.Array:
    """Pairwise log-RBF matrix ``K[i, j] = -sum_k (x1[i,k] - x2[j,k])^2 / ls[k]^2``.

    Args:
      x1: ``(n,)`` or ``(n, d)`` points.
      x2: ``(m,)`` or ``(m, d)`` points.
      ls: scalar or ``(d,)`` ARD lengthscales.
      method: ``"diff"`` (broadcasted differences), ``"dot"`` (MXU Gram
        matmul), or ``"auto"``.

    Replaces the scalar double loops at ``src/kernel.jl:24-42``.
    """
    z1 = _as_2d(x1)
    z2 = _as_2d(x2)
    ls = jnp.asarray(ls)
    if ls.ndim == 0:
        ls = jnp.full((z1.shape[-1],), ls, dtype=z1.dtype)
    z1 = z1 / ls
    z2 = z2 / ls

    n, d = z1.shape
    m = z2.shape[0]
    if method == "auto":
        method = "diff" if n * m * d <= _DIFF_ELEMENT_BUDGET else "dot"

    if method == "diff":
        diff = z1[:, None, :] - z2[None, :, :]
        return -jnp.sum(diff * diff, axis=-1)
    if method == "dot":
        sq1 = jnp.sum(z1 * z1, axis=-1)
        sq2 = jnp.sum(z2 * z2, axis=-1)
        # HIGHEST matmul precision: the TPU default (bfloat16 MXU passes)
        # carries ~0.4% relative error, which for large-coordinate points
        # (the large-N path's 1e4-scale sentinel pads: |z|^2 ~ 1e12) swamps
        # the true squared distance (~1e8) — the clamp below then floors it
        # to 0 and a padded point acquires FULL covariance with every real
        # point, destroying positive-definiteness. f32 accumulation keeps
        # the cancellation error at ~1e5, 1000x below the signal.
        cross = jnp.matmul(z1, z2.T, precision=jax.lax.Precision.HIGHEST)
        sq = sq1[:, None] + sq2[None, :] - 2.0 * cross
        # Cancellation can leave tiny negatives; the true value is <= 0 anyway.
        return -jnp.maximum(sq, 0.0)
    raise ValueError(f"unknown method {method!r}")


def process_cov(log_cov: jax.Array, scale: jax.Array, noise=None) -> jax.Array:
    """``exp(log_cov) * scale (+ noise * I)``.

    Parity target: ``processCov`` (``src/kernel.jl:53-59``).
    """
    cov = jnp.exp(log_cov) * scale
    if noise is None:
        return cov
    n = cov.shape[-1]
    return cov + jnp.eye(n, dtype=cov.dtype) * noise


def logit(p: jax.Array) -> jax.Array:
    """Map a probability in (0, 1) to the reals (``src/kernel.jl:46``)."""
    p = jnp.asarray(p)
    return jnp.log(p) - jnp.log1p(-p)


def expit(x: jax.Array) -> jax.Array:
    """Numerically stable inverse of :func:`logit` (``src/kernel.jl:49``)."""
    return jax.nn.sigmoid(x)
