"""Scalar distribution primitives used by the GPSLC model family.

Replaces the slice of Gen.jl's distribution library the reference leans on:
``inv_gamma`` (hyperparameter priors and the drift proposal,
``/root/reference/src/model_prior.jl:7-19``, ``src/proposal.jl:32-41``),
``bernoulli`` over ``expit(logitT)`` (``src/model_prior.jl:22-24``) and
``normal`` (``src/estimation.jl:159``). All are pure jittable functions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "inv_gamma_logpdf",
    "inv_gamma_sample",
    "bernoulli_logit_logpdf",
    "normal_logpdf",
]


def inv_gamma_logpdf(x: jax.Array, shape: jax.Array, scale: jax.Array) -> jax.Array:
    """InverseGamma(shape, scale) log-density.

    Matches Julia ``Distributions.InverseGamma`` / Gen ``inv_gamma``:
    ``pdf(x) = scale^shape / Gamma(shape) * x^-(shape+1) * exp(-scale / x)``.
    Returns ``-inf`` for ``x <= 0``.
    """
    x = jnp.asarray(x)
    safe_x = jnp.where(x > 0, x, 1.0)
    lp = (
        shape * jnp.log(scale)
        - jax.lax.lgamma(jnp.asarray(shape, dtype=safe_x.dtype))
        - (shape + 1.0) * jnp.log(safe_x)
        - scale / safe_x
    )
    return jnp.where(x > 0, lp, -jnp.inf)


def inv_gamma_sample(key: jax.Array, shape, scale, sample_shape=(), dtype=None) -> jax.Array:
    """Draw InverseGamma(shape, scale) = scale / Gamma(shape, 1)."""
    shape = jnp.asarray(shape, dtype=dtype)
    g = jax.random.gamma(key, shape, shape=sample_shape or None, dtype=shape.dtype)
    return jnp.asarray(scale, dtype=shape.dtype) / g


def bernoulli_logit_logpdf(t: jax.Array, logit_t: jax.Array) -> jax.Array:
    """``sum_i log Bernoulli(t_i | expit(logit_t_i))``, numerically stable.

    Parity target: the Mapped ``generateBinaryT`` sites
    (``src/model_prior.jl:22-24``, ``src/model_likelihood.jl:31-32``).
    """
    t = jnp.asarray(t, dtype=logit_t.dtype)
    # log sigmoid(l) * t + log sigmoid(-l) * (1 - t)
    return jnp.sum(t * jax.nn.log_sigmoid(logit_t) + (1.0 - t) * jax.nn.log_sigmoid(-logit_t), axis=-1)


def normal_logpdf(x: jax.Array, mean: jax.Array, std: jax.Array) -> jax.Array:
    z = (x - mean) / std
    return -0.5 * z * z - jnp.log(std) - 0.5 * jnp.log(2.0 * jnp.pi)
