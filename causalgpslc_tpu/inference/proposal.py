"""Moment-matched Inverse-Gamma drift proposal.

Parity target: ``paramProposal`` (``/root/reference/src/proposal.jl:32-41``):
an InvGamma centered at the current value with fixed variance ``drift``
(shape = cur^2/var + 2, scale = cur * (shape - 1)), the Gaussian-drift
analog for positive-support kernel hyperparameters.
"""

from __future__ import annotations

import jax

from ..ops.distributions import inv_gamma_logpdf, inv_gamma_sample

__all__ = ["drift_params", "propose", "proposal_logpdf"]


def drift_params(cur: jax.Array, variance) -> tuple[jax.Array, jax.Array]:
    shape = cur * cur / variance + 2.0
    scale = cur * (shape - 1.0)
    return shape, scale


def propose(key: jax.Array, cur: jax.Array, variance) -> jax.Array:
    shape, scale = drift_params(cur, variance)
    return inv_gamma_sample(key, shape, scale)


def proposal_logpdf(x: jax.Array, center: jax.Array, variance) -> jax.Array:
    """log q(x | center) under the drift proposal centered at ``center``."""
    shape, scale = drift_params(center, variance)
    return inv_gamma_logpdf(x, shape, scale)
