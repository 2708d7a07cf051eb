"""Moment-matched Inverse-Gamma drift proposal (+ optional wide-jump mixture).

Parity target: ``paramProposal`` (``/root/reference/src/proposal.jl:32-41``):
an InvGamma centered at the current value with fixed variance ``drift``
(shape = cur^2/var + 2, scale = cur * (shape - 1)), the Gaussian-drift
analog for positive-support kernel hyperparameters.

New capability (``wide=(variance_wide, prob_wide)``): a two-component
mixture that adds occasional heavy-tailed jumps. For variance_wide >>
cur^2 the moment-matched shape approaches 2, i.e. InvGamma(2, cur) — a
multiplicative jump of roughly 0.3x-5x around the current value. Lengthscale
posteriors in this model family have wide flat plateaus (BASELINE.md,
"golden deep-dive"): the reference's fixed drift=0.5 random walk takes
O((plateau width / step)^2) sweeps to traverse them, which is what freezes
``tyLS`` mixing. The acceptance ratio uses the exact mixture density on both
sides, so this stays a valid MH kernel for the same posterior.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.distributions import inv_gamma_logpdf, inv_gamma_sample

__all__ = ["drift_params", "propose", "proposal_logpdf"]

Wide = Optional[Tuple[float, float]]  # (variance_wide, prob_wide)


def drift_params(cur: jax.Array, variance) -> tuple[jax.Array, jax.Array]:
    shape = cur * cur / variance + 2.0
    scale = cur * (shape - 1.0)
    return shape, scale


def propose(key: jax.Array, cur: jax.Array, variance, wide: Wide = None) -> jax.Array:
    if wide is None:
        shape, scale = drift_params(cur, variance)
        return inv_gamma_sample(key, shape, scale)
    v_wide, p_wide = wide
    k_pick, k_draw = jax.random.split(key)
    use_wide = jax.random.bernoulli(k_pick, p_wide, shape=jnp.shape(cur))
    var = jnp.where(use_wide, jnp.asarray(v_wide, dtype=cur.dtype), variance)
    shape, scale = drift_params(cur, var)
    return inv_gamma_sample(k_draw, shape, scale)


def proposal_logpdf(x: jax.Array, center: jax.Array, variance, wide: Wide = None) -> jax.Array:
    """log q(x | center) under the (possibly mixture) drift proposal."""
    shape, scale = drift_params(center, variance)
    lp = inv_gamma_logpdf(x, shape, scale)
    if wide is None:
        return lp
    v_wide, p_wide = wide
    shape_w, scale_w = drift_params(center, v_wide)
    lp_w = inv_gamma_logpdf(x, shape_w, scale_w)

    if isinstance(p_wide, (int, float)):
        import math

        # boundary probabilities degrade to the single-component densities
        w_narrow = math.log1p(-p_wide) if p_wide < 1.0 else float("-inf")
        w_wide = math.log(p_wide) if p_wide > 0.0 else float("-inf")
    else:
        # traced mixture probability (dynamic proposal parameters): jnp.log
        # maps the p=0 / p=1 boundaries to -inf, matching the static path
        w_narrow = jnp.log1p(-p_wide)
        w_wide = jnp.log(p_wide)
    return jnp.logaddexp(w_narrow + lp, w_wide + lp_w)
