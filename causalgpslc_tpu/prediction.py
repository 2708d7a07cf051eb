"""Counterfactual dose-response sweep over a grid of interventions.

Parity target: ``predictCounterfactualEffects`` (``/root/reference/src/prediction.jl:23-36``).
The reference loops ``fidelity + 1`` interventions serially; the grid is
embarrassingly parallel, so here each grid point's batched conditioning runs
under ``lax.map`` (sequential in doT, fully batched over posterior samples
within each point, bounding peak memory at one (S, n, n) mixture), and the
grid axis is the natural extra sharding axis for multi-chip runs.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import estimation
from .api import GPSLCObject

__all__ = ["predict_counterfactual_effects"]


def predict_counterfactual_effects(
    g: GPSLCObject,
    n_samples_per_mixture: int,
    fidelity: int = 100,
    min_do_t: Optional[float] = None,
    max_do_t: Optional[float] = None,
    seed: int = 1,
):
    """ITE samples across a doT grid.

    Returns ``(ite, do_t_range)`` with ``ite`` of shape
    ``(d, n, S * n_samples_per_mixture)`` and ``d = fidelity + 1`` grid points
    spanning ``[min(T), max(T)]`` by default — matching the reference's
    ``doTrange = minDoT : delta/fidelity : maxDoT``.
    """
    t_host = np.asarray(g.data.t)
    lo = float(t_host.min()) if min_do_t is None else float(min_do_t)
    hi = float(t_host.max()) if max_do_t is None else float(max_do_t)
    do_t_range = jnp.linspace(lo, hi, fidelity + 1, dtype=g.data.t.dtype)

    samples = g.retained_samples()
    noise = g.hyperparams.prediction_covariance_noise
    base_key = jax.random.PRNGKey(seed)

    def one_do_t(args):
        i, do_t = args
        mean_ites, cov_ites = estimation.ite_distributions(g.spec, g.data, samples, do_t, noise)
        key = jax.random.fold_in(base_key, i)
        return estimation.ite_samples(key, mean_ites, cov_ites, n_samples_per_mixture)

    idx = jnp.arange(do_t_range.shape[0])
    ite = jax.lax.map(one_do_t, (idx, do_t_range))
    return np.asarray(ite), np.asarray(do_t_range)
