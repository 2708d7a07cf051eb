"""Counterfactual dose-response sweep over a grid of interventions.

Parity target: ``predictCounterfactualEffects`` (``/root/reference/src/prediction.jl:23-36``).
The reference loops ``fidelity + 1`` interventions serially; the grid is
embarrassingly parallel, so here each grid point's batched conditioning runs
under ``lax.map`` (sequential in doT, fully batched over posterior samples
within each point, bounding peak memory at one (S, n, n) mixture), and the
grid axis is the natural extra sharding axis for multi-chip runs.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from . import estimation
from .api import GPSLCObject

__all__ = ["predict_counterfactual_effects"]

GRID_AXIS = "dot_grid"


def predict_counterfactual_effects(
    g: GPSLCObject,
    n_samples_per_mixture: int,
    fidelity: int = 100,
    min_do_t: Optional[float] = None,
    max_do_t: Optional[float] = None,
    seed: int = 1,
    mesh: Optional[Mesh] = None,
):
    """ITE samples across a doT grid.

    Returns ``(ite, do_t_range)`` with ``ite`` of shape
    ``(d, n, S * n_samples_per_mixture)`` and ``d = fidelity + 1`` grid points
    spanning ``[min(T), max(T)]`` by default — matching the reference's
    ``doTrange = minDoT : delta/fidelity : maxDoT``.

    With ``mesh`` (any 1-D mesh), the grid shards across devices — the
    reference's serial sweep (``src/prediction.jl:31-34``) is embarrassingly
    parallel; each device conditions its grid shard with the posterior mixture
    replicated.
    """
    t_host = np.asarray(g.data.t)
    lo = float(t_host.min()) if min_do_t is None else float(min_do_t)
    hi = float(t_host.max()) if max_do_t is None else float(max_do_t)
    d = fidelity + 1
    do_t_range = jnp.linspace(lo, hi, d, dtype=g.data.t.dtype)

    samples = g.retained_samples()
    noise = g.hyperparams.prediction_covariance_noise
    base_key = jax.random.PRNGKey(seed)

    def one_do_t(args, samples, data):
        i, do_t = args
        mean_ites, cov_ites = estimation.ite_distributions(g.spec, data, samples, do_t, noise)
        key = jax.random.fold_in(base_key, i)
        return estimation.ite_samples(key, mean_ites, cov_ites, n_samples_per_mixture)

    idx = jnp.arange(d)
    if mesh is None:
        ite = jax.lax.map(partial(one_do_t, samples=samples, data=g.data), (idx, do_t_range))
        return np.asarray(ite), np.asarray(do_t_range)

    # shard the grid axis; replicate posterior samples and data
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    d_pad = -(-d // n_dev) * n_dev
    idx_p = jnp.pad(idx, (0, d_pad - d))
    do_p = jnp.pad(do_t_range, (0, d_pad - d))
    rep = jax.tree.map(lambda _: P(), (samples, g.data))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), rep[0], rep[1]),
        out_specs=P(axis),
    )
    def sweep(idx_local, do_local, samples, data):
        return jax.lax.map(partial(one_do_t, samples=samples, data=data), (idx_local, do_local))

    ite = sweep(idx_p, do_p, samples, g.data)
    return np.asarray(ite)[:d], np.asarray(do_t_range)
