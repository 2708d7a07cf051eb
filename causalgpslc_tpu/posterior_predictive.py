"""Posterior predictive checks (PPC) over the treatment assignment.

Parity target: the reference's intense-test tier (``test/posterior.jl``):
for each posterior sample, re-simulate T from the sampled parameters with
everything *except* T held at its traced value (``generateTreatment``,
``test/posterior.jl:21-27`` — for binary T this keeps ``logitT``, so the
replicate is Bernoulli(expit(logitT)); for continuous T the replicate is a
fresh GP draw), then require >=50% of individuals to match: binary via
rounded replicate means, continuous via a 2-standard-deviation band
(``comparePredictedBinary``/``comparePredictedReal``).

Here the replication is batched across posterior samples with one vmapped
covariance build + Cholesky per sample.
"""

from __future__ import annotations

import jax
import numpy as np

from .models.blocks import t_cov
from .models.spec import GPSLCParams, ModelData, ModelSpec
from .ops.kernels import expit
from .ops.linalg import safe_cholesky

__all__ = ["replicate_treatment", "treatment_ppc_fraction"]


def replicate_treatment(
    key: jax.Array,
    spec: ModelSpec,
    data: ModelData,
    samples: GPSLCParams,
) -> jax.Array:
    """One replicated treatment vector per posterior sample -> (S, n)."""
    n_s = jax.tree.leaves(samples)[0].shape[0]
    keys = jax.random.split(key, n_s)

    if spec.binary_t:
        def one(k, p):
            u = jax.random.uniform(k, (spec.n,), dtype=data.t.dtype)
            return (u < expit(p.logit_t)).astype(data.t.dtype)
    else:
        def one(k, p):
            cov = t_cov(spec, data, p)
            chol = safe_cholesky(cov)
            return chol @ jax.random.normal(k, (spec.n,), dtype=data.t.dtype)

    return jax.vmap(one)(keys, samples)


def treatment_ppc_fraction(
    data: ModelData, spec: ModelSpec, replicates: jax.Array
) -> float:
    """Fraction of individuals whose observed T is consistent with the
    posterior predictive replicates (reference criteria)."""
    reps = np.asarray(replicates)  # (S, n)
    t = np.asarray(data.t)
    avg = reps.mean(axis=0)
    if spec.binary_t:
        matched = np.round(avg) == t
    else:
        sd = reps.std()
        matched = (avg - 2 * sd <= t) & (t <= avg + 2 * sd)
    return float(np.mean(matched))
