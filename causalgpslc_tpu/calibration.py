"""Simulation-based calibration (SBC) for the GPSLC sampler.

The reference ships an SBC suite excluded from CI (``test/sbc.jl:137-195``)
whose acceptance logic is inverted — ``isApproxUniform`` returns true when
the KS p-value is *small* (``test/sbc.jl:62-68``), i.e. it passes on
non-uniform ranks. Per SURVEY.md §4/§7 this module implements SBC correctly
(Talts et al. 2018): draw ground-truth parameters and synthetic data from the
prior, run the posterior sampler, rank the truth among (thinned) posterior
draws; over many replications the ranks must be uniform, judged by a
chi-squared/KS test with Bonferroni correction across monitored sites.

TPU note: replications are embarrassingly parallel — each replication is an
independent chain, so the whole SBC study is one chain-batched ``run_mcmc``
call with per-replication synthetic datasets... except the data differs per
replication, so datasets batch through ``vmap`` over the data pytree too.
Round-1 implementation runs replications in Python (datasets are tiny);
batched-data vmap is a planned optimization.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats as sps

from .hyperparameters import HyperParameters, default_prior_parameters
from .inference.gibbs import run_mcmc_jit
from .models.blocks import t_cov, y_cov
from .models.spec import ModelData, ModelSpec
from .models.state import hyper_fields, init_from_prior
from .ops.kernels import expit
from .ops.linalg import safe_cholesky

__all__ = ["SBCResult", "simulate_dataset", "run_sbc", "rank_uniformity_pvalues"]


@dataclasses.dataclass
class SBCResult:
    ranks: dict  # site -> (n_replications,) int ranks in [0, n_samples]
    n_posterior: int
    pvalues: dict
    passed: bool


def simulate_dataset(key: jax.Array, spec: ModelSpec, priors: dict, sigma_u, dtype=jnp.float64):
    """Draw ground-truth params from the prior and synthesize (X, T, Y)."""
    k_p, k_x, k_t, k_y, k_b = jax.random.split(key, 5)
    shell = ModelData(
        t=jnp.zeros((spec.n,), dtype),
        y=jnp.zeros((spec.n,), dtype),
        x=jnp.zeros((spec.n, spec.n_x), dtype) if spec.has_x else None,
        sigma_u=sigma_u,
    )
    params = init_from_prior(k_p, spec, priors, shell, dtype=dtype)

    x = None
    if spec.has_x:
        if spec.has_u:
            from .models.blocks import x_cov_all

            covs = x_cov_all(shell, params)
            chols = safe_cholesky(covs)
            z = jax.random.normal(k_x, (spec.n_x, spec.n), dtype=dtype)
            x = jnp.einsum("kij,kj->ki", chols, z).T
        else:
            x = jax.random.normal(k_x, (spec.n, spec.n_x), dtype=dtype)
        shell = shell._replace(x=x)

    tc = t_cov(spec, shell, params)
    tchol = safe_cholesky(tc)
    latent_t = tchol @ jax.random.normal(k_t, (spec.n,), dtype=dtype)
    if spec.binary_t:
        t = (jax.random.uniform(k_b, (spec.n,), dtype=dtype) < expit(latent_t)).astype(dtype)
        params = params._replace(logit_t=latent_t)
    else:
        t = latent_t
    shell = shell._replace(t=t)

    ychol = safe_cholesky(y_cov(spec, shell, params))
    y = ychol @ jax.random.normal(k_y, (spec.n,), dtype=dtype)
    data = shell._replace(y=y)
    return params, data


_DEFAULT_MONITOR = ["ty_ls", "y_noise", "y_scale"]


def run_sbc(
    spec: ModelSpec,
    hp: HyperParameters,
    n_replications: int = 40,
    priors: Optional[dict] = None,
    monitor: Optional[list[str]] = None,
    seed: int = 0,
    alpha: float = 0.05,
    sigma_u=None,
    dtype=jnp.float64,
) -> SBCResult:
    """Run SBC for one model variant; ranks must be uniform if the sampler
    targets the correct posterior.

    ``dtype=jnp.float32`` calibrates the TPU speed path (relative-jitter
    ``stabilize_cov``; combine with speed-path hyperparameters and the
    ``CAUSALGPSLC_QFC`` env to exercise the exact bench configuration)."""
    priors = priors or default_prior_parameters()
    monitor = [m for m in (monitor or _DEFAULT_MONITOR) if m in hyper_fields(spec)]
    if spec.has_u and sigma_u is None:
        block = np.kron(np.eye(max(spec.n // 4, 1)), np.ones((4, 4)))[: spec.n, : spec.n]
        sigma_u = jnp.asarray(block + 1e-13 * np.eye(spec.n), dtype=dtype)
    elif sigma_u is not None:
        sigma_u = jnp.asarray(sigma_u, dtype=dtype)

    ranks = {m: [] for m in monitor}
    n_retained = hp.n_posterior_samples
    for r in range(n_replications):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), r)
        k_sim, k_run = jax.random.split(key)
        truth, data = simulate_dataset(k_sim, spec, priors, sigma_u, dtype=dtype)
        samples, _, _ = run_mcmc_jit(k_run, spec, priors, data, hp)
        idx = np.asarray(hp.retained_indices())
        for m in monitor:
            true_val = float(np.asarray(getattr(truth, m)).reshape(-1)[0])
            draws = np.asarray(getattr(samples, m))[:, idx].reshape(-1, *np.asarray(getattr(truth, m)).shape)
            draws = draws.reshape(draws.shape[0], -1)[:, 0]
            ranks[m].append(int(np.sum(draws < true_val)))

    ranks = {m: np.asarray(v) for m, v in ranks.items()}
    pvalues = rank_uniformity_pvalues(ranks, n_retained * hp.n_chains)
    # Bonferroni across monitored sites: all must be non-rejected
    threshold = alpha / max(len(monitor), 1)
    passed = all(p > threshold for p in pvalues.values())
    return SBCResult(ranks=ranks, n_posterior=n_retained * hp.n_chains, pvalues=pvalues, passed=passed)


def rank_uniformity_pvalues(ranks: dict, n_posterior: int) -> dict:
    """KS test of ranks against the discrete uniform on {0..n_posterior}."""
    out = {}
    for m, r in ranks.items():
        # continuity correction: jitter ranks into [0, 1)
        u = (r + np.random.default_rng(0).uniform(size=r.shape)) / (n_posterior + 1)
        out[m] = float(sps.kstest(u, "uniform").pvalue)
    return out
