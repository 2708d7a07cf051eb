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
call with per-replication synthetic datasets; the data differs per
replication, so datasets batch through ``vmap`` over the data pytree too
(simulate + run fused in one jitted program, ``_sbc_batch``). This is the
round-4 default (``vectorized=True``) — one dispatch per ``rep_batch``
replications instead of one full-MCMC dispatch per replication, which is
what made the slow SBC suite need 45-60 min budgets. ``vectorized=False``
keeps the round-1 Python loop (same keys, same ranks) as a cross-check.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats as sps

from .hyperparameters import HyperParameters, default_prior_parameters
from .inference.gibbs import run_mcmc, run_mcmc_jit
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


@partial(jax.jit, static_argnames=("spec", "priors_items", "hp", "dtype_name"))
def _sbc_batch(keys, spec, priors_items, sigma_u, hp, dtype_name):
    """Simulate-and-run a batch of SBC replications in ONE program.

    ``keys``: (R, 2) replication keys. Each replication draws its own
    ground truth + synthetic dataset from the prior and runs the full
    chain-batched MCMC on it; everything vmaps over the replication axis
    (all shapes static — data is a pytree). Returns (truth, samples) with a
    leading replication axis."""
    priors = dict(priors_items)
    dtype = jnp.dtype(dtype_name)

    def rep(key):
        k_sim, k_run = jax.random.split(key)
        truth, data = simulate_dataset(k_sim, spec, priors, sigma_u, dtype=dtype)
        samples, _, _ = run_mcmc(k_run, spec, priors, data, hp)
        return truth, samples

    return jax.vmap(rep)(keys)


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
    vectorized: bool = True,
    rep_batch: Optional[int] = None,
) -> SBCResult:
    """Run SBC for one model variant; ranks must be uniform if the sampler
    targets the correct posterior.

    ``dtype=jnp.float32`` calibrates the TPU speed path (relative-jitter
    ``stabilize_cov``; combine with speed-path hyperparameters and the
    ``CAUSALGPSLC_QFC`` env to exercise the exact bench configuration).

    ``vectorized=True`` (default) fuses simulate+MCMC for ``rep_batch``
    replications (default: all) into one vmapped program — same
    per-replication keys as the ``vectorized=False`` Python loop, so the
    ranks agree on a fixed seed (bit-level on CPU f64; batching may move
    f32 results by ULPs). ``rep_batch`` bounds per-program memory when
    ``n_replications`` is large."""
    priors = priors or default_prior_parameters()
    monitor = [m for m in (monitor or _DEFAULT_MONITOR) if m in hyper_fields(spec)]
    if spec.has_u and sigma_u is None:
        block = np.kron(np.eye(max(spec.n // 4, 1)), np.ones((4, 4)))[: spec.n, : spec.n]
        sigma_u = jnp.asarray(block + 1e-13 * np.eye(spec.n), dtype=dtype)
    elif sigma_u is not None:
        sigma_u = jnp.asarray(sigma_u, dtype=dtype)

    ranks = {m: [] for m in monitor}
    n_retained = hp.n_posterior_samples
    idx = np.asarray(hp.retained_indices())
    all_keys = jnp.stack(
        [jax.random.fold_in(jax.random.PRNGKey(seed), r) for r in range(n_replications)]
    )

    def _rank_one(truth_m, samples_m):
        """Rank the (leading-axis-scalar) truth among retained draws."""
        true_val = float(np.asarray(truth_m).reshape(-1)[0])
        draws = np.asarray(samples_m)[:, idx]
        draws = draws.reshape(draws.shape[0] * draws.shape[1], -1)[:, 0]
        return int(np.sum(draws < true_val))

    if vectorized:
        from .hyperparameters import frozen_prior_items

        priors_items = frozen_prior_items(priors)
        rb = rep_batch or n_replications
        for start in range(0, n_replications, rb):
            kb = all_keys[start : start + rb]
            truth_b, samples_b = _sbc_batch(
                kb, spec, priors_items, sigma_u, hp, jnp.dtype(dtype).name
            )
            for m in monitor:
                tvs = np.asarray(getattr(truth_b, m))
                drs = np.asarray(getattr(samples_b, m))
                for r in range(kb.shape[0]):
                    ranks[m].append(_rank_one(tvs[r], drs[r]))
    else:
        for r in range(n_replications):
            k_sim, k_run = jax.random.split(all_keys[r])
            truth, data = simulate_dataset(k_sim, spec, priors, sigma_u, dtype=dtype)
            samples, _, _ = run_mcmc_jit(k_run, spec, priors, data, hp)
            for m in monitor:
                ranks[m].append(_rank_one(getattr(truth, m), getattr(samples, m)))

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
