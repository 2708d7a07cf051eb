"""User-level large-N driver: the ``gpslc`` story at N = 5k-50k.

The dense driver (:mod:`causalgpslc_tpu.api`) materializes the (n, n)
SigmaU and conditions with dense (S, n, n) covariance blocks — fine to a
few thousand rows, impossible at 50k (a single n x n float32 matrix is
10 GB). This module wires the row-sharded engine into the same user flow
as the reference driver (``/root/reference/src/driver.jl:27-44`` ->
``sampleITE``/``sampleSATE``/``summarizeEstimates``):

    g = gpslc_large_n("big.csv", mesh=n_mesh())     # sharded MCMC
    ite = sample_ite_large_n(g, do_t=0.6)           # sharded conditioning
    summarize_estimates(ite)                        # same summary API

Covariances are row-sharded over the ``"n"`` mesh axis throughout (MCMC:
:func:`~causalgpslc_tpu.parallel.large_n.run_mcmc_large_n`; estimation:
:func:`~causalgpslc_tpu.parallel.large_n.ite_distributions_large_n`), the
U prior uses the O(N) Sherman-Morrison forms, and the dense SigmaU is
never built (``prepare_data(..., build_sigma_u=False)``).

Both confounder families run here: with an ``obj`` column the full
GP-SLC model samples latent U under the sharded SigmaU machinery; without
one the NoU variants (``CausalGPSLCNoU*``, ``src/model.jl:92-130``) drop
the U sites but keep the same row-sharded N x N treatment/outcome GPs —
exactly as intractable for the dense engine at large N (see
``parallel/large_n.py``'s module docstring).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from .data import PreparedData, prepare_data
from .hyperparameters import HyperParameters, default_hyperparameters, default_prior_parameters
from .models.spec import GPSLCParams
from .parallel.large_n import (
    ite_distributions_grid_large_n,
    ite_distributions_large_n,
    ite_samples_marginal,
    n_mesh,
    run_mcmc_large_n,
)
from .utils.structure import object_counts

__all__ = [
    "LargeNGPSLC",
    "gpslc_large_n",
    "sample_ite_large_n",
    "sample_sate_large_n",
    "predict_counterfactual_effects_large_n",
]


@dataclasses.dataclass
class LargeNGPSLC:
    """Data + configuration + posterior samples for a sharded large-N run.

    The large-N counterpart of :class:`causalgpslc_tpu.api.GPSLCObject`;
    ``posterior_samples`` leaves lead with ``n_outer`` (single chain — chain
    parallelism composes as a second mesh axis)."""

    hyperparams: HyperParameters
    priorparams: dict
    t: np.ndarray
    y: np.ndarray
    x: Optional[np.ndarray]
    counts: Optional[list]  # None => NoU variants (no object structure)
    binary_t: bool
    posterior_samples: GPSLCParams
    stats: object
    mesh: object
    block: int

    @property
    def n(self) -> int:
        return int(self.t.shape[0])

    def retained_samples(self) -> GPSLCParams:
        """Burn-in/thinned samples (leaves lead with S)."""
        idx = np.asarray(self.hyperparams.retained_indices())
        return jax.tree.map(lambda a: a[idx], self.posterior_samples)


def gpslc_large_n(
    data: Union[str, pd.DataFrame, PreparedData],
    *,
    hyperparams: Optional[HyperParameters] = None,
    priorparams: Optional[dict] = None,
    seed: int = 0,
    mesh=None,
    block: Optional[int] = None,
    unroll: int = 1,
    dtype=None,
) -> LargeNGPSLC:
    """Run sharded posterior inference on a large dataset.

    Column conventions follow the reference driver (``T``, ``Y``, optional
    ``obj``, everything else covariates); omitting ``obj`` selects the NoU
    variants exactly as the reference constructors null out ``nU``
    (``src/types.jl:278``). The N x N covariances never
    materialize on a single device; memory and FLOPs divide by the mesh
    size. ``block=None`` picks a panel width that keeps sentinel padding
    modest (256 at large N, smaller when N/devices is small)."""
    hp = hyperparams or default_hyperparameters()
    pp = dict(default_prior_parameters())
    if priorparams:
        pp.update(priorparams)

    prepared = (
        data
        if isinstance(data, PreparedData)
        else prepare_data(data, pp["sigmaUNoise"], pp["sigmaUCov"], build_sigma_u=False)
    )
    # no `obj` column => NoU variants (src/types.jl:278 nulls nU the same
    # way); the T/Y GPs are still dense N x N and shard identically
    has_obj = prepared.obj is not None
    counts = object_counts(list(prepared.obj)) if has_obj else None
    mesh = mesh if mesh is not None else n_mesh()
    if block is None:
        block = _auto_block(prepared.n, mesh.devices.size)

    samples, stats, _final = run_mcmc_large_n(
        jax.random.PRNGKey(seed),
        prepared.t,
        prepared.y,
        counts,
        x=prepared.x,
        binary_t=prepared.binary_t,
        n_u=(hp.n_u or 1) if has_obj else 0,
        priors=pp,
        hp=hp,
        mesh=mesh,
        block=block,
        unroll=unroll,
        dtype=dtype,
    )
    return LargeNGPSLC(
        hyperparams=hp,
        priorparams=pp,
        t=np.asarray(prepared.t),
        y=np.asarray(prepared.y),
        x=None if prepared.x is None else np.asarray(prepared.x),
        counts=counts,
        binary_t=prepared.binary_t,
        posterior_samples=samples,
        stats=stats,
        mesh=mesh,
        block=block,
    )


def _auto_block(n: int, n_dev: int) -> int:
    """Largest power-of-two panel width <= 256 keeping padding under ~50%
    (the distributed loops need block * n_devices | padded N; a 256-wide
    panel on an 8-way mesh would pad a 200-row dataset to 2048 rows)."""
    b = 8
    while b < 256 and b * n_dev * 2 <= n:
        b *= 2
    return b


def _ite_moments(g: LargeNGPSLC, do_t, sample_batch=8):
    return ite_distributions_large_n(
        g.retained_samples(), g.t, g.y, do_t, x=g.x, mesh=g.mesh, block=g.block,
        prediction_covariance_noise=g.hyperparams.prediction_covariance_noise,
        sample_batch=sample_batch,
    )


def sample_ite_large_n(
    g: LargeNGPSLC,
    do_t,
    samples_per_posterior: int = 10,
    seed: int = 1,
    sample_batch: int = 8,
) -> np.ndarray:
    """ITE posterior-mixture samples, shape ``(n, S * samples_per_posterior)``
    (``sampleITE``, ``src/driver.jl:86-89``) from sharded conditioning;
    feeds :func:`causalgpslc_tpu.api.summarize_estimates` unchanged.

    MARGINAL-ONLY caveat: unlike the dense :func:`causalgpslc_tpu.api.
    sample_ite` (which draws correlated MVN ITE vectors, as the reference's
    ``ITEsamples`` does), each individual's draws here are INDEPENDENT
    normals at that individual's exact marginal moments. Per-individual
    summaries (``summarize_estimates`` means/quantiles) are unaffected, but
    cross-individual functionals computed from one column of the returned
    matrix do not carry the joint uncertainty — for aggregate effects use
    :func:`sample_sate_large_n`, which uses the exact sum-of-CovITE
    variance. ``sample_batch`` posterior samples are conditioned per
    dispatch (see ``ite_distributions_large_n``)."""
    mean_s, var_s, _, _ = _ite_moments(g, do_t, sample_batch)
    return np.asarray(
        ite_samples_marginal(jax.random.PRNGKey(seed), mean_s, var_s, samples_per_posterior)
    )


def sample_sate_large_n(
    g: LargeNGPSLC,
    do_t,
    samples_per_posterior: int = 10,
    seed: int = 1,
    sample_batch: int = 8,
) -> np.ndarray:
    """SATE posterior-mixture samples (``sampleSATE``, ``src/driver.jl:108-111``).

    Uses the exact aggregate variance ``sum(CovITE)/n^2`` per posterior
    sample, so (unlike the marginal-only ITE matrix of
    :func:`sample_ite_large_n`) the joint uncertainty of the average effect
    is fully carried."""
    _, _, sate_means, sate_vars = _ite_moments(g, do_t, sample_batch)
    s = sate_means.shape[0]
    z = jax.random.normal(jax.random.PRNGKey(seed), (s, samples_per_posterior))
    draws = sate_means[:, None] + jnp.sqrt(sate_vars)[:, None] * z.astype(sate_means.dtype)
    return np.asarray(draws.reshape(-1))


def predict_counterfactual_effects_large_n(
    g: LargeNGPSLC,
    n_samples_per_mixture: int,
    fidelity: int = 100,
    min_do_t=None,
    max_do_t=None,
    seed: int = 1,
    sample_batch: int = 8,
    batched: bool = False,
):
    """ITE samples across a doT grid at large N
    (``predictCounterfactualEffects``, ``src/prediction.jl:23-36``).

    Returns ``(ite, do_t_range)`` with ``ite`` of shape
    ``(fidelity + 1, n, S * n_samples_per_mixture)``.

    ``batched=True`` streams the whole (grid x posterior sample) product
    through ONE sample-batched sharded program
    (``ite_distributions_grid_large_n``): ceil((fidelity+1) * S /
    sample_batch) dispatches for the entire sweep vs the loop's
    (fidelity+1) * ceil(S / sample_batch) partially-full rounds. Measured
    on-chip at N=5000, S=15, G=101 (``benchmarks/grid_batch_bench_S15.json``)
    the per-point loop is nonetheless FASTER (51 vs 75 s): the
    conditioning programs run for seconds each, so the ~22-26 ms
    dispatch overhead is noise and the paired program's per-lane doT
    handling costs real time. Default is therefore the loop; ``batched``
    pays off when ``S % sample_batch`` leaves many partial batches.
    Individual draws carry marginal uncertainty only — see
    :func:`sample_ite_large_n`."""
    lo = float(g.t.min()) if min_do_t is None else float(min_do_t)
    hi = float(g.t.max()) if max_do_t is None else float(max_do_t)
    grid = np.linspace(lo, hi, fidelity + 1)
    if batched:
        means_g, vars_g, _, _ = ite_distributions_grid_large_n(
            g.retained_samples(), g.t, g.y, grid, x=g.x, mesh=g.mesh,
            block=g.block,
            prediction_covariance_noise=g.hyperparams.prediction_covariance_noise,
            pair_batch=sample_batch,
        )
    else:
        per_point = [
            ite_distributions_large_n(
                g.retained_samples(), g.t, g.y, float(do_t), x=g.x,
                mesh=g.mesh, block=g.block,
                prediction_covariance_noise=g.hyperparams.prediction_covariance_noise,
                sample_batch=sample_batch,
            )
            for do_t in grid
        ]
        means_g = np.stack([np.asarray(p[0]) for p in per_point])
        vars_g = np.stack([np.asarray(p[1]) for p in per_point])
    out = [
        np.asarray(
            ite_samples_marginal(
                jax.random.fold_in(jax.random.PRNGKey(seed), i),
                jnp.asarray(means_g[i]), jnp.asarray(vars_g[i]),
                n_samples_per_mixture,
            )
        )
        for i in range(len(grid))
    ]
    return np.stack(out), grid
