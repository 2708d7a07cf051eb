"""Public API: the TPU-native equivalents of the reference driver layer.

Parity targets: ``gpslc``/``samplePosterior``/``sampleITE``/``sampleSATE``/
``summarizeEstimates`` (``/root/reference/src/driver.jl``) and the
``GPSLCObject`` container (``src/types.jl:249-290``).

Deliberate departures from the reference, per SURVEY.md §7:
- Inference is an explicit call, not a constructor side effect: ``gpslc()``
  runs MCMC and returns a :class:`GPSLCObject`, but the object can also be
  built from existing samples (mid-run checkpointing becomes possible).
- The reference's two-arg ``gpslc(obj, X, T, Y)`` passes raw object labels
  where group counts are expected (``src/driver.jl:39``); here labels are
  reduced to counts.
- Multiple chains (``HyperParameters.n_chains``) run chain-parallel; retained
  samples pool across chains into one posterior mixture.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from . import estimation
from .data import PreparedData, prepare_data
from .hyperparameters import HyperParameters, default_hyperparameters, default_prior_parameters
from .inference.gibbs import run_mcmc_jit
from .models.spec import GPSLCParams, ModelData, ModelSpec, make_model_data
from .utils.structure import generate_sigma_u, object_counts

__all__ = [
    "GPSLCObject",
    "gpslc",
    "sample_posterior",
    "sample_counterfactual_outcomes",
    "sample_ite",
    "sample_sate",
    "summarize_estimates",
]


def default_dtype():
    """float64 when x64 is enabled (CPU parity), else float32 (TPU speed)."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


@dataclasses.dataclass
class GPSLCObject:
    """Data + configuration + posterior samples (``src/types.jl:249-258``).

    ``posterior_samples`` is a :class:`GPSLCParams` pytree whose leaves have
    leading dims ``(n_chains, n_outer)`` — the chain-batched analog of the
    reference's ``Vector{ChoiceMap}``.
    """

    hyperparams: HyperParameters
    priorparams: dict
    prepared: PreparedData
    spec: ModelSpec
    data: ModelData
    posterior_samples: GPSLCParams
    stats: Optional[object] = None

    @property
    def n(self) -> int:
        return self.spec.n

    @property
    def n_u(self) -> Optional[int]:
        return self.spec.n_u

    @property
    def n_x(self) -> Optional[int]:
        return self.spec.n_x

    @property
    def num_posterior_samples(self) -> int:
        """Retained samples pooled over chains."""
        return self.hyperparams.n_posterior_samples * self.hyperparams.n_chains

    def retained_samples(self) -> GPSLCParams:
        """Burn-in/thinned samples, chains flattened: leaves lead with S."""
        idx = np.asarray(self.hyperparams.retained_indices())

        def take(leaf):
            if leaf is None:
                return None
            sel = leaf[:, idx]
            return sel.reshape((-1,) + sel.shape[2:])

        return jax.tree.map(take, self.posterior_samples)


def _spec_hp_consistent(spec: ModelSpec, hp: HyperParameters) -> HyperParameters:
    """Null out budgets that don't apply, as the GPSLCObject constructors do
    (``src/types.jl:278``, ``:285-287``)."""
    if not spec.has_u:
        hp = hp.replace(n_u=None)
    if not spec.has_u and not spec.has_x:
        hp = hp.replace(n_mh_inner=None, n_es_inner=None)
    return hp


def gpslc(
    data: Union[str, pd.DataFrame, PreparedData],
    *,
    hyperparams: Optional[HyperParameters] = None,
    priorparams: Optional[dict] = None,
    seed: int = 0,
    dtype=None,
    verbose: bool = False,
) -> GPSLCObject:
    """Run posterior inference on a dataset (CSV path / DataFrame / prepared).

    Column conventions follow ``src/driver.jl:27-33``: ``T``, ``Y``, optional
    ``obj``, everything else covariates. ``verbose`` runs in chunks with
    host-side progress lines (the reference's tqdm analog).

    Multi-device routing: when more than one accelerator is visible and
    ``hp.n_chains`` is a multiple of the device count, chains shard over the
    device mesh (``parallel.mesh.run_mcmc_sharded``). Per-chain results match
    the single-device path to ~1e-12 (same chain keys and per-chain program;
    XLA may fuse the two layouts differently, so equality is allclose-level,
    not bitwise — outputs can differ at ULP level with the visible device
    count). When ``n_chains`` does NOT divide the device count a warning is
    emitted and the run stays on one device — round ``n_chains`` up to a
    multiple of ``len(jax.devices())`` to use every chip.
    """
    hp = hyperparams or default_hyperparameters()
    pp = dict(default_prior_parameters())
    if priorparams:
        pp.update(priorparams)
    dtype = dtype or default_dtype()

    prepared = (
        data
        if isinstance(data, PreparedData)
        else prepare_data(data, pp["sigmaUNoise"], pp["sigmaUCov"])
    )
    spec, model_data = make_model_data(prepared, n_u=hp.n_u, dtype=dtype)
    hp = _spec_hp_consistent(spec, hp)

    n_dev = len(jax.devices())
    shardable = n_dev > 1 and hp.n_chains % n_dev == 0
    if n_dev > 1 and not shardable:
        import warnings

        warnings.warn(
            f"{n_dev} devices are visible but n_chains={hp.n_chains} is not "
            "a multiple of the device count; running on ONE device. Set "
            "n_chains to a multiple of len(jax.devices()) (chains are cheap "
            "— round up) to shard across all chips.",
            stacklevel=2,
        )
    if verbose:
        from .parallel.checkpoint import run_mcmc_checkpointed

        # the chunked runner shards chains over the mesh too, so asking for
        # progress lines no longer forfeits multi-chip execution
        mesh = None
        if shardable:
            from .parallel.mesh import chain_mesh

            mesh = chain_mesh()
        samples, stats, _final = run_mcmc_checkpointed(
            jax.random.PRNGKey(seed),
            spec,
            pp,
            model_data,
            hp,
            mesh=mesh,
            progress_callback=lambda done, total: print(f"[gpslc] outer {done}/{total}"),
        )
    elif shardable:
        # Multi-chip: shard chains over the device mesh transparently (the
        # reference-parity entry point scales out without touching
        # causalgpslc_tpu.parallel). Per-chain results match the
        # single-device path (shared chain runner + same chain keys).
        from .parallel.mesh import run_mcmc_sharded

        samples, stats, _final = run_mcmc_sharded(
            jax.random.PRNGKey(seed), spec, pp, model_data, hp
        )
    else:
        samples, stats, _final = sample_posterior(spec, pp, model_data, hp, seed=seed)
    return GPSLCObject(
        hyperparams=hp,
        priorparams=pp,
        prepared=prepared,
        spec=spec,
        data=model_data,
        posterior_samples=samples,
        stats=stats,
    )


def from_arrays(
    obj=None,
    x: Optional[np.ndarray] = None,
    t: Optional[np.ndarray] = None,
    y: Optional[np.ndarray] = None,
    **kwargs,
) -> GPSLCObject:
    """Array-based entry (``gpslc(obj, X, T, Y)``, ``src/driver.jl:35-44``).

    Fixes the reference's labels-as-counts bug by reducing labels to group
    counts before building SigmaU.
    """
    pp = kwargs.get("priorparams") or default_prior_parameters()
    t = np.asarray(t, dtype=np.float64)
    binary = bool(np.all(np.isin(t, (0.0, 1.0))) and set(np.unique(t)) <= {0.0, 1.0})
    if obj is not None:
        order = np.argsort(np.asarray(obj), kind="stable")
        obj_sorted = np.asarray(obj)[order]
        t = t[order]
        y = np.asarray(y, dtype=np.float64)[order]
        x = None if x is None else np.asarray(x, dtype=np.float64)[order]
        sigma_u = generate_sigma_u(
            object_counts(obj_sorted.tolist()), pp["sigmaUNoise"], pp["sigmaUCov"]
        )
        prepared = PreparedData(sigma_u=sigma_u, obj=obj_sorted, x=x, t=t, y=y, binary_t=binary)
    else:
        prepared = PreparedData(
            sigma_u=None,
            obj=None,
            x=None if x is None else np.asarray(x, dtype=np.float64),
            t=t,
            y=np.asarray(y, dtype=np.float64),
            binary_t=binary,
        )
    return gpslc(prepared, **kwargs)


def sample_posterior(
    spec: ModelSpec,
    priorparams: dict,
    data: ModelData,
    hp: HyperParameters,
    seed: int = 0,
):
    """Draw posterior samples (``samplePosterior``, ``src/driver.jl:59-69``)."""
    key = jax.random.PRNGKey(seed)
    return run_mcmc_jit(key, spec, priorparams, data, hp)


def sample_ite(
    g: GPSLCObject,
    do_t,
    samples_per_posterior: int = 10,
    seed: int = 1,
) -> np.ndarray:
    """ITE posterior-mixture samples, shape (n, S * samples_per_posterior)
    (``sampleITE``, ``src/driver.jl:86-89``)."""
    samples = g.retained_samples()
    mean_ites, cov_ites = estimation.ite_distributions(
        g.spec, g.data, samples, do_t, g.hyperparams.prediction_covariance_noise
    )
    key = jax.random.PRNGKey(seed)
    return np.asarray(estimation.ite_samples(key, mean_ites, cov_ites, samples_per_posterior))


def sample_sate(
    g: GPSLCObject,
    do_t,
    samples_per_posterior: int = 10,
    seed: int = 1,
    reference_quirks: bool = False,
) -> np.ndarray:
    """SATE posterior-mixture samples (``sampleSATE``, ``src/driver.jl:108-111``)."""
    samples = g.retained_samples()
    mean_sates, var_sates = estimation.sate_distributions(
        g.spec, g.data, samples, do_t, g.hyperparams.prediction_covariance_noise
    )
    key = jax.random.PRNGKey(seed)
    return np.asarray(
        estimation.sate_samples(key, mean_sates, var_sates, samples_per_posterior, reference_quirks)
    )


def summarize_estimates(
    samples: np.ndarray,
    savetofile: str = "",
    credible_interval: float = 0.90,
) -> pd.DataFrame:
    """Per-individual mean + credible interval of a (n, m) sample matrix
    (``summarizeEstimates``, ``src/driver.jl:129-149``)."""
    samples = np.atleast_2d(np.asarray(samples))
    lower_q = (1.0 - credible_interval) / 2.0
    upper_q = 1.0 - lower_q
    df = pd.DataFrame(
        {
            "Individual": np.arange(1, samples.shape[0] + 1),
            "Mean": samples.mean(axis=1),
            "LowerBound": np.quantile(samples, lower_q, axis=1),
            "UpperBound": np.quantile(samples, upper_q, axis=1),
        }
    )
    if savetofile:
        df.to_csv(savetofile, index=False)
        print(f"Saved mean and {credible_interval:.0%} credible intervals to {savetofile}")
    return df


def sample_counterfactual_outcomes(
    g: GPSLCObject,
    do_t,
    samples_per_posterior: int = 10,
    seed: int = 1,
) -> np.ndarray:
    """Counterfactual outcome samples ``Y* | doT`` of shape
    ``(n, S * samples_per_posterior)``.

    New capability over the reference, whose NEEC example approximates
    counterfactual outcomes as ``mean(Y) + ITE`` host-side
    (``docs/example_data/NEEC_Example.jl``); this draws from the exact GP
    posterior of the counterfactual process ``f* | Y``.
    """
    samples = g.retained_samples()
    means, covs = estimation.counterfactual_outcome_distributions(
        g.spec, g.data, samples, do_t, g.hyperparams.prediction_covariance_noise
    )
    key = jax.random.PRNGKey(seed)
    return np.asarray(estimation.ite_samples(key, means, covs, samples_per_posterior))
