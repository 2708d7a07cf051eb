"""causalgpslc_tpu — a TPU-native GP-SLC causal-inference framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``KDL-umass/CausalGPSLC.jl`` (Gaussian Processes with Structured Latent
Confounders, Witty et al., ICML 2020): MCMC posterior inference
(Metropolis-within-Gibbs + elliptical slice sampling) over the 8-variant
GPSLC model family, and closed-form counterfactual ITE/SATE estimation —
vectorized, chain-batched, and shardable across TPU device meshes.

Layer map (mirrors SURVEY.md §1, rebuilt TPU-first):
  api / prediction / io    — user API (gpslc, sample_ite, ...)
  estimation               — counterfactual GP conditioning (batched)
  inference                — MH + ESS Gibbs kernels (jit, vmap over chains)
  models                   — the model family: spec, state, block densities
  ops                      — kernels, Cholesky log-probs, distributions
  parallel                 — device meshes, chain sharding, collectives
  data / hyperparameters   — ingest and configuration
"""

from .api import (
    GPSLCObject,
    from_arrays,
    gpslc,
    sample_counterfactual_outcomes,
    sample_ite,
    sample_posterior,
    sample_sate,
    summarize_estimates,
)
from .api_large_n import (
    LargeNGPSLC,
    gpslc_large_n,
    predict_counterfactual_effects_large_n,
    sample_ite_large_n,
    sample_sate_large_n,
)
from .data import PreparedData, prepare_data
from .hyperparameters import (
    HyperParameters,
    default_hyperparameters,
    default_prior_parameters,
)
from .io import load_gpslc_object, save_gpslc_object
from .prediction import predict_counterfactual_effects

__version__ = "0.1.0"


def enable_x64() -> None:
    """Run in float64 (Julia-parity mode). Call before building models."""
    import jax

    jax.config.update("jax_enable_x64", True)
