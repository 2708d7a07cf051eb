"""Per-block covariance builders and log-densities for the GPSLC family.

This is the TPU-native replacement for the reference's Gen model graph
(``/root/reference/src/model_likelihood.jl`` + ``src/model_prior.jl``): the
joint density factorizes into four GP blocks

    p(params) p(U | SigmaU, uNoise) p(X | U) p(T | U, X) p(Y | U, X, T)

and every inference move touches only its Markov blanket — unlike Gen's
dynamic DSL, which re-simulates and re-scores the *entire* model per MH move
(``src/inference.jl:23-44``). Scoring a block = build covariance (vectorized
log-RBF, VPU/MXU) + one Cholesky log-density (MXU), all batched over chains
by ``vmap`` one level up.

All functions are pure ``(spec, priors, data, params) -> value`` and jittable;
``spec`` and ``priors`` are static.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.distributions import bernoulli_logit_logpdf, inv_gamma_logpdf
from ..ops.kernels import process_cov, rbf_kernel_log
from ..ops.linalg import mvn_logpdf, mvn_logpdf_chol, safe_cholesky, stacked_mvn_logliks
from .spec import GPSLCParams, ModelData, ModelSpec

__all__ = [
    "FIELD_PRIOR_NAMES",
    "build_cov",
    "field_block",
    "u_cov",
    "x_cov_k",
    "t_cov",
    "y_cov",
    "logp_u",
    "logp_x_k",
    "logp_x",
    "logp_t_gp",
    "logp_t_bernoulli",
    "logp_y",
    "logp_hyper_prior",
    "log_joint",
    "BlockLps",
    "compute_block_lps",
]

# Map param field -> prior-parameter name stem in the InvGamma table
# (src/hyperparameters.jl:38-70).
FIELD_PRIOR_NAMES = {
    "u_noise": "uNoise",
    "x_noise": "xNoise",
    "t_noise": "tNoise",
    "y_noise": "yNoise",
    "ux_ls": "uxLS",
    "ut_ls": "utLS",
    "uy_ls": "uyLS",
    "xt_ls": "xtLS",
    "xy_ls": "xyLS",
    "ty_ls": "tyLS",
    "x_scale": "xScale",
    "t_scale": "tScale",
    "y_scale": "yScale",
}

# Which likelihood block each hyperparameter's Markov blanket covers.
_FIELD_BLOCK = {
    "u_noise": "u",
    "x_noise": "x",
    "x_scale": "x",
    "ux_ls": "x",
    "t_noise": "t",
    "t_scale": "t",
    "ut_ls": "t",
    "xt_ls": "t",
    "y_noise": "y",
    "y_scale": "y",
    "uy_ls": "y",
    "xy_ls": "y",
    "ty_ls": "y",
}


def field_block(field: str) -> str:
    """Likelihood block affected by an MH move on ``field``."""
    return _FIELD_BLOCK[field]


# ---------------------------------------------------------------------------
# Covariance builders
# ---------------------------------------------------------------------------


def build_cov(features: jax.Array, scale, noise) -> jax.Array:
    """``exp(-cdist^2(features)) * scale + noise I`` via the XLA dot path.

    One (n, d) @ (d, n) Gram matmul with the exp/scale/noise epilogue fused
    by XLA. A handwritten fused Pallas build was prototyped and measured
    slower (16 ms vs 10 ms at n=5000 f32 on v5e): GPSLC's tiny ARD feature
    dims pad to the 128-lane MXU width in-kernel, and XLA already fuses the
    elementwise epilogue, so the prototype was removed (BASELINE.md)."""
    log_cov = rbf_kernel_log(features, features, jnp.ones((), dtype=features.dtype))
    return process_cov(log_cov, scale, noise)


def u_cov(data: ModelData, params: GPSLCParams) -> jax.Array:
    """Prior covariance over each U column: ``SigmaU * uNoise``
    (``generateUfromSigmaU``, ``src/model_likelihood.jl:4-10``)."""
    return data.sigma_u * params.u_noise


def x_cov_k(data: ModelData, params: GPSLCParams, k: int) -> jax.Array:
    """Covariance of covariate column k given U
    (``generateXfromU``, ``src/model_likelihood.jl:13-22``)."""
    log_k = rbf_kernel_log(params.u, params.u, params.ux_ls[k])
    return process_cov(log_k, params.x_scale[k], params.x_noise[k])


def x_cov_all(data: ModelData, params: GPSLCParams) -> jax.Array:
    """All nX covariate covariances as one (nX, n, n) batch."""
    covs = jax.vmap(
        lambda ls, scale, noise: process_cov(rbf_kernel_log(params.u, params.u, ls), scale, noise)
    )(params.ux_ls, params.x_scale, params.x_noise)
    return covs


def t_features(spec: ModelSpec, data: ModelData, params: GPSLCParams) -> jax.Array:
    """Lengthscale-scaled feature matrix whose pairwise sq-distances give the
    treatment GP's additive log-kernel.

    Additive log-RBF kernels (``generateRealTfromUX`` family,
    ``src/model_likelihood.jl:25-80``) satisfy
    ``sum_b -|u_i/ls - u_j/ls|^2 = -|z_i - z_j|^2`` for the concatenated
    scaled features ``z = [U/utLS, X/xtLS]`` — one (n, d) matrix and one
    pairwise computation (a single MXU matmul at large n) instead of one
    broadcast pass per block.
    """
    parts = []
    if spec.has_u:
        parts.append(params.u / params.ut_ls)
    if spec.has_x:
        parts.append(data.x / params.xt_ls)
    return jnp.concatenate(parts, axis=1)


def t_cov(spec: ModelSpec, data: ModelData, params: GPSLCParams) -> jax.Array:
    """Covariance of T (continuous) or logitT (binary) given U and/or X.

    For the no-U-no-X variants the prior is the identity
    (``generateRealTfromPrior``/``generateBinaryTfromPrior``,
    ``src/model_prior.jl:175-200``).
    """
    dtype = data.t.dtype
    if not spec.has_u and not spec.has_x:
        return jnp.eye(spec.n, dtype=dtype)
    f = t_features(spec, data, params)
    return build_cov(f, params.t_scale, params.t_noise)


def y_features(spec: ModelSpec, data: ModelData, params: GPSLCParams) -> jax.Array:
    """Scaled features for the outcome GP's additive kernel over (U, X, T)
    (``generateYfromUXT`` family, ``src/model_likelihood.jl:83-120``)."""
    parts = [data.t[:, None] / params.ty_ls]
    if spec.has_u:
        parts.append(params.u / params.uy_ls)
    if spec.has_x:
        parts.append(data.x / params.xy_ls)
    return jnp.concatenate(parts, axis=1)


def y_kernel_log(spec: ModelSpec, data: ModelData, params: GPSLCParams) -> jax.Array:
    f = y_features(spec, data, params)
    return rbf_kernel_log(f, f, jnp.ones((), dtype=data.t.dtype))


def y_cov(spec: ModelSpec, data: ModelData, params: GPSLCParams) -> jax.Array:
    return build_cov(y_features(spec, data, params), params.y_scale, params.y_noise)


# ---------------------------------------------------------------------------
# Block log-densities
# ---------------------------------------------------------------------------


def logp_u(spec: ModelSpec, data: ModelData, params: GPSLCParams) -> jax.Array:
    """``sum_k log N(U[:, k]; 0, SigmaU * uNoise)`` — one shared Cholesky."""
    chol = safe_cholesky(u_cov(data, params))
    return jnp.sum(jax.vmap(lambda col: mvn_logpdf_chol(col, chol))(params.u.T))


def logp_x_k(spec: ModelSpec, data: ModelData, params: GPSLCParams, k: int) -> jax.Array:
    """Log-density of covariate column k given U."""
    return mvn_logpdf(data.x[:, k], x_cov_k(data, params, k))


def logp_x(spec: ModelSpec, data: ModelData, params: GPSLCParams) -> jax.Array:
    """Per-column X log-densities as an (nX,) vector (batched Cholesky)."""
    covs = x_cov_all(data, params)
    chols = safe_cholesky(covs)
    return jax.vmap(mvn_logpdf_chol)(data.x.T, chols)


def logp_t_gp(spec: ModelSpec, data: ModelData, params: GPSLCParams) -> jax.Array:
    """GP factor of the treatment block: N(T; 0, tCov) for continuous T,
    N(logitT; 0, tCov) for binary T (the Bernoulli factor is separate)."""
    target = params.logit_t if spec.binary_t else data.t
    if not spec.has_u and not spec.has_x:
        # identity covariance — standard normal
        n = spec.n
        return -0.5 * (jnp.sum(target * target) + n * jnp.log(jnp.asarray(2.0 * jnp.pi, dtype=target.dtype)))
    return mvn_logpdf(target, t_cov(spec, data, params))


def logp_t_bernoulli(spec: ModelSpec, data: ModelData, params: GPSLCParams) -> jax.Array:
    """``sum_i log Bernoulli(T_i | expit(logitT_i))`` (binary variants only)."""
    return bernoulli_logit_logpdf(data.t, params.logit_t)


def logp_y(spec: ModelSpec, data: ModelData, params: GPSLCParams) -> jax.Array:
    return mvn_logpdf(data.y, y_cov(spec, data, params))


def logp_hyper_prior(spec: ModelSpec, priors: dict, params: GPSLCParams) -> jax.Array:
    """Sum of InvGamma log-priors over every present hyperparameter site."""
    total = 0.0
    for field, stem in FIELD_PRIOR_NAMES.items():
        val = getattr(params, field)
        if val is None:
            continue
        total = total + jnp.sum(inv_gamma_logpdf(val, priors[stem + "Shape"], priors[stem + "Scale"]))
    return total


def log_joint(spec: ModelSpec, priors: dict, data: ModelData, params: GPSLCParams) -> jax.Array:
    """Full model log-joint — the reference trace score (``Gen.generate``)."""
    lp = logp_hyper_prior(spec, priors, params) + logp_y(spec, data, params) + logp_t_gp(spec, data, params)
    if spec.binary_t:
        lp = lp + logp_t_bernoulli(spec, data, params)
    if spec.has_u:
        lp = lp + logp_u(spec, data, params)
        if spec.has_x:
            lp = lp + jnp.sum(logp_x(spec, data, params))
    elif spec.has_x:
        # NoU variants: X ~ iid N(0, I) from the prior (src/model_prior.jl:175-181)
        n = spec.n
        lp = lp - 0.5 * (
            jnp.sum(data.x * data.x)
            + n * spec.n_x * jnp.log(jnp.asarray(2.0 * jnp.pi, dtype=data.x.dtype))
        )
    return lp


# ---------------------------------------------------------------------------
# Cached block log-likelihoods for MH sweeps
# ---------------------------------------------------------------------------


def u_conditional_loglik(spec: ModelSpec, data: ModelData, params: GPSLCParams):
    """Likelihood of the latent-confounder sites: every block whose covariance
    depends on U — p(X|U), the T-GP factor, p(Y|U,X,T) — scored with ONE
    batched Cholesky over the stacked (nX + 2, n, n) covariances instead of
    nX + 2 sequential factorizations (the op-latency optimization for the
    elliptical-slice inner loop; see BASELINE.md "Measured").

    Returns ``(total, (x_sum, t_lp, y_lp))``.
    """
    dtype = data.y.dtype
    covs = []
    targets = []
    if spec.has_x:
        covs.append(x_cov_all(data, params))  # (nX, n, n)
        targets.append(data.x.T)
    t_target = params.logit_t if spec.binary_t else data.t
    covs.append(t_cov(spec, data, params)[None])
    targets.append(t_target[None])
    covs.append(y_cov(spec, data, params)[None])
    targets.append(data.y[None])

    all_covs = jnp.concatenate(covs, axis=0)
    all_targets = jnp.concatenate(targets, axis=0)
    lps = stacked_mvn_logliks(all_covs, all_targets)

    if spec.has_x:
        x_sum = jnp.sum(lps[: spec.n_x])
    else:
        x_sum = jnp.zeros((), dtype=dtype)
    t_lp, y_lp = lps[-2], lps[-1]
    return x_sum + t_lp + y_lp, (x_sum, t_lp, y_lp)


class BlockLps(NamedTuple):
    """Current per-block log-likelihoods carried through a Gibbs sweep.

    ``x`` is per-column (nX,) so a move on covariate k's hyperparameters only
    refreshes entry k. Absent blocks are None.
    """

    u: Optional[jax.Array] = None
    x: Optional[jax.Array] = None
    t: Optional[jax.Array] = None
    y: Optional[jax.Array] = None


def compute_block_lps(spec: ModelSpec, data: ModelData, params: GPSLCParams) -> BlockLps:
    """All block log-likelihoods with ONE stacked batched factorization.

    Numerically identical to calling ``logp_u``/``logp_x``/``logp_t_gp``/
    ``logp_y`` separately, but the (nU + nX + 2, n, n) covariances factorize
    in a single batched Cholesky + batched solve — the Gibbs sweep is bound
    by sequential matrix-op launch latency, not FLOPs (BASELINE.md)."""
    covs, targets, seg = [], [], {}
    pos = 0
    if spec.has_u:
        uc = u_cov(data, params)
        covs.append(jnp.broadcast_to(uc, (spec.n_u,) + uc.shape))
        targets.append(params.u.T)
        seg["u"] = slice(pos, pos + spec.n_u)
        pos += spec.n_u
        if spec.has_x:
            covs.append(x_cov_all(data, params))
            targets.append(data.x.T)
            seg["x"] = slice(pos, pos + spec.n_x)
            pos += spec.n_x
    if spec.has_u or spec.has_x:
        covs.append(t_cov(spec, data, params)[None])
        targets.append((params.logit_t if spec.binary_t else data.t)[None])
        seg["t"] = pos
        pos += 1
    covs.append(y_cov(spec, data, params)[None])
    targets.append(data.y[None])
    seg["y"] = pos

    lp = stacked_mvn_logliks(jnp.concatenate(covs, axis=0), jnp.concatenate(targets, axis=0))

    return BlockLps(
        u=jnp.sum(lp[seg["u"]]) if "u" in seg else None,
        x=lp[seg["x"]] if "x" in seg else None,
        # no-U-no-X variants: T prior is a standard normal, no factorization
        t=lp[seg["t"]] if "t" in seg else logp_t_gp(spec, data, params),
        y=lp[seg["y"]],
    )
