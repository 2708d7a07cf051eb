"""Counterfactual estimation: ITE / SATE posteriors from MCMC samples.

Parity targets: ``likelihoodDistribution`` (``/root/reference/src/likelihood.jl``,
4 dispatches collapsed into one spec-driven function), ``conditionalITE`` /
``ITEDistributions`` / ``ITEsamples`` / ``conditionalSATE`` /
``SATEDistributions`` / ``SATEsamples`` (``src/estimation.jl``).

TPU redesign: the reference loops posterior samples and re-runs O(n^3)
conditioning per sample (``src/estimation.jl:78-84``); here the posterior
axis is a ``vmap`` batch, so the whole mixture conditions as one batched
Cholesky + batched triangular solves on the MXU. Sampling draws reuse one
Cholesky per mixture component (the reference re-factorizes per draw,
``src/estimation.jl:105``).

Documented divergence (SURVEY.md §7 item 6): the reference's ``SATEsamples``
passes a *variance* where Gen's ``normal`` expects a standard deviation
(``src/estimation.jl:159``). The statistically correct ``sqrt(var)`` is the
default here; ``reference_quirks=True`` reproduces the reference behavior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .models.spec import GPSLCParams, ModelData, ModelSpec
from .ops.kernels import process_cov, rbf_kernel_log
from .ops.linalg import add_jitter, chol_solve, safe_cholesky, symmetrize

__all__ = [
    "likelihood_distribution",
    "extract_parameters",
    "conditional_ite",
    "conditional_counterfactual_outcome",
    "counterfactual_outcome_distributions",
    "ite_distributions",
    "ite_samples",
    "conditional_sate",
    "sate_distributions",
    "sate_samples",
]


def _y_kernel_log_parts(spec: ModelSpec, data: ModelData, params: GPSLCParams):
    """(base, ty) log-kernels: base = U/X contributions shared by all four
    covariance blocks; ty varies between observed T and the intervened T*."""
    dtype = data.y.dtype
    base = jnp.zeros((spec.n, spec.n), dtype=dtype)
    if spec.has_u:
        base = base + rbf_kernel_log(params.u, params.u, params.uy_ls)
    if spec.has_x:
        base = base + rbf_kernel_log(data.x, data.x, params.xy_ls)
    return base


def _conditioning_core(spec: ModelSpec, data: ModelData, params: GPSLCParams, do_t):
    """Covariance blocks + factorization shared by all conditioning entry
    points: ``(cov_ww, cov_wws, cov_wsws, cov_wwp, chol(cov_wwp))``.

    The C-conditional blocks are NOT computed here — each caller derives only
    the ones it needs (:func:`_c_blocks` / :func:`conditional_counterfactual_outcome`),
    so eager callers don't pay for solves XLA would otherwise dead-code-eliminate.
    """
    dtype = data.y.dtype
    # Intervention may be scalar (set everyone) or per-individual vector,
    # matching the reference's Intervention union (src/types.jl:137-143).
    do_vec = jnp.broadcast_to(jnp.asarray(do_t, dtype=dtype), (spec.n,))

    base_log = _y_kernel_log_parts(spec, data, params)
    ty_log = rbf_kernel_log(data.t, data.t, params.ty_ls)
    ty_log_s = rbf_kernel_log(data.t, do_vec, params.ty_ls)
    # zero for a scalar intervention; nonzero for per-individual doT vectors
    ty_log_ss = rbf_kernel_log(do_vec, do_vec, params.ty_ls)

    y_scale = params.y_scale
    cov_ww = process_cov(base_log + ty_log, y_scale)
    cov_wws = process_cov(base_log + ty_log_s, y_scale)
    cov_wsws = process_cov(base_log + ty_log_ss, y_scale)
    cov_wwp = add_jitter(cov_ww, params.y_noise)  # CovWW + yNoise I (src/likelihood.jl:31)
    chol = safe_cholesky(cov_wwp)
    return cov_ww, cov_wws, cov_wsws, cov_wwp, chol


def _c_blocks(cov_ww, cov_wws, cov_wsws, chol):
    """The 2x2 conditional-covariance blocks, the ``C - C (CovWWp \\ C)``
    pattern of ``src/likelihood.jl:42-49``."""
    a1 = chol_solve(chol, cov_ww)  # (CovWWp \ CovWW)
    a2 = chol_solve(chol, cov_wws)  # (CovWWp \ CovWWs)
    c11 = cov_ww - cov_ww @ a1
    c12 = cov_wws - cov_ww @ a2
    c21 = cov_wws.T - cov_wws.T @ a1
    c22 = cov_wsws - cov_wws.T @ a2
    return c11, c12, c21, c22


def likelihood_distribution(spec: ModelSpec, data: ModelData, params: GPSLCParams, do_t):
    """The GP conditioning matrices of ``likelihoodDistribution``
    (``src/likelihood.jl:8-52`` and its 3 no-U/no-X dispatches, collapsed into
    one spec-driven function). Returns the reference's tuple, slot-for-slot:
    ``(Y, CovWW, CovWWs, CovWWp, CovC11, CovC12, CovC21, CovC22)`` with
    ``CovWWp = CovWW + yNoise*I`` in slot 4 exactly as the reference returns
    it, so ported downstream code (e.g. ``MeanITE = (CovWWs' - CovWW) *
    (CovWWp \\ Y)``) works unchanged.

    The reference rebuilds these matrices inside every ``conditionalITE``
    call; here they are also the shared core of :func:`conditional_ite` and
    :func:`conditional_counterfactual_outcome` (one Cholesky, batched under
    ``vmap``).
    """
    cov_ww, cov_wws, cov_wsws, cov_wwp, chol = _conditioning_core(
        spec, data, params, do_t
    )
    c11, c12, c21, c22 = _c_blocks(cov_ww, cov_wws, cov_wsws, chol)
    return data.y, cov_ww, cov_wws, cov_wwp, c11, c12, c21, c22


def extract_parameters(samples: GPSLCParams, i: int) -> GPSLCParams:
    """The i-th posterior sample's parameter pytree.

    Parity with ``extractParameters(g, i)`` (``src/utils.jl:92-124``), which
    pulls ``uyLS, xyLS, tyLS, yNoise, yScale, U`` out of the i-th choicemap.
    Here posterior samples are a stacked pytree (leading axis = retained
    samples), so extraction is one indexed ``tree.map`` — no address book.
    Accepts the stacked pytree from ``GPSLCObject.retained_samples()``.
    """
    return jax.tree.map(lambda leaf: leaf[i], samples)


def conditional_ite(
    spec: ModelSpec,
    data: ModelData,
    params: GPSLCParams,
    do_t,
):
    """Closed-form GP counterfactual: mean and covariance of ``f* - f | Y``.

    Mirrors ``conditionalITE`` (``src/estimation.jl:36-50``) on top of the
    conditioning blocks of ``likelihoodDistribution`` (``src/likelihood.jl``):

        MeanITE = (K(W,W*)' - K(W,W)) (K(W,W) + yNoise I)^-1 Y
        CovITE  = C11 - C12 - C21 + C22
    """
    cov_ww, cov_wws, cov_wsws, _, chol = _conditioning_core(spec, data, params, do_t)
    c11, c12, c21, c22 = _c_blocks(cov_ww, cov_wws, cov_wsws, chol)
    mean_ite = (cov_wws.T - cov_ww) @ chol_solve(chol, data.y)
    cov_ite = c11 - c12 - c21 + c22
    return mean_ite, cov_ite


def ite_distributions(
    spec: ModelSpec,
    data: ModelData,
    samples: GPSLCParams,
    do_t,
    prediction_covariance_noise: float = 1e-10,
):
    """Batched ``conditionalITE`` over a stacked sample pytree.

    ``samples`` leaves have leading dim S (retained posterior samples, chains
    already flattened in). Returns ``(MeanITEs (S, n), CovITEs (S, n, n))``
    with the reference's symmetrize + diagonal-noise stabilization
    (``src/estimation.jl:82``).
    """
    def one(p):
        mean, cov = conditional_ite(spec, data, p, do_t)
        cov = symmetrize(cov)
        cov = add_jitter(cov, prediction_covariance_noise)
        return mean, cov

    return jax.vmap(one)(samples)


def ite_samples(key: jax.Array, mean_ites: jax.Array, cov_ites: jax.Array, n_per_mixture: int):
    """Draw ``n_per_mixture`` MVN samples per mixture component.

    Returns ``(n, S * n_per_mixture)`` — the reference's column layout
    (``ITEsamples``, ``src/estimation.jl:95-109``) with one factorization per
    component instead of one per draw.

    float64 factorizes with Cholesky (exact reference parity). float32 draws
    through a nearest-PSD eigendecomposition factor instead: the C-block
    assembly ``C11 - C12 - C21 + C22`` carries an ABSOLUTE cancellation error
    of ~eps_f32 * scale(CovWW), which routinely exceeds the tiny CovITE's own
    scale (measured: min eigenvalue ~-1e-5 against mean diag ~6e-3 on NEEC),
    so no output-relative jitter can make Cholesky reliable there. Clamping
    eigenvalues at zero projects to the nearest PSD matrix; draws stay exact
    for the represented covariance.
    """
    s, n = mean_ites.shape
    if jnp.dtype(mean_ites.dtype) == jnp.float64:
        factors = safe_cholesky(cov_ites)  # (S, n, n) batched
    else:
        w, v = jnp.linalg.eigh(symmetrize(cov_ites))
        factors = v * jnp.sqrt(jnp.clip(w, 0.0))[..., None, :]
    z = jax.random.normal(key, (s, n_per_mixture, n), dtype=mean_ites.dtype)
    draws = mean_ites[:, None, :] + jnp.einsum("sij,smj->smi", factors, z)
    return draws.reshape(s * n_per_mixture, n).T


def conditional_counterfactual_outcome(
    spec: ModelSpec,
    data: ModelData,
    params: GPSLCParams,
    do_t,
):
    """Posterior of the counterfactual outcome process ``f* | Y`` under
    ``doT`` — the "directly predicting Y_cf" use of the conditioning blocks
    that ``likelihoodDistribution``'s docstring names (``src/likelihood.jl:5``)
    but the reference never exposes:

        mean = K(W,W*)' (K(W,W) + yNoise I)^-1 Y,   cov = C22.
    """
    _, cov_wws, cov_wsws, _, chol = _conditioning_core(spec, data, params, do_t)
    # only the C22 block is needed: one solve, not the full 2x2 block set
    c22 = cov_wsws - cov_wws.T @ chol_solve(chol, cov_wws)
    mean_cf = cov_wws.T @ chol_solve(chol, data.y)
    return mean_cf, c22


def counterfactual_outcome_distributions(
    spec: ModelSpec,
    data: ModelData,
    samples: GPSLCParams,
    do_t,
    prediction_covariance_noise: float = 1e-10,
):
    """Batched ``conditional_counterfactual_outcome`` over posterior samples."""
    def one(p):
        mean, cov = conditional_counterfactual_outcome(spec, data, p, do_t)
        return mean, add_jitter(symmetrize(cov), prediction_covariance_noise)

    return jax.vmap(one)(samples)


def conditional_sate(mean_ite: jax.Array, cov_ite: jax.Array):
    """``(mean(MeanITE), sum(CovITE) / n^2)`` (``src/estimation.jl:116-121``)."""
    n = mean_ite.shape[-1]
    return jnp.mean(mean_ite, axis=-1), jnp.sum(cov_ite, axis=(-2, -1)) / (n * n)


def sate_distributions(
    spec: ModelSpec,
    data: ModelData,
    samples: GPSLCParams,
    do_t,
    prediction_covariance_noise: float = 1e-10,
):
    mean_ites, cov_ites = ite_distributions(spec, data, samples, do_t, prediction_covariance_noise)
    return conditional_sate(mean_ites, cov_ites)


def sate_samples(
    key: jax.Array,
    mean_sates: jax.Array,
    var_sates: jax.Array,
    n_per_mixture: int,
    reference_quirks: bool = False,
):
    """Normal draws per mixture component, flattened to (S * n_per_mixture,).

    ``reference_quirks=True`` passes the variance where a standard deviation
    belongs, byte-matching ``SATEsamples`` (``src/estimation.jl:159``).
    """
    s = mean_sates.shape[0]
    scale = var_sates if reference_quirks else jnp.sqrt(var_sates)
    z = jax.random.normal(key, (s, n_per_mixture), dtype=mean_sates.dtype)
    draws = mean_sates[:, None] + scale[:, None] * z
    return draws.reshape(-1)
