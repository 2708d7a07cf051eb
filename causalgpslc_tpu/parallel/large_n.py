"""Large-N MCMC: the N x N covariances sharded over a device mesh.

This is BASELINE config #4 (N = 5k-50k), the scaling axis the reference
lacks entirely: its kernels are dense ``zeros(n, n)`` double loops
(``/root/reference/src/kernel.jl:24-42``) and every density evaluation is a
single-CPU LAPACK Cholesky, capping it at N of a few hundred (largest
shipped dataset: IHDP, n=272).

Design (SPMD over a 1-D ``"n"`` mesh axis):

- **Vectors stay replicated.** T, Y, U, hyperparameters, PRNG keys are O(N)
  or O(1) — trivially small even at N=50k.  All control flow (MH
  accept/reject, ESS angle shrinkage) computes identically on every device.
- **Only the N x N covariances are sharded.** Each density evaluation
  builds its (N/D, N) row block locally from the replicated feature vectors
  (``ops/dist_linalg.dist_rbf_cov_rows``) and runs the distributed Cholesky
  + forward solve (``dist_mvn_logpdf``).  Both O(N^2) memory and O(N^3)
  FLOPs divide by the mesh size; the per-panel ``all_gather`` rides ICI.
- **SigmaU never materializes.** The U prior and the elliptical-slice
  ``nu`` draws use the O(N) Sherman-Morrison closed forms of
  ``ops/structured.py`` instead of the reference's dense ``generateSigmaU``
  block matrix (``src/utils.jl:17-33``).
- **Blocked MH sweeps only.** One distributed factorization scores a joint
  proposal over all sites of a GP block (treatment block, outcome block) —
  the large-N counterpart of the dense engine's ``mh_blocked_sweep`` fast
  path.  Site-by-site sweeps would multiply the distributed-Cholesky count
  by the site count for the same stationary distribution family.

Padding: N is padded up to a multiple of ``D * block`` with sentinel points
placed so far away that their kernel rows are exactly zero; the padded
block contributes a closed-form constant to the log-density which is
subtracted exactly (it depends on scale/noise, so it cannot be ignored in
MH ratios).

Covers the full with-confounder model family: continuous or binary
treatment, with or without covariates —

- **Covariate blocks** (``generateXfromU``, ``src/model_likelihood.jl:13-22``)
  are per-column sharded GPs over the replicated U features; each column's
  hyperparameters get their own joint MH block (one distributed
  factorization per column per sweep).
- **Binary treatment** (``src/inference.jl:216-237``): the latent ``logitT``
  is a replicated O(N) vector; its GP prior covariance is recomputed (one
  distributed Cholesky) once per outer iteration exactly as the reference
  recomputes ``logitTCov``, then each elliptical-slice sweep draws
  ``nu = L z`` via a local row matvec + one all_gather and scores the O(N)
  Bernoulli likelihood with no collectives at all.

**NoU variants** (``n_u=0``, no ``obj`` column): the T- and Y-GPs are still
dense N x N in the X/T features, so the sharded engine applies unchanged —
it simply drops the U sites, the SigmaU prior and the U elliptical-slice
phase (and, with no covariates either, the treatment block degenerates to
the reference's identity prior, ``src/model_prior.jl:175-200``: binary
``logitT`` keeps its ES phase against a standard-normal prior at O(N)).
"""

from __future__ import annotations

import functools
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from jax import lax

from ..hyperparameters import HyperParameters, default_hyperparameters, default_prior_parameters
from ..inference.ess import ess_update
from ..inference.proposal import propose, proposal_logpdf
from ..models.spec import GPSLCParams
from ..ops.distributions import bernoulli_logit_logpdf, inv_gamma_logpdf
from ..ops.dist_linalg import (
    dist_cholesky,
    dist_forward_solve_quad,
    dist_mvn_logpdf,
    dist_rbf_cov_rows,
    local_rows,
)
from ..ops.structured import segment_ids_from_counts, sigma_u_logpdf, sigma_u_sample

__all__ = [
    "n_mesh",
    "chains_n_mesh",
    "sharded_gp_logpdf",
    "run_mcmc_large_n",
    "run_mcmc_large_n_checkpointed",
    "conditional_ite_large_n",
    "ite_distributions_large_n",
    "ite_distributions_grid_large_n",
    "ite_samples_marginal",
    "LargeNStats",
]

N_AXIS = "n"

# Sentinel offset for padded points: distance^2 >= 1e8 makes every padded
# kernel entry exp(-1e8) == 0.0 exactly in both float32 and float64.
_PAD_SENTINEL = 1.0e4


class LargeNStats(NamedTuple):
    mh_accept_rate: jax.Array
    ess_iters: jax.Array
    log_joint: jax.Array


def n_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the row axis of the N x N covariances."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (N_AXIS,))


CHAIN_AXIS = "chains"


def chains_n_mesh(n_chain_rows: int, devices=None) -> Mesh:
    """2-D (chains, n) mesh: chain data-parallelism composed with intra-op
    N-sharding. Each of the ``n_chain_rows`` rows holds an independent
    chain group whose N x N covariances shard over that row's devices; the
    "n" collectives (distributed Cholesky panels, psum reductions) stay
    within a row, and cross-chain pooled statistics reduce over "chains"."""
    if devices is None:
        devices = jax.devices()
    nd = len(devices)
    if nd % n_chain_rows != 0:
        raise ValueError(f"{nd} devices do not split into {n_chain_rows} chain rows")
    return Mesh(
        np.asarray(devices).reshape(n_chain_rows, nd // n_chain_rows),
        (CHAIN_AXIS, N_AXIS),
    )


def _padded_size(n: int, n_devices: int, block: int) -> int:
    q = n_devices * block
    return ((n + q - 1) // q) * q


def _pad_features(f: jax.Array, n_pad: int) -> jax.Array:
    """Append sentinel rows mutually and jointly far from all real points."""
    if n_pad == 0:
        return f
    sent = _PAD_SENTINEL * (1.0 + jnp.arange(n_pad, dtype=f.dtype))[:, None]
    return jnp.concatenate([f, jnp.broadcast_to(sent, (n_pad, f.shape[1]))], axis=0)


def _pad_vec(v: jax.Array, n_pad: int) -> jax.Array:
    return jnp.concatenate([v, jnp.zeros((n_pad,), dtype=v.dtype)]) if n_pad else v


def _rel_jitter(scale, noise, dtype):
    """float32 needs a relative diagonal floor (mirrors ``stabilize_cov``:
    the diagonal of every GPSLC covariance is exactly ``scale + noise``)."""
    if dtype == jnp.float32:
        return 1e-5 * (scale + noise)
    return jnp.zeros((), dtype=dtype)


def _pad_correction(n_pad: int, diag_val, dtype):
    """Padded points contribute ``n_pad`` iid ``N(0; diag_val)`` zeros."""
    if n_pad == 0:
        return jnp.zeros((), dtype=dtype)
    two_pi = jnp.asarray(2.0 * jnp.pi, dtype=dtype)
    return -0.5 * n_pad * (jnp.log(two_pi) + jnp.log(diag_val))


def _gp_logpdf_shard(features, y, scale, noise, *, axis, n_local, block, unroll, n_pad):
    """Replicated ``log N(y; 0, exp(-cdist^2(features)) * scale + noise I)``.

    Call inside ``shard_map``; ``features``/``y`` are padded and replicated.
    """
    dtype = y.dtype
    jitter = _rel_jitter(scale, noise, dtype)
    cov_loc = dist_rbf_cov_rows(
        [features], [jnp.ones((), dtype=dtype)], scale, noise + jitter,
        axis=axis, n_local=n_local,
    )
    rows = local_rows(axis, n_local)
    lp = dist_mvn_logpdf(cov_loc, y[rows], axis=axis, block=block, unroll=unroll)
    return lp - _pad_correction(n_pad, scale + noise + jitter, dtype)


def sharded_gp_logpdf(
    features: jax.Array,
    y: jax.Array,
    scale,
    noise,
    *,
    mesh: Optional[Mesh] = None,
    block: int = 256,
    unroll: int = 1,
) -> jax.Array:
    """Distributed GP log-density ``log N(y; 0, build_cov(features, scale, noise))``.

    The standalone sharded counterpart of the dense
    ``models.blocks.build_cov`` + ``ops.linalg.mvn_logpdf`` pair; handles
    arbitrary N by sentinel padding.
    """
    mesh = mesh if mesh is not None else n_mesh()
    n_dev = mesh.devices.size
    features = jnp.asarray(features)
    features = features[:, None] if features.ndim == 1 else features
    y = jnp.asarray(y)
    n = y.shape[0]
    n_padded = _padded_size(n, n_dev, block)
    n_pad = n_padded - n
    f_p = _pad_features(features.astype(y.dtype), n_pad)
    y_p = _pad_vec(y, n_pad)
    scale = jnp.asarray(scale, dtype=y.dtype)
    noise = jnp.asarray(noise, dtype=y.dtype)

    body = partial(
        _gp_logpdf_shard,
        axis=N_AXIS,
        n_local=n_padded // n_dev,
        block=block,
        unroll=unroll,
        n_pad=n_pad,
    )
    shmap = jax.shard_map(body, mesh=mesh, in_specs=P(), out_specs=P())
    return jax.jit(shmap)(f_p, y_p, scale, noise)


# ---------------------------------------------------------------------------
# Large-N MCMC (with-confounder variants: {RealT, BinaryT} x {Cov, NoCov})
# ---------------------------------------------------------------------------

_SITE_PRIOR = {
    "u_noise": "uNoise",
    "t_noise": "tNoise",
    "y_noise": "yNoise",
    "x_noise": "xNoise",
    "ut_ls": "utLS",
    "uy_ls": "uyLS",
    "ty_ls": "tyLS",
    "ux_ls": "uxLS",
    "xt_ls": "xtLS",
    "xy_ls": "xyLS",
    "t_scale": "tScale",
    "y_scale": "yScale",
    "x_scale": "xScale",
}


def _site_prior_lp(priors, name, val):
    stem = _SITE_PRIOR[name]
    return jnp.sum(inv_gamma_logpdf(val, priors[stem + "Shape"], priors[stem + "Scale"]))


def _mh_block(key, params, sites, cur_lp, lp_fn, priors, drift):
    """Joint InvGamma-drift MH move over a GP block's hyperparameter sites.

    One distributed density evaluation scores the whole block (the large-N
    ``mh_blocked_sweep``); proposal is the reference's moment-matched
    InvGamma drift applied independently per site
    (``src/proposal.jl:32-41``).
    """
    new_vals = {}
    log_q_fwd = jnp.zeros((), dtype=cur_lp.dtype)
    log_q_rev = jnp.zeros((), dtype=cur_lp.dtype)
    prior_cur = jnp.zeros((), dtype=cur_lp.dtype)
    prior_new = jnp.zeros((), dtype=cur_lp.dtype)
    for i, s in enumerate(sites):
        cur = getattr(params, s)
        prop = propose(jax.random.fold_in(key, i), cur, drift)
        new_vals[s] = prop
        log_q_fwd = log_q_fwd + jnp.sum(proposal_logpdf(prop, cur, drift))
        log_q_rev = log_q_rev + jnp.sum(proposal_logpdf(cur, prop, drift))
        prior_cur = prior_cur + _site_prior_lp(priors, s, cur)
        prior_new = prior_new + _site_prior_lp(priors, s, prop)

    cand = params._replace(**new_vals)
    new_lp = lp_fn(cand)
    log_alpha = (new_lp + prior_new + log_q_rev) - (cur_lp + prior_cur + log_q_fwd)
    accept = jnp.log(jax.random.uniform(jax.random.fold_in(key, 1000), dtype=cur_lp.dtype)) < log_alpha
    out = jax.tree.map(lambda a, b: jnp.where(accept, a, b), cand, params)
    return out, jnp.where(accept, new_lp, cur_lp), accept.astype(cur_lp.dtype)


def _mh_x_col(key, params, k, cur_lp, lp_fn, priors, drift):
    """Joint MH move over covariate column k's sites
    ``{xNoise[k], xScale[k], uxLS[k, :]}`` — the large-N counterpart of the
    dense blocked sweep's per-column x-block (one distributed factorization
    per column; columns are independent given U,
    ``generateXfromU``, ``src/model_likelihood.jl:13-22``)."""
    pieces = (
        ("x_noise", params.x_noise[k]),
        ("x_scale", params.x_scale[k]),
        ("ux_ls", params.ux_ls[k]),
    )
    dtype = cur_lp.dtype
    log_q_fwd = log_q_rev = prior_cur = prior_new = jnp.zeros((), dtype=dtype)
    props = {}
    for i, (name, cur) in enumerate(pieces):
        prop = propose(jax.random.fold_in(key, i), cur, drift)
        props[name] = prop
        log_q_fwd = log_q_fwd + jnp.sum(proposal_logpdf(prop, cur, drift))
        log_q_rev = log_q_rev + jnp.sum(proposal_logpdf(cur, prop, drift))
        prior_cur = prior_cur + _site_prior_lp(priors, name, cur)
        prior_new = prior_new + _site_prior_lp(priors, name, prop)

    cand = params._replace(
        x_noise=params.x_noise.at[k].set(props["x_noise"]),
        x_scale=params.x_scale.at[k].set(props["x_scale"]),
        ux_ls=params.ux_ls.at[k].set(props["ux_ls"]),
    )
    new_lp = lp_fn(cand)
    log_alpha = (new_lp + prior_new + log_q_rev) - (cur_lp + prior_cur + log_q_fwd)
    accept = jnp.log(jax.random.uniform(jax.random.fold_in(key, 1000), dtype=dtype)) < log_alpha
    out = jax.tree.map(lambda a, b: jnp.where(accept, a, b), cand, params)
    return out, jnp.where(accept, new_lp, cur_lp), accept.astype(dtype)


def run_mcmc_large_n(
    key: jax.Array,
    t,
    y,
    counts=None,
    *,
    x=None,
    binary_t: Optional[bool] = None,
    n_u: Optional[int] = 1,
    priors: Optional[dict] = None,
    hp: Optional[HyperParameters] = None,
    mesh: Optional[Mesh] = None,
    block: int = 256,
    unroll: int = 1,
    dtype=None,
    init_params: Optional[GPSLCParams] = None,
    step_keys: Optional[jax.Array] = None,
):
    """Sharded-N MCMC for the with-confounder GPSLC variants.

    Args:
      x: optional (N, nX) covariates — adds the per-column X GP blocks
        (``CausalGPSLC{RealT,BinaryT}``, ``src/model.jl:11-27``, ``:73-89``).
      binary_t: treat T as binary (latent ``logitT`` + Bernoulli likelihood,
        Algorithm 3's ES over ``:logitT``, ``src/inference.jl:216-237``).
        ``None`` auto-detects from the values of ``t``.
      n_u: latent confounder dimensionality; ``0`` or ``None`` selects the
        NoU variants (``CausalGPSLCNoU*``, ``src/model.jl:92-130``) — no U
        sites, no SigmaU prior, no U elliptical-slice phase; ``counts`` may
        be ``None``. The T/Y GPs stay dense N x N in the X/T features and
        shard exactly as the with-confounder path. With neither U nor X the
        treatment prior is the identity (``src/model_prior.jl:175-200``):
        continuous T contributes a data constant; binary T keeps an O(N)
        collective-free ES phase for ``logitT`` against N(0, I).
      init_params: resume from this chain state instead of a prior draw
        (block log-likelihoods are recomputed exactly from it).
      step_keys: explicit per-outer-iteration PRNG keys — the chunked
        runner passes slices of one split so interrupted runs reproduce the
        uninterrupted chain bit-exactly.

    Chains: on a 1-D ``n_mesh()`` this runs ONE chain and sample leaves lead
    with ``n_outer``. On a 2-D :func:`chains_n_mesh` mesh it runs
    ``hp.n_chains`` chains (a multiple of the chains-axis size), vmapped over
    each row's local chains and sharded over the ``"chains"`` axis — chain
    ``c`` uses key ``fold_in(key, c)`` and is bit-identical to a 1-D run
    from that key (tested); sample leaves then lead with
    ``(n_chains, n_outer)``, mirroring
    :func:`causalgpslc_tpu.inference.gibbs.run_mcmc`.
    """
    priors = dict(priors) if priors is not None else default_prior_parameters()
    hp = hp if hp is not None else default_hyperparameters()
    mesh = mesh if mesh is not None else n_mesh()
    # N-sharding spans only the "n" axis (a 2-D chains x n mesh divides its
    # devices between chain rows, each row sharding the covariances)
    n_dev = mesh.shape[N_AXIS]

    t = np.asarray(t)
    y = np.asarray(y)
    if binary_t is None:
        binary_t = bool(np.all(np.isin(t, (0.0, 1.0))))
    nx = 0 if x is None else int(np.asarray(x).shape[1])
    dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    n = y.shape[0]
    n_padded = _padded_size(n, n_dev, block)
    n_pad = n_padded - n
    n_local = n_padded // n_dev
    n_u = int(n_u or 0)
    has_u = n_u > 0
    if has_u and counts is None:
        raise ValueError("counts (object structure) is required when n_u > 0")
    seg_ids = segment_ids_from_counts(counts) if has_u else None
    counts_t = tuple(int(c) for c in counts) if has_u else ()
    drift = jnp.asarray(priors["drift"], dtype=dtype)
    eps = float(priors.get("sigmaUNoise", 1e-13))
    if dtype == jnp.float32 and eps < 1e-5:
        # f32 stabilization, mirroring the dense engine's stabilize_cov
        # relative floor: the Sherman-Morrison U-prior divides by
        # a = uNoise * eps, and at eps=1e-13 the f32 cancellation error in
        # the quadratic form (~1e-8 absolute) is amplified by 1/a into 1e9+
        # garbage log-densities (observed at N=5000 on-chip). The dense f32
        # path floors SigmaU's effective eps at ~1e-5 the same way.
        eps = 1e-5
    ucov = float(priors.get("sigmaUCov", 1.0))
    priors_j = {k: jnp.asarray(v, dtype=dtype) for k, v in priors.items() if k != "SigmaU"}

    t_j = jnp.asarray(t, dtype=dtype)
    y_p = _pad_vec(jnp.asarray(y, dtype=dtype), n_pad)
    x_j = None if nx == 0 else jnp.asarray(np.asarray(x), dtype=dtype)
    x_p = None if nx == 0 else jnp.concatenate(
        [x_j, jnp.zeros((n_pad, nx), dtype=dtype)], axis=0
    )

    n_mh_inner = hp.n_mh_inner or 1
    n_es_inner = hp.n_es_inner or 0

    # Without U the T-block exists only when covariates drive it; with
    # neither U nor X the treatment prior is the identity and carries no
    # hyperparameter sites at all (src/model_prior.jl:175-200).
    has_t_gp = has_u or nx > 0
    t_sites = (
        (("ut_ls",) if has_u else ())
        + (("t_scale", "t_noise") if has_t_gp else ())
        + (("xt_ls",) if nx else ())
    )
    y_sites = (
        (("uy_ls",) if has_u else ())
        + ("ty_ls", "y_scale", "y_noise")
        + (("xy_ls",) if nx else ())
    )
    nx_gp = nx if has_u else 0  # X-from-U GPs exist only with confounders
    # u-block + t-block + y-block + one per covariate column (as present)
    n_mh_blocks = int(has_u) + int(has_t_gp) + 1 + nx_gp

    def _gp_lp(feats_unpadded, target_p, scale, noise):
        return _gp_logpdf_shard(
            _pad_features(feats_unpadded, n_pad), target_p, scale, noise,
            axis=N_AXIS, n_local=n_local, block=block, unroll=unroll, n_pad=n_pad,
        )

    t_p = _pad_vec(t_j, n_pad)

    def t_feats(params, u):
        # additive log-kernels over (U, X) == one pairwise pass over the
        # concatenated scaled features (generateRealTfromUX family,
        # src/model_likelihood.jl:25-80)
        parts = []
        if has_u:
            parts.append(u / params.ut_ls)
        if nx:
            parts.append(x_j / params.xt_ls)
        return jnp.concatenate(parts, axis=1)

    def _std_normal_lp(target_unpadded):
        # identity-covariance treatment prior (NoU NoCov variants,
        # src/model_prior.jl:175-200): O(N), replicated, collective-free
        return -0.5 * (
            jnp.sum(target_unpadded * target_unpadded)
            + n * jnp.log(jnp.asarray(2.0 * jnp.pi, dtype=dtype))
        )

    def lp_t(params, u, logit_t=None):
        # continuous: N(T; 0, tCov); binary: the GP factor N(logitT; 0, tCov)
        if not has_t_gp:
            return _std_normal_lp(logit_t if binary_t else t_j)
        target = t_p if not binary_t else _pad_vec(logit_t, n_pad)
        return _gp_lp(t_feats(params, u), target, params.t_scale, params.t_noise)

    def lp_y(params, u):
        # Y | U, X, T (generateYfromUXT, src/model_likelihood.jl:83-91)
        parts = [t_j[:, None] / params.ty_ls]
        if has_u:
            parts.append(u / params.uy_ls)
        if nx:
            parts.append(x_j / params.xy_ls)
        return _gp_lp(jnp.concatenate(parts, axis=1), y_p, params.y_scale, params.y_noise)

    def lp_x_k(params, u, k):
        # X[:, k] | U (generateXfromU, src/model_likelihood.jl:13-22)
        return _gp_lp(
            u / params.ux_ls[k], x_p[:, k], params.x_scale[k], params.x_noise[k]
        )

    def lp_x_all(params, u):
        # X-from-U GP columns; NoU variants have no X model (X ~ iid N(0, I)
        # prior constant, src/model_prior.jl:175-181 — excluded from the
        # tracked block lps like every data constant)
        if nx_gp == 0:
            return jnp.zeros((0,), dtype=dtype)
        return jnp.stack([lp_x_k(params, u, k) for k in range(nx)])

    def lp_u(params, u):
        if not has_u:
            return jnp.zeros((), dtype=dtype)
        return jnp.sum(
            sigma_u_logpdf(u.T, seg_ids, counts_t, params.u_noise, eps=eps, cov=ucov)
        )

    def bern_lp(logit_t):
        # O(N) replicated, collective-free (the Map-bernoulli factor,
        # src/model_likelihood.jl:25-33)
        return bernoulli_logit_logpdf(t_j, logit_t)

    def _t_chol_loc(params, u):
        """Local row shard of chol(tCov) — the frozen per-outer-iteration
        logitT prior factor (the reference's logitTCov recompute,
        src/inference.jl:216-227). ``(None, None)`` for the identity prior
        (NoU NoCov: no factorization exists to freeze)."""
        if not has_t_gp:
            return None, None
        jitter = _rel_jitter(params.t_scale, params.t_noise, dtype)
        feats_p = _pad_features(t_feats(params, u), n_pad)
        cov_loc = dist_rbf_cov_rows(
            [feats_p], [jnp.ones((), dtype=dtype)],
            params.t_scale, params.t_noise + jitter,
            axis=N_AXIS, n_local=n_local,
        )
        return dist_cholesky(cov_loc, axis=N_AXIS, block=block, unroll=unroll), jitter

    def _t_nu(nk, l_loc):
        """nu ~ N(0, tCov): local (Nl, Np) row matvec, assembled with one
        psum (scatter-into-zeros + all-reduce ≡ all_gather, but psum output
        is mesh-INVARIANT, which the elliptical-slice while_loop requires —
        shard_map's varying-axes check rejects carries derived from
        all_gather). The sentinel-padded cov is block-diagonal so rows [:n]
        involve only the real block."""
        if l_loc is None:  # identity prior: nu ~ N(0, I), no collectives
            return jax.random.normal(nk, (n,), dtype=dtype)
        z = jax.random.normal(nk, (n_padded,), dtype=dtype)
        loc = jnp.matmul(l_loc, z, precision=jax.lax.Precision.HIGHEST)  # (Nl,)
        rows = local_rows(N_AXIS, n_local)
        full = jnp.zeros((n_padded,), dtype=dtype).at[rows].set(loc)
        return lax.psum(full, N_AXIS)[:n]

    def _lp_t_frozen(params, l_loc, jitter, logit_t):
        """GP factor of a new logitT under the FROZEN tCov factor — a panel
        forward solve, no new factorization (mirrors the dense engine's
        mvn_logpdf_b(lt_new, t_fac) refresh)."""
        if l_loc is None:
            return _std_normal_lp(logit_t)
        lt_p = _pad_vec(logit_t, n_pad)
        rows = local_rows(N_AXIS, n_local)
        quad, logdet = dist_forward_solve_quad(
            l_loc, lt_p[rows], axis=N_AXIS, block=block, unroll=unroll
        )
        cst = n_padded * jnp.log(jnp.asarray(2.0 * jnp.pi, dtype=dtype))
        diag_val = params.t_scale + params.t_noise + jitter
        return -0.5 * (quad + logdet + cst) - _pad_correction(n_pad, diag_val, dtype)

    def outer_step(carry, step_key):
        params, lps = carry
        lpu, lpx, lpt, lpy, bll = lps
        k_mh, k_ess = jax.random.split(step_key)
        n_acc = jnp.zeros((), dtype=dtype)

        # ---- Algorithm 2: blocked MH sweeps ------------------------------
        for i in range(n_mh_inner):
            ki = jax.random.fold_in(k_mh, i)
            if has_u:
                params, lpu, a0 = _mh_block(
                    jax.random.fold_in(ki, 0), params, ("u_noise",), lpu,
                    lambda p: lp_u(p, params.u), priors_j, drift,
                )
                n_acc = n_acc + a0
            if has_t_gp:
                params, lpt, a1 = _mh_block(
                    jax.random.fold_in(ki, 1), params, t_sites, lpt,
                    lambda p, params=params: lp_t(p, params.u, params.logit_t),
                    priors_j, drift,
                )
                n_acc = n_acc + a1
            params, lpy, a2 = _mh_block(
                jax.random.fold_in(ki, 2), params, y_sites, lpy,
                lambda p: lp_y(p, params.u), priors_j, drift,
            )
            n_acc = n_acc + a2
            for k in range(nx_gp):
                params, lpk, ak = _mh_x_col(
                    jax.random.fold_in(ki, 3 + k), params, k, lpx[k],
                    lambda p, k=k, params=params: lp_x_k(p, params.u, k),
                    priors_j, drift,
                )
                lpx = lpx.at[k].set(lpk)
                n_acc = n_acc + ak

        # ---- Algorithm 3: elliptical slice over logitT and U columns -----
        ess_iters = jnp.zeros((), dtype=jnp.int32)
        if n_es_inner > 0:
            if binary_t:
                # logitT prior covariance frozen at post-MH params for the
                # whole ES loop, exactly as the reference recomputes
                # logitTCov once per outer iteration (src/inference.jl:216-237)
                l_loc_t, t_jit = _t_chol_loc(params, params.u)
            for j in range(n_es_inner):
                kj = jax.random.fold_in(k_ess, j)
                if binary_t:
                    def b_lik(lt):
                        return bern_lp(lt), jnp.zeros((), dtype=dtype)

                    lt_new, bll, _, it = ess_update(
                        jax.random.fold_in(kj, 1000), params.logit_t,
                        lambda nk: _t_nu(nk, l_loc_t), b_lik, bll,
                        jnp.zeros((), dtype=dtype),
                    )
                    params = params._replace(logit_t=lt_new)
                    lpt = _lp_t_frozen(params, l_loc_t, t_jit, lt_new)
                    ess_iters = ess_iters + it

                for k in range(n_u):
                    def u_lik(col, params=params, k=k):
                        u2 = params.u.at[:, k].set(col)
                        lx = lp_x_all(params, u2)
                        lt = lp_t(params, u2, params.logit_t)
                        ly = lp_y(params, u2)
                        return jnp.sum(lx) + lt + ly, (lx, lt, ly)

                    def nu_sample(nk, params=params):
                        return sigma_u_sample(
                            nk, seg_ids, counts_t, params.u_noise,
                            eps=eps, cov=ucov, dtype=dtype,
                        )

                    col_new, _, (lpx, lpt, lpy), it = ess_update(
                        jax.random.fold_in(kj, k), params.u[:, k], nu_sample,
                        u_lik, jnp.sum(lpx) + lpt + lpy, (lpx, lpt, lpy),
                    )
                    params = params._replace(u=params.u.at[:, k].set(col_new))
                    ess_iters = ess_iters + it
            lpu = lp_u(params, params.u)

        stats = LargeNStats(
            mh_accept_rate=n_acc / (n_mh_blocks * n_mh_inner),
            ess_iters=ess_iters,
            log_joint=lpu + jnp.sum(lpx) + lpt + lpy + bll,
        )
        return (params, (lpu, lpx, lpt, lpy, bll)), (params, stats)

    resume = init_params is not None

    def run_shard(step_keys, k_lt, u0, params0):
        if not resume:
            params0 = params0._replace(u=u0)
            if binary_t:
                # logitT ~ N(0, tCov) prior draw (init_from_prior parity,
                # src/inference.jl:20 via Gen.generate)
                l0, _ = _t_chol_loc(params0, u0)
                params0 = params0._replace(logit_t=_t_nu(k_lt, l0))
        # block log-likelihoods are a pure function of the state, so a
        # resumed chunk recomputes them exactly
        lps0 = (
            lp_u(params0, params0.u),
            lp_x_all(params0, params0.u),
            lp_t(params0, params0.u, params0.logit_t),
            lp_y(params0, params0.u),
            bern_lp(params0.logit_t) if binary_t else jnp.zeros((), dtype=dtype),
        )
        (final, _), (samples, stats) = jax.lax.scan(
            outer_step, (params0, lps0), step_keys
        )
        return samples, stats, final

    from ..ops.distributions import inv_gamma_sample

    def chain_inputs(chain_key, chain_init):
        """Derive one chain's (step_keys, k_lt, u0, params0) — identical to
        the single-chain derivation, so a chain on the 2-D mesh is bit-exact
        with a 1-D run from the same chain key."""
        k_init, k_run = jax.random.split(chain_key)
        k_lt, k_steps = jax.random.split(k_run)
        sk = jax.random.split(k_steps, hp.n_outer) if step_keys is None else step_keys

        if chain_init is not None:
            params0 = jax.tree.map(lambda a: jnp.asarray(a, dtype=dtype), chain_init)
            return sk, k_lt, params0.u, params0

        # init from the prior (replicated randomness)
        def ig(kk, stem, shape=()):
            a = jnp.full(shape, priors_j[stem + "Shape"], dtype=dtype)
            b = jnp.full(shape, priors_j[stem + "Scale"], dtype=dtype)
            return inv_gamma_sample(kk, a, b)

        keys = jax.random.split(k_init, 14)
        u_noise0 = ig(keys[1], "uNoise") if has_u else None
        u0 = (
            jax.vmap(
                lambda kk: sigma_u_sample(kk, seg_ids, counts_t, u_noise0, eps=eps, cov=ucov, dtype=dtype)
            )(jax.random.split(keys[0], n_u)).T
            if has_u
            else None
        )
        params0 = GPSLCParams(
            u_noise=u_noise0,
            t_noise=ig(keys[2], "tNoise") if has_t_gp else None,
            y_noise=ig(keys[3], "yNoise"),
            ut_ls=ig(keys[4], "utLS", (n_u,)) if has_u else None,
            uy_ls=ig(keys[5], "uyLS", (n_u,)) if has_u else None,
            ty_ls=ig(keys[6], "tyLS"),
            t_scale=ig(keys[7], "tScale") if has_t_gp else None,
            y_scale=ig(keys[9], "yScale"),
            u=jnp.zeros((n, n_u), dtype=dtype) if has_u else None,
            x_noise=ig(keys[10], "xNoise", (nx,)) if nx_gp else None,
            x_scale=ig(keys[11], "xScale", (nx,)) if nx_gp else None,
            ux_ls=ig(keys[12], "uxLS", (nx, n_u)) if nx_gp else None,
            xt_ls=ig(keys[13], "xtLS", (nx,)) if nx else None,
            xy_ls=ig(keys[8], "xyLS", (nx,)) if nx else None,
            logit_t=jnp.zeros((n,), dtype=dtype) if binary_t else None,
        )
        return sk, k_lt, u0, params0

    base_key = jax.random.key(0) if key is None else key

    if CHAIN_AXIS not in mesh.axis_names:
        # 1-D "n" mesh: single chain (the original path)
        sk, k_lt, u0, params0 = chain_inputs(base_key, init_params if resume else None)
        shmap = jax.shard_map(run_shard, mesh=mesh, in_specs=P(), out_specs=P())
        return jax.jit(shmap)(sk, k_lt, u0, params0)

    # 2-D (chains, n) mesh: chains are embarrassingly parallel, so the SAME
    # per-chain program runs vmapped over the local chain rows with all "n"
    # collectives confined to each chains-row of the mesh. Chain c's key is
    # fold_in(key, c), exactly what a 1-D run of that chain would use, so
    # per-chain results are bit-identical to 1-D runs (tested). Cross-chain
    # pooled statistics reduce over the "chains" axis downstream.
    n_chains = hp.n_chains
    c_size = mesh.shape[CHAIN_AXIS]
    if n_chains % c_size != 0:
        raise ValueError(
            f"n_chains={n_chains} must be a multiple of the chains mesh axis ({c_size})"
        )
    chain_keys = jax.vmap(lambda c: jax.random.fold_in(base_key, c))(
        jnp.arange(n_chains)
    )
    per_chain_init = (
        (lambda c: jax.tree.map(lambda a: None if a is None else a[c], init_params))
        if resume
        else (lambda c: None)
    )
    ins = [chain_inputs(chain_keys[c], per_chain_init(c)) for c in range(n_chains)]
    stack = lambda *ls: jax.tree.map(lambda *xs: jnp.stack(xs), *ls)
    sk_c, k_lt_c, u0_c, params0_c = (stack(*[t[i] for t in ins]) for i in range(4))

    def run_shard_chains(sk, klt, u0, p0):
        return jax.vmap(run_shard)(sk, klt, u0, p0)

    # check_vma=False: the varying-manual-axes analysis would require every
    # loop-carry init inside dist_linalg to be pcast to chains-varying; the
    # collectives themselves are all over the "n" axis and independent of the
    # chains placement, so the check is disabled for the 2-D wrap (per-chain
    # bit-equivalence with the fully-checked 1-D path is regression-tested).
    shmap = jax.shard_map(
        run_shard_chains, mesh=mesh, in_specs=P(CHAIN_AXIS), out_specs=P(CHAIN_AXIS),
        check_vma=False,
    )
    return jax.jit(shmap)(sk_c, k_lt_c, u0_c, params0_c)


def run_mcmc_large_n_checkpointed(
    key: jax.Array,
    t,
    y,
    counts,
    *,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 8,
    progress_callback=None,
    hp: Optional[HyperParameters] = None,
    **kwargs,
):
    """Chunked sharded-N MCMC with mid-run snapshots (crash-safe large-N).

    The large-N analog of :func:`causalgpslc_tpu.parallel.checkpoint.
    run_mcmc_checkpointed`: the full run's per-outer-iteration keys are
    derived once from ``key`` (identically to the one-shot
    :func:`run_mcmc_large_n`), each chunk resumes from the previous chunk's
    final state, and the chain is bit-exact with the uninterrupted run.
    Snapshots reuse the npz chain-state format of ``parallel.checkpoint``.

    The 2-D (chains x n) mesh is NOT supported here: this runner derives one
    explicit ``step_keys`` stream (all chains would share per-outer
    randomness -> correlated chains) and concatenates chunks along axis 0
    (the CHAIN axis of multi-chain samples). Pass a 1-D ``n`` mesh; for
    multi-chain large-N use the one-shot :func:`run_mcmc_large_n` with
    ``chains_n_mesh``.
    """
    import os as _os

    from .checkpoint import load_chain_state, save_chain_state

    mesh_kw = kwargs.get("mesh")
    if mesh_kw is not None and CHAIN_AXIS in getattr(mesh_kw, "axis_names", ()):
        raise ValueError(
            "run_mcmc_large_n_checkpointed does not support a mesh with a "
            f"'{CHAIN_AXIS}' axis: the explicit per-chunk step_keys stream "
            "would be shared across chains and chunk concatenation assumes a "
            "leading outer axis. Use a 1-D n-mesh here, or the one-shot "
            "run_mcmc_large_n for the 2-D chains x n layout."
        )

    hp = hp if hp is not None else default_hyperparameters()
    k_init, k_run = jax.random.split(jax.random.key(0) if key is None else key)
    _, k_steps = jax.random.split(k_run)
    all_step_keys = jax.random.split(k_steps, hp.n_outer)

    if checkpoint_path is not None and _os.path.exists(checkpoint_path):
        params, _key_arr, outer_done, samples, _, saved_stats = load_chain_state(
            checkpoint_path
        )
        # stats persist in the snapshot so a crash-resume returns diagnostics
        # aligned with the full sample horizon, not just post-resume chunks
        stats = (
            LargeNStats(**{f: saved_stats.get(f) for f in LargeNStats._fields})
            if saved_stats is not None
            else None
        )
    else:
        params, outer_done, samples, stats = None, 0, None, None

    def _cat(a, b):
        if a is None:
            return b
        return jax.tree.map(
            lambda x, y: np.concatenate([np.asarray(x), np.asarray(y)], axis=0), a, b
        )

    while outer_done < hp.n_outer:
        n_steps = min(checkpoint_every, hp.n_outer - outer_done)
        sub = all_step_keys[outer_done : outer_done + n_steps]
        # n_burn_in is retention bookkeeping only (no adaptation here);
        # clamp it so the chunk HyperParameters validate
        chunk_hp = hp.replace(n_outer=n_steps, n_burn_in=min(hp.n_burn_in, n_steps))
        chunk_samples, chunk_stats, params = run_mcmc_large_n(
            key, t, y, counts, hp=chunk_hp, init_params=params, step_keys=sub, **kwargs
        )
        samples = _cat(samples, jax.tree.map(np.asarray, chunk_samples))
        stats = _cat(stats, jax.tree.map(np.asarray, chunk_stats))
        outer_done += n_steps
        if checkpoint_path is not None:
            # the key is bookkeeping only (resume re-derives step keys from
            # the caller's key); store raw data — typed PRNG keys (jax.random
            # .key) refuse np.asarray
            key_arr = (
                jax.random.key_data(key)
                if jnp.issubdtype(jnp.asarray(key).dtype, jax.dtypes.prng_key)
                else key
            )
            save_chain_state(
                checkpoint_path, params, key_arr, outer_done, samples, stats=stats
            )
        if progress_callback is not None:
            progress_callback(outer_done, hp.n_outer)

    return samples, stats, params


# ---------------------------------------------------------------------------
# Large-N estimation: row-sharded GP counterfactual conditioning
# ---------------------------------------------------------------------------
#
# The dense path (estimation.py) materializes (S, n, n) conditioning blocks —
# at N = 50k a single CovWW is 10 GB, so a large-N posterior could be sampled
# but never *used*. This path reformulates conditionalITE
# (/root/reference/src/estimation.jl:36-50 over the blocks of
# src/likelihood.jl:8-52) so only row shards and O(N) reductions exist:
#
#   M  = CovWW (no noise),  S_ij = k(w_i, w*_j),  Ss = CovWsWs,
#   P  = M + yNoise I,      G = M - S',           D = M - S - S' + Ss
#
#   MeanITE     = (S' - M) P^-1 Y  = -W' u        W = L^-1 G', u = L^-1 Y
#   diag CovITE = diag(D) - colsums(W * W)
#   sum  CovITE = sum(D)  - ||L^-1 (G' 1)||^2     (for SATE)
#
# so ONE distributed Cholesky of P plus ONE multi-RHS panel forward solve
# (RHS = [G' | Y | G'1], reductions folded per panel, W never stored)
# produce the per-individual ITE means/variances and the SATE moments that
# summarizeEstimates needs. No backward substitution is required at all.


def conditional_ite_large_n(
    params: GPSLCParams,
    t,
    y,
    do_t,
    *,
    x=None,
    mesh: Optional[Mesh] = None,
    block: int = 256,
    unroll: int = 1,
    prediction_covariance_noise: float = 1e-10,
    dtype=None,
    col_chunk="auto",
):
    """Row-sharded closed-form GP counterfactual for ONE posterior sample.

    Returns ``(mean_ite (n,), var_ite (n,), sate_mean, sate_var)`` —
    ``var_ite`` is the diagonal of CovITE (+ the reference's
    ``predictionCovarianceNoise`` stabilizer, ``src/estimation.jl:82``);
    callers loop posterior samples (the compiled program is cached per
    (mesh, n, block) and reused across samples — see
    :func:`ite_distributions_large_n`). Matches the dense
    :func:`causalgpslc_tpu.estimation.conditional_ite` diagonal exactly
    (tests/test_large_n.py).
    """
    mesh = mesh if mesh is not None else n_mesh()
    n_dev = mesh.devices.size
    t = np.asarray(t)
    y = np.asarray(y)
    dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    n = int(y.shape[0])
    nx = 0 if x is None else int(np.asarray(x).shape[1])
    n_padded = _padded_size(n, n_dev, block)
    n_pad = n_padded - n

    t_j = jnp.asarray(t, dtype=dtype)
    do_vec = jnp.broadcast_to(jnp.asarray(do_t, dtype=dtype), (n,))
    y_p = _pad_vec(jnp.asarray(y, dtype=dtype), n_pad)
    x_j = None if nx == 0 else jnp.asarray(np.asarray(x), dtype=dtype)

    def _y_feats(tvec, p):
        parts = [tvec[:, None] / p.ty_ls]
        if p.u is not None:
            parts.append(p.u / p.uy_ls)
        if nx:
            parts.append(x_j / p.xy_ls)
        return jnp.concatenate(parts, axis=1)

    obs_p = _pad_features(_y_feats(t_j, params), n_pad)
    intv_p = _pad_features(_y_feats(do_vec, params), n_pad)
    scale = jnp.asarray(params.y_scale, dtype=dtype)
    noise = jnp.asarray(params.y_noise, dtype=dtype)
    pred_noise = jnp.asarray(prediction_covariance_noise, dtype=dtype)

    cc = _resolve_col_chunk(col_chunk, n_padded, n_dev)
    program = _ite_program(mesh, n, n_padded, block, unroll, jnp.dtype(dtype).name, cc)
    mean_p, var_p, cov_sum = program(obs_p, intv_p, y_p, scale, noise)
    mean_ite = mean_p[:n]
    # clamp at 0 before the stabilizer: diag(D) - colsums(W^2) is a
    # difference of large quantities, and in float32 its cancellation error
    # can exceed the tiny CovITE scale (the dense engine's f32 path has the
    # same issue and projects to PSD via eigh; marginal variances clamp)
    var_ite = jnp.maximum(var_p[:n], 0.0) + pred_noise
    sate_mean = jnp.mean(mean_ite)
    sate_var = (cov_sum + n * pred_noise) / (n * n)
    return mean_ite, var_ite, sate_mean, sate_var


def _make_ite_shard_body(n: int, n_padded: int, n_local: int, block: int, unroll: int, dtype):
    """The per-shard conditioning body shared by the single-sample and
    sample-batched programs (see the math in the section comment above)."""
    from ..ops.dist_linalg import _diag_block
    from ..ops.kernels import rbf_kernel_log
    from jax.scipy.linalg import solve_triangular

    n_cols = n_padded + 2  # [G' | Y | G'1]

    def shard_body(obs_p, intv_p, y_p, scale, noise):
        jitter = _rel_jitter(scale, noise, dtype)
        rows = local_rows(N_AXIS, n_local)
        cols = jnp.arange(n_padded)
        ones = jnp.ones((), dtype=dtype)
        # row shards of the three kernel blocks (pad rows/cols masked to 0 —
        # the pad block must not leak into G/D reductions)
        mask = ((rows < n)[:, None] & (cols < n)[None, :]).astype(dtype)

        def _k(a, b):
            # rbf_kernel_log's dot path clamps at <= 0 and runs the cross
            # matmul at f32 precision (both essential for the sentinel pads;
            # see the comment in ops/kernels.py)
            return scale * jnp.exp(rbf_kernel_log(a, b, ones, method="dot"))

        m_loc = _k(obs_p[rows], obs_p)
        s_loc = _k(obs_p[rows], intv_p)
        ss_loc = _k(intv_p[rows], intv_p)
        onehot = (cols[None, :] == rows[:, None]).astype(dtype)
        p_loc = m_loc + onehot * (noise + jitter)  # pad diag = scale + noise: SPD
        m_loc = m_loc * mask
        s_loc = s_loc * mask
        ss_loc = ss_loc * mask

        g_loc = m_loc - s_loc  # rows of G' = M - S
        rhs_loc = jnp.concatenate(
            [g_loc, y_p[rows][:, None], jnp.sum(g_loc, axis=1)[:, None]], axis=1
        )

        # O(N) diagonal and full-sum reductions of D = M - S - S' + Ss
        def _diag(a_loc):
            v = jnp.take_along_axis(a_loc, rows[:, None], axis=1)[:, 0]
            return lax.psum(jnp.zeros((n_padded,), dtype=dtype).at[rows].set(v), N_AXIS)

        diag_d = _diag(m_loc) - 2.0 * _diag(s_loc) + _diag(ss_loc)
        sum_d = lax.psum(
            jnp.sum(m_loc) - 2.0 * jnp.sum(s_loc) + jnp.sum(ss_loc), N_AXIS
        )

        l_loc = dist_cholesky(p_loc, axis=N_AXIS, block=block, unroll=unroll)

        # multi-RHS panel forward solve with streaming reductions: W is
        # consumed panel-by-panel, never stored
        d = lax.axis_index(N_AXIS)

        def fbody(k, carry):
            part, m_acc, q_acc, s_quad = carry
            ofs = k * block
            lkk = _diag_block(l_loc, ofs, block, N_AXIS)
            owner = ofs // n_local
            lofs = jnp.where(d == owner, ofs - owner * n_local, 0)
            rhs_k = lax.dynamic_slice(
                rhs_loc - part, (jnp.asarray(lofs, jnp.int32), jnp.asarray(0, jnp.int32)),
                (block, n_cols),
            )
            zk = solve_triangular(lkk, rhs_k, lower=True)
            zk = lax.psum(jnp.where(d == owner, zk, jnp.zeros_like(zk)), N_AXIS)
            lpanel = lax.dynamic_slice(
                l_loc, (jnp.asarray(0, jnp.int32), jnp.asarray(ofs, jnp.int32)),
                (n_local, block),
            )
            # HIGHEST matmul precision throughout: bf16 substitution updates
            # compound across panels (see ops/dist_linalg.dist_cholesky)
            hi = jax.lax.Precision.HIGHEST
            part = part + jnp.matmul(lpanel, zk, precision=hi)
            w_k, u_k, e_k = zk[:, :n_padded], zk[:, n_padded], zk[:, n_padded + 1]
            return (
                part,
                m_acc + jnp.matmul(w_k.T, u_k, precision=hi),
                q_acc + jnp.sum(w_k * w_k, axis=0),
                s_quad + jnp.sum(e_k * e_k),
            )

        init = (
            # zeros_like inherits rhs_loc's mesh-varying type (the carry must
            # match fbody's output, which is varying through lpanel @ zk)
            jnp.zeros_like(rhs_loc),
            jnp.zeros((n_padded,), dtype=dtype),
            jnp.zeros((n_padded,), dtype=dtype),
            jnp.zeros((), dtype=dtype),
        )
        _, m_acc, q_acc, s_quad = lax.fori_loop(
            0, n_padded // block, fbody, init, unroll=unroll
        )
        return -m_acc, diag_d - q_acc, sum_d - s_quad

    return shard_body


def _make_ite_shard_body_streamed(
    n: int, n_padded: int, n_local: int, block: int, unroll: int,
    col_chunk: int, dtype
):
    """Column-streamed conditioning body: same math as
    :func:`_make_ite_shard_body`, restructured so NO (n_local, n_padded)
    temporary beyond the Cholesky factor (and its input) is ever live
    (VERDICT r4 item 2: the one-shot body's ~5 full blocks OOM one chip at
    N = 32,768; the MCMC path at the same N fits, so the covariance builds
    do too).

    The forward solves for different RHS columns of W = L^-1 G' are
    independent, so the columns stream in ``col_chunk``-wide chunks: each
    chunk recomputes its G' panel from the features (one small matmul),
    runs the panel forward solve with a (n_local, col_chunk) carry, folds
    its W'u / colsum(W*W) reductions, and is discarded. The D-matrix
    diagonal collapses to the closed form diag(M) = diag(Ss) = scale (RBF
    at distance 0), and the full-sum / row-sum reductions stream over
    column panels. Peak memory: P + L + 2 chunk buffers ~ 2.1 x the factor
    itself, vs ~5 x for the one-shot body.
    """
    from jax.scipy.linalg import solve_triangular

    from ..ops.dist_linalg import _diag_block
    from ..ops.kernels import rbf_kernel_log

    if n_padded % col_chunk != 0:
        raise ValueError(f"col_chunk {col_chunk} must divide n_padded {n_padded}")
    n_chunks = n_padded // col_chunk
    n_panels = n_padded // block
    hi = jax.lax.Precision.HIGHEST

    def shard_body(obs_p, intv_p, y_p, scale, noise):
        jitter = _rel_jitter(scale, noise, dtype)
        rows = local_rows(N_AXIS, n_local)
        ones = jnp.ones((), dtype=dtype)
        row_real = (rows < n).astype(dtype)
        obs_loc = obs_p[rows]
        intv_loc = intv_p[rows]
        d = lax.axis_index(N_AXIS)

        def _k(a, b):
            return scale * jnp.exp(rbf_kernel_log(a, b, ones, method="dot"))

        # ---- closed-form diag(D): diag(M) = diag(Ss) = scale -------------
        s_diag_loc = scale * jnp.exp(
            jnp.minimum(-jnp.sum((obs_loc - intv_loc) ** 2, axis=1), 0.0)
        )
        diag_d = lax.psum(
            jnp.zeros((n_padded,), dtype=dtype)
            .at[rows]
            .set((2.0 * scale - 2.0 * s_diag_loc) * row_real),
            N_AXIS,
        )

        # ---- streaming full-sum and row-sum reductions of D and G' -------
        def sums_body(p, carry):
            sum_acc, grow_acc = carry
            c0 = p * block
            fo = lax.dynamic_slice_in_dim(obs_p, c0, block)
            fi = lax.dynamic_slice_in_dim(intv_p, c0, block)
            col_real = ((c0 + jnp.arange(block)) < n).astype(dtype)
            msk = row_real[:, None] * col_real[None, :]
            m_pan = _k(obs_loc, fo) * msk
            s_pan = _k(obs_loc, fi) * msk
            ss_pan = _k(intv_loc, fi) * msk
            sum_acc = sum_acc + jnp.sum(m_pan) - 2.0 * jnp.sum(s_pan) + jnp.sum(ss_pan)
            grow_acc = grow_acc + jnp.sum(m_pan - s_pan, axis=1)
            return sum_acc, grow_acc

        # zeros_like inherits the mesh-varying type (the carries accumulate
        # row-shard-local sums, which ARE device-varying)
        sum_loc, grow_loc = lax.fori_loop(
            0, n_panels, sums_body,
            (jnp.zeros_like(jnp.sum(obs_loc)), jnp.zeros_like(obs_loc[:, 0])),
        )
        sum_d = lax.psum(sum_loc, N_AXIS)

        # ---- P build + distributed Cholesky (the only full blocks) -------
        cols = jnp.arange(n_padded)
        onehot = (cols[None, :] == rows[:, None]).astype(dtype)
        p_loc = _k(obs_loc, obs_p) + onehot * (noise + jitter)
        l_loc = dist_cholesky(p_loc, axis=N_AXIS, block=block, unroll=unroll)

        def fwd_solve_panel(k, rhs_loc, part):
            """One panel step of the forward solve; returns (zk, new part)."""
            ofs = k * block
            lkk = _diag_block(l_loc, ofs, block, N_AXIS)
            owner = ofs // n_local
            lofs = jnp.where(d == owner, ofs - owner * n_local, 0)
            rhs_k = lax.dynamic_slice(
                rhs_loc - part,
                (jnp.asarray(lofs, jnp.int32), jnp.asarray(0, jnp.int32)),
                (block, rhs_loc.shape[1]),
            )
            zk = solve_triangular(lkk, rhs_k, lower=True)
            zk = lax.psum(jnp.where(d == owner, zk, jnp.zeros_like(zk)), N_AXIS)
            lpanel = lax.dynamic_slice(
                l_loc, (jnp.asarray(0, jnp.int32), jnp.asarray(ofs, jnp.int32)),
                (n_local, block),
            )
            return zk, part + jnp.matmul(lpanel, zk, precision=hi)

        # ---- pass 1: 2-column solve [Y | G'1] -> u (kept), ||e||^2 -------
        rhs2 = jnp.stack([y_p[rows] * row_real, grow_loc], axis=1)

        def f2(k, carry):
            part, u_full, s_quad = carry
            zk, part = fwd_solve_panel(k, rhs2, part)
            u_full = lax.dynamic_update_slice(
                u_full, zk[:, 0], (jnp.asarray(k * block, jnp.int32),)
            )
            return part, u_full, s_quad + jnp.sum(zk[:, 1] ** 2)

        _, u_full, s_quad = lax.fori_loop(
            0, n_panels, f2,
            (jnp.zeros_like(rhs2), jnp.zeros((n_padded,), dtype=dtype),
             jnp.zeros((), dtype=dtype)),
            unroll=unroll,
        )

        # ---- pass 2: stream W = L^-1 G' in column chunks ------------------
        def chunk_body(ci, carry):
            m_acc, q_acc = carry
            c0 = ci * col_chunk
            fo = lax.dynamic_slice_in_dim(obs_p, c0, col_chunk)
            fi = lax.dynamic_slice_in_dim(intv_p, c0, col_chunk)
            col_real = ((c0 + jnp.arange(col_chunk)) < n).astype(dtype)
            rhs_c = (_k(obs_loc, fo) - _k(obs_loc, fi)) * (
                row_real[:, None] * col_real[None, :]
            )

            def fs(k, carry2):
                part, m_c, q_c = carry2
                zk, part = fwd_solve_panel(k, rhs_c, part)
                u_k = lax.dynamic_slice(
                    u_full, (jnp.asarray(k * block, jnp.int32),), (block,)
                )
                m_c = m_c + jnp.matmul(zk.T, u_k, precision=hi)
                q_c = q_c + jnp.sum(zk * zk, axis=0)
                return part, m_c, q_c

            _, m_c, q_c = lax.fori_loop(
                0, n_panels, fs,
                (jnp.zeros_like(rhs_c), jnp.zeros((col_chunk,), dtype=dtype),
                 jnp.zeros((col_chunk,), dtype=dtype)),
                unroll=unroll,
            )
            m_acc = lax.dynamic_update_slice(
                m_acc, m_c, (jnp.asarray(c0, jnp.int32),)
            )
            q_acc = lax.dynamic_update_slice(
                q_acc, q_c, (jnp.asarray(c0, jnp.int32),)
            )
            return m_acc, q_acc

        m_acc, q_acc = lax.fori_loop(
            0, n_chunks, chunk_body,
            (jnp.zeros((n_padded,), dtype=dtype), jnp.zeros((n_padded,), dtype=dtype)),
        )
        return -m_acc, diag_d - q_acc, sum_d - s_quad

    return shard_body


def _make_body(n, n_padded, n_local, block, unroll, col_chunk, dtype):
    if col_chunk:
        return _make_ite_shard_body_streamed(
            n, n_padded, n_local, block, unroll, col_chunk, dtype
        )
    return _make_ite_shard_body(n, n_padded, n_local, block, unroll, dtype)


def _resolve_col_chunk(col_chunk, n_padded: int, n_dev: int):
    """``"auto"`` streams when the one-shot body's ~5 (n_local, n_padded)
    temporaries would be large (>= 16k padded rows per device is where the
    32k OOM class of failure lives); explicit int forces streaming; None
    keeps the one-shot body."""
    if col_chunk == "auto":
        return 2048 if (n_padded // n_dev) * n_padded >= 16384 * 16384 else None
    return col_chunk


@functools.lru_cache(maxsize=32)
def _ite_program(
    mesh: Mesh, n: int, n_padded: int, block: int, unroll: int, dtype_name: str,
    col_chunk: Optional[int] = None,
):
    """Build + cache the jitted sharded conditioning program for a problem
    shape (reused across posterior samples and doT values)."""
    dtype = jnp.dtype(dtype_name)
    n_local = n_padded // mesh.devices.size
    shard_body = _make_body(n, n_padded, n_local, block, unroll, col_chunk, dtype)
    return jax.jit(jax.shard_map(shard_body, mesh=mesh, in_specs=P(), out_specs=P()))


@functools.lru_cache(maxsize=32)
def _ite_program_batched(
    mesh: Mesh, n: int, n_padded: int, block: int, unroll: int, dtype_name: str,
    col_chunk: Optional[int] = None,
):
    """Sample-BATCHED sharded conditioning: vmap the shard body over a
    leading posterior-sample axis inside the shard_map, so one dispatch
    conditions a whole batch of posterior samples (amortizing the ~22-26 ms
    fixed per-call dispatch cost of the axon backend — VERDICT r3 item 7).
    The batch size is a runtime dimension of the inputs, so one compiled
    program per distinct batch size."""
    dtype = jnp.dtype(dtype_name)
    n_local = n_padded // mesh.devices.size
    shard_body = _make_body(n, n_padded, n_local, block, unroll, col_chunk, dtype)

    def shard_body_batched(obs_b, intv_b, y_p, scale_b, noise_b):
        return jax.vmap(
            lambda o, i, s, z: shard_body(o, i, y_p, s, z)
        )(obs_b, intv_b, scale_b, noise_b)

    return jax.jit(
        jax.shard_map(shard_body_batched, mesh=mesh, in_specs=P(), out_specs=P())
    )


def ite_distributions_large_n(
    samples: GPSLCParams,
    t,
    y,
    do_t,
    *,
    x=None,
    mesh: Optional[Mesh] = None,
    block: int = 256,
    unroll: int = 1,
    prediction_covariance_noise: float = 1e-10,
    dtype=None,
    sample_batch: Optional[int] = 8,
    col_chunk="auto",
):
    """Batched :func:`conditional_ite_large_n` over a stacked posterior
    pytree (leading dim S, e.g. ``GPSLCObject.retained_samples()``).

    The large-N analog of :func:`causalgpslc_tpu.estimation.ite_distributions`
    (``ITEDistributions``, ``src/estimation.jl:66-86``) returning per-sample
    per-individual MARGINAL moments instead of full covariances:
    ``(mean_ites (S, n), var_ites (S, n), sate_means (S,), sate_vars (S,))``.

    ``sample_batch`` posterior samples run per dispatch through the
    sample-batched sharded program (the vmapped shard body) — ceil(S/batch)
    dispatches instead of S, amortizing the fixed ~22-26 ms per-call cost
    (VERDICT r3 item 7); it also bounds per-device memory (each in-flight
    sample holds ~4 row-sharded (n_local, n_padded) blocks). ``None`` or
    ``1`` falls back to the original per-sample host loop.
    """
    n_s = int(np.asarray(jax.tree.leaves(samples)[0]).shape[0])
    if sample_batch and sample_batch > 1 and col_chunk == "auto":
        # streamed conditioning trades temporaries for sequential chunk
        # steps; batching samples would multiply the remaining (P, L)
        # blocks per device, so at streaming scale fall back to one sample
        # per dispatch (dispatch overhead is negligible next to the
        # seconds-per-sample compute there)
        _mesh_probe = mesh if mesh is not None else n_mesh()
        _np_probe = _padded_size(int(np.asarray(y).shape[0]), _mesh_probe.devices.size, block)
        if _resolve_col_chunk("auto", _np_probe, _mesh_probe.devices.size):
            sample_batch = 1
    if not sample_batch or sample_batch <= 1:
        means, vars_, sm, sv = [], [], [], []
        for i in range(n_s):
            p_i = jax.tree.map(lambda a: None if a is None else a[i], samples)
            m, v, a, b = conditional_ite_large_n(
                p_i, t, y, do_t, x=x, mesh=mesh, block=block, unroll=unroll,
                prediction_covariance_noise=prediction_covariance_noise, dtype=dtype,
                col_chunk=col_chunk,
            )
            means.append(m)
            vars_.append(v)
            sm.append(a)
            sv.append(b)
        return (jnp.stack(means), jnp.stack(vars_), jnp.stack(sm), jnp.stack(sv))

    mesh = mesh if mesh is not None else n_mesh()
    n_dev = mesh.devices.size
    t = np.asarray(t)
    y = np.asarray(y)
    dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    n = int(y.shape[0])
    nx = 0 if x is None else int(np.asarray(x).shape[1])
    n_padded = _padded_size(n, n_dev, block)
    n_pad = n_padded - n

    t_j = jnp.asarray(t, dtype=dtype)
    do_vec = jnp.broadcast_to(jnp.asarray(do_t, dtype=dtype), (n,))
    y_p = _pad_vec(jnp.asarray(y, dtype=dtype), n_pad)
    x_j = None if nx == 0 else jnp.asarray(np.asarray(x), dtype=dtype)

    def _y_feats(tvec, p):
        parts = [tvec[:, None] / p.ty_ls]
        if p.u is not None:
            parts.append(p.u / p.uy_ls)
        if nx:
            parts.append(x_j / p.xy_ls)
        return jnp.concatenate(parts, axis=1)

    cc = _resolve_col_chunk(col_chunk, n_padded, n_dev)
    program = _ite_program_batched(
        mesh, n, n_padded, block, unroll, jnp.dtype(dtype).name, cc
    )
    pred_noise = jnp.asarray(prediction_covariance_noise, dtype=dtype)

    means, vars_, sm, sv = [], [], [], []
    for start in range(0, n_s, sample_batch):
        idx = np.arange(start, min(start + sample_batch, n_s))
        p_b = jax.tree.map(
            lambda a: None if a is None else jnp.asarray(a, dtype=dtype)[idx], samples
        )
        obs_b = jax.vmap(lambda p: _pad_features(_y_feats(t_j, p), n_pad))(p_b)
        intv_b = jax.vmap(lambda p: _pad_features(_y_feats(do_vec, p), n_pad))(p_b)
        scale_b = jnp.asarray(p_b.y_scale, dtype=dtype)
        noise_b = jnp.asarray(p_b.y_noise, dtype=dtype)
        mean_p, var_p, cov_sum = program(obs_b, intv_b, y_p, scale_b, noise_b)
        mean_ite = mean_p[:, :n]
        var_ite = jnp.maximum(var_p[:, :n], 0.0) + pred_noise
        means.append(mean_ite)
        vars_.append(var_ite)
        sm.append(jnp.mean(mean_ite, axis=1))
        sv.append((cov_sum + n * pred_noise) / (n * n))
    return (
        jnp.concatenate(means, axis=0),
        jnp.concatenate(vars_, axis=0),
        jnp.concatenate(sm, axis=0),
        jnp.concatenate(sv, axis=0),
    )


def ite_distributions_grid_large_n(
    samples: GPSLCParams,
    t,
    y,
    do_ts,
    *,
    x=None,
    mesh: Optional[Mesh] = None,
    block: int = 256,
    unroll: int = 1,
    prediction_covariance_noise: float = 1e-10,
    dtype=None,
    pair_batch: Optional[int] = 8,
    col_chunk="auto",
):
    """Grid x sample BATCHED sharded conditioning (VERDICT r4 item 5).

    Flattens the (do_t grid x posterior sample) product into the batched
    program's leading axis, so a doT sweep costs ceil(G*S / pair_batch)
    dispatches instead of G * ceil(S / pair_batch) host-loop rounds — the
    grid axis inherits the round-4 sample-batching win (each axon dispatch
    costs ~22-26 ms fixed). Returns ``(means (G, S, n), vars (G, S, n),
    sate_means (G, S), sate_vars (G, S))``; the serial reference original is
    the per-point loop of ``src/prediction.jl:31-34``.
    """
    mesh = mesh if mesh is not None else n_mesh()
    n_dev = mesh.devices.size
    t = np.asarray(t)
    y = np.asarray(y)
    dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    n = int(y.shape[0])
    nx = 0 if x is None else int(np.asarray(x).shape[1])
    n_padded = _padded_size(n, n_dev, block)
    n_pad = n_padded - n
    do_ts = np.asarray(do_ts, dtype=float)
    n_g = int(do_ts.shape[0])
    n_s = int(np.asarray(jax.tree.leaves(samples)[0]).shape[0])

    cc = _resolve_col_chunk(col_chunk, n_padded, n_dev)
    if cc and (not pair_batch or pair_batch > 1):
        pair_batch = 1  # streaming scale: one (P, L) pair per device at a time
    pair_batch = max(1, int(pair_batch or 1))

    t_j = jnp.asarray(t, dtype=dtype)
    y_p = _pad_vec(jnp.asarray(y, dtype=dtype), n_pad)
    x_j = None if nx == 0 else jnp.asarray(np.asarray(x), dtype=dtype)

    def _y_feats(tvec, p):
        parts = [tvec[:, None] / p.ty_ls]
        if p.u is not None:
            parts.append(p.u / p.uy_ls)
        if nx:
            parts.append(x_j / p.xy_ls)
        return jnp.concatenate(parts, axis=1)

    program = _ite_program_batched(
        mesh, n, n_padded, block, unroll, jnp.dtype(dtype).name, cc
    )
    pred_noise = jnp.asarray(prediction_covariance_noise, dtype=dtype)
    samples_j = jax.tree.map(
        lambda a: None if a is None else jnp.asarray(a, dtype=dtype), samples
    )

    # (grid, sample) pairs in grid-major order
    pair_g = np.repeat(np.arange(n_g), n_s)
    pair_s = np.tile(np.arange(n_s), n_g)
    total = n_g * n_s
    means = np.empty((total, n), dtype=np.asarray(y).dtype)
    vars_ = np.empty((total, n), dtype=np.asarray(y).dtype)
    sate_m = np.empty((total,), dtype=np.asarray(y).dtype)
    sate_v = np.empty((total,), dtype=np.asarray(y).dtype)
    for start in range(0, total, pair_batch):
        idx = np.arange(start, min(start + pair_batch, total))
        s_idx = jnp.asarray(pair_s[idx])
        do_b = jnp.asarray(do_ts[pair_g[idx]], dtype=dtype)
        p_b = jax.tree.map(
            lambda a: None if a is None else a[s_idx], samples_j
        )
        obs_b = jax.vmap(lambda p: _pad_features(_y_feats(t_j, p), n_pad))(p_b)
        intv_b = jax.vmap(
            lambda p, d: _pad_features(_y_feats(jnp.broadcast_to(d, (n,)), p), n_pad)
        )(p_b, do_b)
        mean_p, var_p, cov_sum = program(
            obs_b, intv_b, y_p, jnp.asarray(p_b.y_scale, dtype=dtype),
            jnp.asarray(p_b.y_noise, dtype=dtype),
        )
        mean_ite = mean_p[:, :n]
        var_ite = jnp.maximum(var_p[:, :n], 0.0) + pred_noise
        means[idx] = np.asarray(mean_ite)
        vars_[idx] = np.asarray(var_ite)
        sate_m[idx] = np.asarray(jnp.mean(mean_ite, axis=1))
        sate_v[idx] = np.asarray((cov_sum + n * pred_noise) / (n * n))
    shape2 = (n_g, n_s)
    return (
        means.reshape(shape2 + (n,)),
        vars_.reshape(shape2 + (n,)),
        sate_m.reshape(shape2),
        sate_v.reshape(shape2),
    )


def ite_samples_marginal(key, mean_ites, var_ites, n_per_mixture: int):
    """Per-individual mixture draws from marginal moments, shape
    ``(n, S * n_per_mixture)`` — the reference's ``ITEsamples`` column layout
    (``src/estimation.jl:95-109``) with independent per-individual draws.

    Per-individual marginals match the dense ``ite_samples`` exactly (each
    row of an MVN draw is a univariate normal at that row's marginal
    moments), so ``summarize_estimates``'s per-row quantiles are unchanged;
    only cross-individual correlations within one draw are dropped — which
    no reference output consumes.
    """
    s, n = mean_ites.shape
    z = jax.random.normal(key, (s, n_per_mixture, n), dtype=mean_ites.dtype)
    draws = mean_ites[:, None, :] + jnp.sqrt(var_ites)[:, None, :] * z
    return draws.reshape(s * n_per_mixture, n).T
