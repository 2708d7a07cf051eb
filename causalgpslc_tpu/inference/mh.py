"""Metropolis-Hastings over kernel hyperparameters ("Algorithm 2").

Parity target: the per-address ``mh(trace, paramProposal, ...)`` sweeps of
``/root/reference/src/inference.jl:22-44`` (and the per-variant reduced
sweeps). Two deliberate TPU-side redesigns, both distribution-preserving:

1. **Markov-blanket scoring.** Gen's dynamic DSL re-simulates and re-scores
   the whole joint for every single-site move; the acceptance ratio only ever
   involves the factors containing the moved site, so each move here scores
   exactly one GP block (one Cholesky) instead of all of them.
2. **Cached block log-likelihoods.** The sweep carries the current per-block
   log-likelihoods (:class:`~causalgpslc_tpu.models.blocks.BlockLps`) so each
   move costs ONE fresh block evaluation (for the proposal) rather than two.

The sweep order per variant matches the reference exactly (see
``sweep_moves``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.blocks import (
    BlockLps,
    FIELD_PRIOR_NAMES,
    field_block,
    logp_t_gp,
    logp_u,
    logp_x_k,
    logp_y,
)
from ..models.spec import GPSLCParams, ModelData, ModelSpec
from ..models.state import hyper_fields
from ..ops.distributions import inv_gamma_logpdf
from .proposal import propose, proposal_logpdf

__all__ = ["sweep_moves", "mh_move", "mh_sweep"]

Move = Tuple[str, Optional[tuple]]


def sweep_moves(spec: ModelSpec) -> list[Move]:
    """The (field, index) MH moves of one sweep, in reference order.

    Full model (``src/inference.jl:23-44``): uNoise, tNoise, yNoise, tyLS;
    per latent dim k: utLS[k], uyLS[k], uxLS[k, l] for each covariate l;
    per covariate k: xNoise[k], xtLS[k], xyLS[k], xScale[k]; tScale, yScale.
    Reduced variants drop the absent sites (``:62``, ``:112``, ``:146``...).
    """
    fields = set(hyper_fields(spec))
    moves: list[Move] = []

    def add(field, idx=None):
        if field in fields:
            moves.append((field, idx))

    add("u_noise")
    add("t_noise")
    add("y_noise")
    add("ty_ls")
    if spec.has_u:
        for k in range(spec.n_u):
            add("ut_ls", (k,))
            add("uy_ls", (k,))
            if spec.has_x and "ux_ls" in fields:
                for l in range(spec.n_x):
                    # reference address :uxLS => k => l; stored as ux_ls[l, k]
                    add("ux_ls", (l, k))
    if spec.has_x:
        for k in range(spec.n_x):
            add("x_noise", (k,))
            add("xt_ls", (k,))
            add("xy_ls", (k,))
            add("x_scale", (k,))
    add("t_scale")
    add("y_scale")
    return moves


def _block_lp(spec, data, params, block: str, k: Optional[int]):
    if block == "u":
        return logp_u(spec, data, params)
    if block == "x":
        return logp_x_k(spec, data, params, k)
    if block == "t":
        return logp_t_gp(spec, data, params)
    if block == "y":
        return logp_y(spec, data, params)
    raise ValueError(block)


def mh_move(
    key: jax.Array,
    spec: ModelSpec,
    priors: dict,
    data: ModelData,
    params: GPSLCParams,
    lps: BlockLps,
    field: str,
    idx: Optional[tuple],
    drift=None,
):
    """One single-site MH move; returns (params, lps, accepted).

    ``drift``: proposal variance for this move; defaults to the global
    ``priors["drift"]`` (reference behavior, ``src/proposal.jl``).
    """
    if drift is None:
        drift = priors["drift"]
    stem = FIELD_PRIOR_NAMES[field]
    prior_shape, prior_scale = priors[stem + "Shape"], priors[stem + "Scale"]

    cur_arr = getattr(params, field)
    cur = cur_arr[idx] if idx is not None else cur_arr

    k_prop, k_acc = jax.random.split(key)
    prop = propose(k_prop, cur, drift)
    new_arr = cur_arr.at[idx].set(prop) if idx is not None else prop
    new_params = params._replace(**{field: new_arr})

    block = field_block(field)
    xk = idx[0] if block == "x" and idx is not None else None
    cur_lp = lps.x[xk] if block == "x" else getattr(lps, block)
    new_lp = _block_lp(spec, data, new_params, block, xk)

    log_alpha = (
        (new_lp - cur_lp)
        + (inv_gamma_logpdf(prop, prior_shape, prior_scale) - inv_gamma_logpdf(cur, prior_shape, prior_scale))
        + (proposal_logpdf(cur, prop, drift) - proposal_logpdf(prop, cur, drift))
    )
    log_u = jnp.log(jax.random.uniform(k_acc, dtype=cur.dtype))
    accept = (log_u < log_alpha) & jnp.isfinite(new_lp)

    out_val = jnp.where(accept, prop, cur)
    out_arr = cur_arr.at[idx].set(out_val) if idx is not None else out_val
    out_params = params._replace(**{field: out_arr})
    out_block_lp = jnp.where(accept, new_lp, cur_lp)
    if block == "x":
        out_lps = lps._replace(x=lps.x.at[xk].set(out_block_lp))
    else:
        out_lps = lps._replace(**{block: out_block_lp})
    return out_params, out_lps, accept


def mh_sweep(
    key: jax.Array,
    spec: ModelSpec,
    priors: dict,
    data: ModelData,
    params: GPSLCParams,
    lps: BlockLps,
    drifts=None,
):
    """One full MH sweep over every hyperparameter site (reference order).

    Returns (params, lps, accepts) with ``accepts`` a per-move 0/1 vector.
    ``drifts`` optionally overrides the global proposal variance per move
    (an (n_moves,) vector — the adaptive-proposal path); ``None`` uses the
    reference's fixed ``priors["drift"]``. The move list is static per spec,
    so XLA sees a fixed unrolled sequence of block evaluations.
    """
    moves = sweep_moves(spec)
    accepts = []
    for i, (field, idx) in enumerate(moves):
        drift = None if drifts is None else drifts[i]
        params, lps, acc = mh_move(
            jax.random.fold_in(key, i), spec, priors, data, params, lps, field, idx, drift
        )
        accepts.append(acc)
    return params, lps, jnp.stack(accepts).astype(data.y.dtype)


# ---------------------------------------------------------------------------
# Blocked sweep: joint per-block proposals (TPU fast path)
# ---------------------------------------------------------------------------
#
# Profiling (BASELINE.md "Measured") shows batched Cholesky on TPU has a
# ~4 ms latency floor per op, so the reference-shaped sweep — one factorization
# per scalar site — is op-count bound. The blocked sweep proposes every site
# of a GP block jointly (independent drift proposals per site) and
# accepts/rejects the block with ONE fresh factorization:
#
#   u-block: {uNoise}                       -> 1 Cholesky
#   t-block: {tNoise, tScale, utLS, xtLS}   -> 1 Cholesky
#   y-block: {yNoise, yScale, tyLS, uyLS, xyLS} -> 1 Cholesky
#   x-block: {xNoise[k], xScale[k], uxLS[k,:]} jointly per covariate k,
#            all k batched                   -> 1 batched Cholesky
#
# Because each proposal is an independent product kernel and the acceptance
# uses the exact joint density ratio, this is a valid MH kernel for the same
# posterior — it trades per-site acceptance for a ~10x smaller op count.
# Select with HyperParameters.mh_block_sweep=True.


def block_sites(spec: ModelSpec) -> dict:
    """Sites of each GP block present in this variant."""
    fields = set(hyper_fields(spec))
    blocks: dict[str, list[str]] = {"u": [], "t": [], "y": [], "x": []}
    for f in ("u_noise",):
        if f in fields:
            blocks["u"].append(f)
    for f in ("t_noise", "t_scale", "ut_ls", "xt_ls"):
        if f in fields:
            blocks["t"].append(f)
    for f in ("y_noise", "y_scale", "ty_ls", "uy_ls", "xy_ls"):
        if f in fields:
            blocks["y"].append(f)
    for f in ("x_noise", "x_scale", "ux_ls"):
        if f in fields:
            blocks["x"].append(f)
    return {b: s for b, s in blocks.items() if s}


def _joint_propose(key, spec, priors, params, sites, drift):
    """Drift-propose every element of ``sites``; returns (new_params,
    sum log q(new|cur) - log q(cur|new), sum prior delta)."""
    q_delta = jnp.zeros((), dtype=jax.tree.leaves(params)[0].dtype)
    prior_delta = jnp.zeros_like(q_delta)
    new_params = params
    for i, field in enumerate(sites):
        stem = FIELD_PRIOR_NAMES[field]
        cur = getattr(params, field)
        prop = propose(jax.random.fold_in(key, i), cur, drift)
        new_params = new_params._replace(**{field: prop})
        q_delta = q_delta + jnp.sum(
            proposal_logpdf(cur, prop, drift) - proposal_logpdf(prop, cur, drift)
        )
        prior_delta = prior_delta + jnp.sum(
            inv_gamma_logpdf(prop, priors[stem + "Shape"], priors[stem + "Scale"])
            - inv_gamma_logpdf(cur, priors[stem + "Shape"], priors[stem + "Scale"])
        )
    return new_params, q_delta, prior_delta


def mh_blocked_sweep(
    key: jax.Array,
    spec: ModelSpec,
    priors: dict,
    data: ModelData,
    params: GPSLCParams,
    lps: BlockLps,
    drifts=None,
):
    """One blocked sweep; returns (params, lps, per-block accepts).

    ``drifts``: optional per-block proposal variances, ordered as
    ``block_sites`` keys; ``None`` uses ``priors["drift"]``.
    """
    from ..models.blocks import logp_x

    blocks = block_sites(spec)
    dtype = data.y.dtype
    accepts = []

    for bi, (block, sites) in enumerate(blocks.items()):
        bkey = jax.random.fold_in(key, bi)
        drift = priors["drift"] if drifts is None else drifts[bi]

        if block == "x":
            # per-covariate joint moves, disjoint Markov blankets, batched
            k_prop, k_acc = jax.random.split(bkey)
            new_params, _, _ = _joint_propose(k_prop, spec, priors, params, sites, drift)
            new_lp = logp_x(spec, data, new_params)  # (nX,), one batched op
            # per-k deltas: priors and proposals decompose over k
            def per_k_delta(field, cur, prop):
                stem = FIELD_PRIOR_NAMES[field]
                pr = inv_gamma_logpdf(prop, priors[stem + "Shape"], priors[stem + "Scale"]) - inv_gamma_logpdf(
                    cur, priors[stem + "Shape"], priors[stem + "Scale"]
                )
                q = proposal_logpdf(cur, prop, drift) - proposal_logpdf(prop, cur, drift)
                delta = pr + q
                return delta.reshape(delta.shape[0], -1).sum(axis=-1) if delta.ndim > 1 else delta

            delta_k = jnp.zeros((spec.n_x,), dtype=dtype)
            for field in sites:
                delta_k = delta_k + per_k_delta(field, getattr(params, field), getattr(new_params, field))
            log_alpha = (new_lp - lps.x) + delta_k
            accept = (
                jnp.log(jax.random.uniform(k_acc, (spec.n_x,), dtype=dtype)) < log_alpha
            ) & jnp.isfinite(new_lp)
            out_params = params
            for field in sites:
                cur, prop = getattr(params, field), getattr(new_params, field)
                mask = accept.reshape((spec.n_x,) + (1,) * (cur.ndim - 1))
                out_params = out_params._replace(**{field: jnp.where(mask, prop, cur)})
            params = out_params
            lps = lps._replace(x=jnp.where(accept, new_lp, lps.x))
            accepts.append(jnp.mean(accept.astype(dtype)))
            continue

        k_prop, k_acc = jax.random.split(bkey)
        new_params, q_delta, prior_delta = _joint_propose(k_prop, spec, priors, params, sites, drift)
        new_lp = _block_lp(spec, data, new_params, block, None)
        cur_lp = getattr(lps, block)
        log_alpha = (new_lp - cur_lp) + prior_delta + q_delta
        accept = (jnp.log(jax.random.uniform(k_acc, dtype=dtype)) < log_alpha) & jnp.isfinite(new_lp)
        out_params = params
        for field in sites:
            cur, prop = getattr(params, field), getattr(new_params, field)
            out_params = out_params._replace(**{field: jnp.where(accept, prop, cur)})
        params = out_params
        lps = lps._replace(**{block: jnp.where(accept, new_lp, cur_lp)})
        accepts.append(accept.astype(dtype))

    return params, lps, jnp.stack(accepts)
