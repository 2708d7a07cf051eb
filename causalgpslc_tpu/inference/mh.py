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

from typing import NamedTuple, Optional, Tuple

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
from ..ops.linalg import stacked_mvn_logliks
from .proposal import propose, proposal_logpdf

__all__ = [
    "sweep_moves",
    "resolve_move_proposals",
    "ProposalParams",
    "proposal_params_for",
    "mh_move",
    "mh_move_dr",
    "mh_sweep",
    "mh_blocked_sweep",
    "grouped_rounds",
    "mh_grouped_sweep",
]

Move = Tuple[str, Optional[tuple]]


class ProposalParams(NamedTuple):
    """Runtime (traced) per-move proposal parameters — the dynamic analog of
    ``HyperParameters.mh_site_proposals``. Each leaf is an ``(n_moves,)``
    array; passing a different ProposalParams to the SAME compiled program
    re-tunes every move's narrow drift variance and wide-jump mixture with
    no recompile (the round-5 on-chip kernel search rides this; remote
    compiles cost ~15 min each, runs ~30 s). ``wide_prob = 0`` disables a
    move's wide component exactly (the mixture density degrades to the
    narrow component; RNG stream unchanged). For delayed-rejection moves
    (static ``mh_dr_fields``), ``wide_var`` is the stage-1 variance and
    ``wide_prob`` is ignored."""

    narrow: jax.Array
    wide_var: jax.Array
    wide_prob: jax.Array


def proposal_params_for(spec: ModelSpec, priors: dict, hp) -> ProposalParams:
    """The ProposalParams restating hp's static configuration (a convenient
    starting point for runtime tuning)."""
    cfg = resolve_move_proposals(spec, hp)
    moves = sweep_moves(spec)
    n = len(moves)
    narrow = [priors["drift"]] * n
    wv, wp = [1.0] * n, [0.0] * n
    for i in range(n):
        if cfg is not None:
            drift, wide, _dr = cfg[i]
        else:
            drift = None
            wide = (hp.mh_wide_drift, hp.mh_wide_prob) if hp.mh_wide_drift else None
        if drift is not None:
            narrow[i] = float(drift)
        if wide is not None:
            wv[i], wp[i] = float(wide[0]), float(wide[1])
    import numpy as _np

    return ProposalParams(
        narrow=jnp.asarray(_np.asarray(narrow)),
        wide_var=jnp.asarray(_np.asarray(wv)),
        wide_prob=jnp.asarray(_np.asarray(wp)),
    )

# Per-move proposal configuration (round 5): (drift, wide, dr) where drift
# is a static narrow variance (None -> priors["drift"]), wide the
# (variance, prob) mixture for plain moves (None -> narrow only), and dr
# flags the two-stage delayed-rejection move (wide stage 1 at wide[0],
# narrow stage 2 at drift).
MoveCfg = Tuple[Optional[float], Optional[tuple], bool]


def resolve_move_proposals(spec: ModelSpec, hp) -> Optional[list]:
    """Static per-move ``MoveCfg`` list from the HyperParameters levers.

    Returns None when no per-site overrides or DR fields are configured, so
    the default path traces the exact round-4 program (cache stability).
    """
    if not (hp.mh_site_proposals or hp.mh_dr_fields):
        return None
    overrides = {e[0]: e[1:] for e in (hp.mh_site_proposals or ())}
    dr_fields = set(hp.mh_dr_fields or ())
    global_wide = (hp.mh_wide_drift, hp.mh_wide_prob) if hp.mh_wide_drift else None
    cfg: list = []
    for field, _idx in sweep_moves(spec):
        if field in overrides:
            drift, wd, wp = overrides[field]
            drift = float(drift) if drift is not None else None
            wide = (float(wd), float(wp)) if (wd and wd > 0 and wp and wp > 0) else None
        else:
            drift, wide = None, global_wide
        dr = field in dr_fields
        if dr:
            wide_var = wide[0] if wide is not None else (
                float(overrides[field][1]) if field in overrides and overrides[field][1] else None
            )
            if wide_var is None or wide_var <= 0:
                raise ValueError(
                    f"delayed rejection on {field!r} needs a wide variance: set "
                    "mh_wide_drift or an mh_site_proposals entry for it"
                )
            cfg.append((drift, (wide_var, 1.0), True))
        else:
            cfg.append((drift, wide, False))
    return cfg


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
    wide=None,
):
    """One single-site MH move; returns (params, lps, accepted).

    ``drift``: proposal variance for this move; defaults to the global
    ``priors["drift"]`` (reference behavior, ``src/proposal.jl``).
    ``wide``: optional ``(variance_wide, prob_wide)`` heavy-jump mixture
    component (see ``proposal.py``).
    """
    if drift is None:
        drift = priors["drift"]
    stem = FIELD_PRIOR_NAMES[field]
    prior_shape, prior_scale = priors[stem + "Shape"], priors[stem + "Scale"]

    cur_arr = getattr(params, field)
    cur = cur_arr[idx] if idx is not None else cur_arr

    k_prop, k_acc = jax.random.split(key)
    prop = propose(k_prop, cur, drift, wide)
    new_arr = cur_arr.at[idx].set(prop) if idx is not None else prop
    new_params = params._replace(**{field: new_arr})

    block = field_block(field)
    xk = idx[0] if block == "x" and idx is not None else None
    cur_lp = lps.x[xk] if block == "x" else getattr(lps, block)
    new_lp = _block_lp(spec, data, new_params, block, xk)

    log_alpha = (
        (new_lp - cur_lp)
        + (inv_gamma_logpdf(prop, prior_shape, prior_scale) - inv_gamma_logpdf(cur, prior_shape, prior_scale))
        + (proposal_logpdf(cur, prop, drift, wide) - proposal_logpdf(prop, cur, drift, wide))
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


def _log1mexp(la: jax.Array) -> jax.Array:
    """log(1 - exp(la)) for la <= 0 (la = a log acceptance probability).

    la == 0 maps to -inf (the DR numerator/denominator term for a stage-1
    move that always accepts; the stage-2 branch is then dead anyway).
    """
    la = jnp.minimum(la, 0.0)
    return jnp.where(
        la < -0.693, jnp.log1p(-jnp.exp(la)), jnp.log(-jnp.expm1(la))
    )


def mh_move_dr(
    key: jax.Array,
    spec: ModelSpec,
    priors: dict,
    data: ModelData,
    params: GPSLCParams,
    lps: BlockLps,
    field: str,
    idx: Optional[tuple],
    drift,
    wide_var: float,
):
    """Two-stage delayed-rejection move (Tierney & Mira 1999): a bold wide
    jump first, and on rejection a narrow drift move from the CURRENT value
    with the exact DR correction, so the kernel stays invariant for the
    target posterior.

    Stage 1 proposes ``y1 ~ q1(.|x)`` — the moment-matched InvGamma at the
    WIDE variance (the plateau-traversal component). Stage 2 proposes
    ``y2 ~ q2(.|x)`` at the narrow ``drift`` variance, accepted with

        a2 = [pi(y2) q1(y1|y2) q2(x|y2) (1 - a1(y2,y1))]
           / [pi(x)  q1(y1|x)  q2(y2|x) (1 - a1(x,y1))]

    which requires no density evaluations beyond the two proposals'
    (pi(y1) is reused from stage 1). Always two block evaluations per move
    under jit — restrict DR to the slow-mixing sites.
    """
    if drift is None:
        drift = priors["drift"]
    stem = FIELD_PRIOR_NAMES[field]
    prior_shape, prior_scale = priors[stem + "Shape"], priors[stem + "Scale"]

    cur_arr = getattr(params, field)
    cur = cur_arr[idx] if idx is not None else cur_arr

    k1, k2, ka1, ka2 = jax.random.split(key, 4)
    block = field_block(field)
    xk = idx[0] if block == "x" and idx is not None else None
    cur_lp = lps.x[xk] if block == "x" else getattr(lps, block)

    def _with(val):
        arr = cur_arr.at[idx].set(val) if idx is not None else val
        return params._replace(**{field: arr})

    def _pi(val, block_lp):
        return block_lp + inv_gamma_logpdf(val, prior_shape, prior_scale)

    # ---- stage 1: wide jump ------------------------------------------------
    y1 = propose(k1, cur, wide_var)
    lp_y1 = _block_lp(spec, data, _with(y1), block, xk)
    pi_x, pi_y1 = _pi(cur, cur_lp), _pi(y1, lp_y1)
    la1 = (pi_y1 - pi_x) + (
        proposal_logpdf(cur, y1, wide_var) - proposal_logpdf(y1, cur, wide_var)
    )
    acc1 = (jnp.log(jax.random.uniform(ka1, dtype=cur.dtype)) < la1) & jnp.isfinite(lp_y1)

    # ---- stage 2: narrow recovery move, exact DR ratio ---------------------
    y2 = propose(k2, cur, drift)
    lp_y2 = _block_lp(spec, data, _with(y2), block, xk)
    pi_y2 = _pi(y2, lp_y2)
    # a1 as if the chain stood at y2 and proposed the same y1
    la1_rev = (pi_y1 - pi_y2) + (
        proposal_logpdf(y2, y1, wide_var) - proposal_logpdf(y1, y2, wide_var)
    )
    log_num = (
        pi_y2
        + proposal_logpdf(y1, y2, wide_var)
        + proposal_logpdf(cur, y2, drift)
        + _log1mexp(la1_rev)
    )
    log_den = (
        pi_x
        + proposal_logpdf(y1, cur, wide_var)
        + proposal_logpdf(y2, cur, drift)
        + _log1mexp(la1)
    )
    la2 = log_num - log_den
    acc2 = (
        (~acc1)
        & (jnp.log(jax.random.uniform(ka2, dtype=cur.dtype)) < la2)
        & jnp.isfinite(lp_y2)
    )

    out_val = jnp.where(acc1, y1, jnp.where(acc2, y2, cur))
    out_lp = jnp.where(acc1, lp_y1, jnp.where(acc2, lp_y2, cur_lp))
    out_arr = cur_arr.at[idx].set(out_val) if idx is not None else out_val
    out_params = params._replace(**{field: out_arr})
    if block == "x":
        out_lps = lps._replace(x=lps.x.at[xk].set(out_lp))
    else:
        out_lps = lps._replace(**{block: out_lp})
    return out_params, out_lps, acc1 | acc2


def mh_sweep(
    key: jax.Array,
    spec: ModelSpec,
    priors: dict,
    data: ModelData,
    params: GPSLCParams,
    lps: BlockLps,
    drifts=None,
    wide=None,
    move_cfg: Optional[list] = None,
):
    """One full MH sweep over every hyperparameter site (reference order).

    Returns (params, lps, accepts) with ``accepts`` a per-move 0/1 vector.
    ``drifts`` optionally overrides the global proposal variance per move
    (an (n_moves,) vector — the adaptive-proposal path); ``None`` uses the
    reference's fixed ``priors["drift"]``. ``move_cfg`` (round 5) carries
    static per-move (drift, wide, dr) overrides from
    :func:`resolve_move_proposals`. The move list is static per spec, so XLA
    sees a fixed unrolled sequence of block evaluations.
    """
    moves = sweep_moves(spec)
    dynamic = isinstance(drifts, ProposalParams)
    accepts = []
    for i, (field, idx) in enumerate(moves):
        cfg_drift, cfg_wide, dr = (
            move_cfg[i] if move_cfg is not None else (None, wide, False)
        )
        if dynamic:
            drift = drifts.narrow[i]
            wide_i = (drifts.wide_var[i], drifts.wide_prob[i])
            wide_var_dr = drifts.wide_var[i]
        else:
            drift = cfg_drift if drifts is None else drifts[i]
            wide_i = cfg_wide
            wide_var_dr = cfg_wide[0] if cfg_wide is not None else None
        if dr:
            params, lps, acc = mh_move_dr(
                jax.random.fold_in(key, i), spec, priors, data, params, lps,
                field, idx, drift, wide_var_dr,
            )
        else:
            params, lps, acc = mh_move(
                jax.random.fold_in(key, i), spec, priors, data, params, lps,
                field, idx, drift, wide_i,
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
#
# Second op-count collapse: the four blocks have DISJOINT Markov blankets
# given the latents (U, logitT) — u-block sites only enter p(U), t-block
# sites only the T GP, y-block only p(Y|...), x-block only p(X|U) — so the
# per-block accept/reject decisions are mutually independent and can run
# simultaneously. The sweep therefore builds every block's proposal
# covariance, stacks them into ONE (nU + 1 + 1 + nX, n, n) batched Cholesky +
# ONE batched triangular solve, and accepts each block from the shared
# factorization: ~2 matrix-op launches per sweep instead of ~8 sequential
# ones (the per-op launch latency floor is the bottleneck; BASELINE.md).


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


def _per_site_delta(field, cur, prop, priors, drift, wide=None):
    """Prior + proposal-correction log-ratio for one site, elementwise."""
    stem = FIELD_PRIOR_NAMES[field]
    pr = inv_gamma_logpdf(prop, priors[stem + "Shape"], priors[stem + "Scale"]) - inv_gamma_logpdf(
        cur, priors[stem + "Shape"], priors[stem + "Scale"]
    )
    q = proposal_logpdf(cur, prop, drift, wide) - proposal_logpdf(prop, cur, drift, wide)
    return pr + q


def mh_blocked_sweep(
    key: jax.Array,
    spec: ModelSpec,
    priors: dict,
    data: ModelData,
    params: GPSLCParams,
    lps: BlockLps,
    drifts=None,
    wide=None,
):
    """One blocked sweep; returns (params, lps, per-block accepts).

    ``drifts``: optional per-block proposal variances, ordered as
    ``block_sites`` keys; ``None`` uses ``priors["drift"]``.
    ``wide``: optional ``(variance_wide, prob_wide)`` heavy-jump mixture.

    All blocks are proposed up front (disjoint site sets, so one combined
    proposal pytree evaluates every block at its own proposal), their
    covariances factorized in ONE stacked batched Cholesky, and each block
    accepted independently. RNG streams match the earlier sequential
    per-block implementation bit-for-bit.
    """
    from ..models.blocks import t_cov, u_cov, x_cov_all, y_cov

    blocks = block_sites(spec)
    dtype = data.y.dtype

    # ---- stage 1: propose every block's sites jointly --------------------
    prop_params = params
    block_delta: dict[str, jax.Array] = {}
    acc_keys: dict[str, jax.Array] = {}
    for bi, (block, sites) in enumerate(blocks.items()):
        bkey = jax.random.fold_in(key, bi)
        k_prop, k_acc = jax.random.split(bkey)
        acc_keys[block] = k_acc
        drift = priors["drift"] if drifts is None else drifts[bi]
        delta = jnp.zeros((spec.n_x,) if block == "x" else (), dtype=dtype)
        for i, field in enumerate(sites):
            cur = getattr(params, field)
            prop = propose(jax.random.fold_in(k_prop, i), cur, drift, wide)
            prop_params = prop_params._replace(**{field: prop})
            d = _per_site_delta(field, cur, prop, priors, drift, wide)
            if block == "x":
                # per-covariate decomposition (leading axis is k)
                delta = delta + (d.reshape(spec.n_x, -1).sum(axis=-1) if d.ndim > 1 else d)
            else:
                delta = delta + jnp.sum(d)
        block_delta[block] = delta

    # ---- stage 2: ONE stacked factorization over all proposal covs -------
    covs, targets, index = [], [], {}
    pos = 0
    if "u" in blocks:
        uc = u_cov(data, prop_params)
        covs.append(jnp.broadcast_to(uc, (spec.n_u,) + uc.shape))
        targets.append(params.u.T)
        index["u"] = (pos, pos + spec.n_u)
        pos += spec.n_u
    if "t" in blocks:
        covs.append(t_cov(spec, data, prop_params)[None])
        targets.append((params.logit_t if spec.binary_t else data.t)[None])
        index["t"] = (pos, pos + 1)
        pos += 1
    if "y" in blocks:
        covs.append(y_cov(spec, data, prop_params)[None])
        targets.append(data.y[None])
        index["y"] = (pos, pos + 1)
        pos += 1
    if "x" in blocks:
        covs.append(x_cov_all(data, prop_params))
        targets.append(data.x.T)
        index["x"] = (pos, pos + spec.n_x)
        pos += spec.n_x

    lp_each = stacked_mvn_logliks(
        jnp.concatenate(covs, axis=0), jnp.concatenate(targets, axis=0)
    )

    # ---- stage 3: independent per-block accept/reject ---------------------
    accepts = []
    for block, sites in blocks.items():
        k_acc = acc_keys[block]
        s, e = index[block]
        if block == "x":
            new_lp = lp_each[s:e]
            log_alpha = (new_lp - lps.x) + block_delta[block]
            accept = (
                jnp.log(jax.random.uniform(k_acc, (spec.n_x,), dtype=dtype)) < log_alpha
            ) & jnp.isfinite(new_lp)
            out_params = params
            for field in sites:
                cur, prop = getattr(params, field), getattr(prop_params, field)
                mask = accept.reshape((spec.n_x,) + (1,) * (cur.ndim - 1))
                out_params = out_params._replace(**{field: jnp.where(mask, prop, cur)})
            params = out_params
            lps = lps._replace(x=jnp.where(accept, new_lp, lps.x))
            accepts.append(jnp.mean(accept.astype(dtype)))
            continue

        new_lp = jnp.sum(lp_each[s:e]) if e - s > 1 else lp_each[s]
        cur_lp = getattr(lps, block)
        log_alpha = (new_lp - cur_lp) + block_delta[block]
        accept = (jnp.log(jax.random.uniform(k_acc, dtype=dtype)) < log_alpha) & jnp.isfinite(new_lp)
        out_params = params
        for field in sites:
            cur, prop = getattr(params, field), getattr(prop_params, field)
            out_params = out_params._replace(**{field: jnp.where(accept, prop, cur)})
        params = out_params
        lps = lps._replace(**{block: jnp.where(accept, new_lp, cur_lp)})
        accepts.append(accept.astype(dtype))

    return params, lps, jnp.stack(accepts)


# ---------------------------------------------------------------------------
# Grouped sweep: the reference's site-by-site chain, latency-compressed
# ---------------------------------------------------------------------------
#
# The per-site sweep pays one factorize+solve of ~6-7 ms op latency PER MOVE
# on the axon backend (BASELINE.md) — ~80 sequential rounds per outer
# iteration at reference budgets. But consecutive moves that touch DISJOINT
# blocks (u-block, t-block, y-block, each x column) are conditionally
# independent given the latents: move A's accepted site never enters move
# B's density or proposal, so executing them from the shared pre-round state
# and accepting each independently reproduces the sequential composition
# EXACTLY — same proposals, same acceptance decisions, same chain,
# bit-for-bit (tested) — while their fresh-block evaluations share ONE
# stacked factorization. Reference order is preserved; rounds are the
# greedy packing of consecutive non-conflicting moves (8 moves -> 4 rounds
# for the NoCov model, 21 -> 6 for the full U+X nX=2 model).


def grouped_rounds(spec: ModelSpec) -> list:
    """Greedy packing of ``sweep_moves`` into rounds of distinct blocks."""
    rounds, cur, used = [], [], set()
    for i, (field, idx) in enumerate(sweep_moves(spec)):
        b = field_block(field)
        bkey = (b, idx[0]) if b == "x" else b
        if bkey in used:
            rounds.append(cur)
            cur, used = [], set()
        cur.append((i, field, idx))
        used.add(bkey)
    if cur:
        rounds.append(cur)
    return rounds


def mh_grouped_sweep(
    key: jax.Array,
    spec: ModelSpec,
    priors: dict,
    data: ModelData,
    params: GPSLCParams,
    lps: BlockLps,
    drifts=None,
    wide=None,
    move_cfg: Optional[list] = None,
):
    """One full sweep, bit-identical to :func:`mh_sweep` (same RNG streams,
    same chain) with disjoint-block moves evaluated per round in one stacked
    factorization. Returns (params, lps, accepts) shaped like ``mh_sweep``.
    ``move_cfg`` carries per-move (drift, wide) overrides (DR moves are not
    supported in grouped execution; HyperParameters validates that).
    """
    from ..models.blocks import t_cov, u_cov, x_cov_k, y_cov

    dtype = data.y.dtype
    n_moves = len(sweep_moves(spec))
    accepts: list = [None] * n_moves

    dynamic = isinstance(drifts, ProposalParams)

    def _cfg(i):
        if dynamic:
            return drifts.narrow[i], (drifts.wide_var[i], drifts.wide_prob[i])
        if move_cfg is None:
            return None, wide
        cfg_drift, cfg_wide, _dr = move_cfg[i]
        return cfg_drift, cfg_wide

    for rnd in grouped_rounds(spec):
        covs, targets, metas = [], [], []
        pos = 0
        for (i, field, idx) in rnd:
            cfg_drift, wide_i = _cfg(i)
            if dynamic:
                drift = cfg_drift
            elif drifts is not None:
                drift = drifts[i]
            elif cfg_drift is not None:
                drift = cfg_drift
            else:
                drift = priors["drift"]
            k_prop, k_acc = jax.random.split(jax.random.fold_in(key, i))
            cur_arr = getattr(params, field)
            cur = cur_arr[idx] if idx is not None else cur_arr
            prop = propose(k_prop, cur, drift, wide_i)
            new_arr = cur_arr.at[idx].set(prop) if idx is not None else prop
            p_prop = params._replace(**{field: new_arr})

            block = field_block(field)
            xk = idx[0] if block == "x" and idx is not None else None
            if block == "u":
                uc = u_cov(data, p_prop)
                covs.append(jnp.broadcast_to(uc, (spec.n_u,) + uc.shape))
                targets.append(params.u.T)
                seg = slice(pos, pos + spec.n_u)
                pos += spec.n_u
            elif block == "t":
                covs.append(t_cov(spec, data, p_prop)[None])
                targets.append((params.logit_t if spec.binary_t else data.t)[None])
                seg = pos
                pos += 1
            elif block == "y":
                covs.append(y_cov(spec, data, p_prop)[None])
                targets.append(data.y[None])
                seg = pos
                pos += 1
            else:  # x column xk
                covs.append(x_cov_k(data, p_prop, xk)[None])
                targets.append(data.x[:, xk][None])
                seg = pos
                pos += 1
            metas.append((i, field, idx, cur, prop, k_acc, seg, block, xk, drift, wide_i))

        lp_each = stacked_mvn_logliks(
            jnp.concatenate(covs, axis=0), jnp.concatenate(targets, axis=0)
        )

        for (i, field, idx, cur, prop, k_acc, seg, block, xk, drift, wide_i) in metas:
            new_lp = jnp.sum(lp_each[seg]) if isinstance(seg, slice) else lp_each[seg]
            cur_lp = lps.x[xk] if block == "x" else getattr(lps, block)
            stem = FIELD_PRIOR_NAMES[field]
            pr_s, pr_c = priors[stem + "Shape"], priors[stem + "Scale"]
            log_alpha = (
                (new_lp - cur_lp)
                + (inv_gamma_logpdf(prop, pr_s, pr_c) - inv_gamma_logpdf(cur, pr_s, pr_c))
                + (proposal_logpdf(cur, prop, drift, wide_i) - proposal_logpdf(prop, cur, drift, wide_i))
            )
            accept = (jnp.log(jax.random.uniform(k_acc, dtype=cur.dtype)) < log_alpha) & jnp.isfinite(new_lp)
            out_val = jnp.where(accept, prop, cur)
            cur_arr = getattr(params, field)
            out_arr = cur_arr.at[idx].set(out_val) if idx is not None else out_val
            params = params._replace(**{field: out_arr})
            out_lp = jnp.where(accept, new_lp, cur_lp)
            if block == "x":
                lps = lps._replace(x=lps.x.at[xk].set(out_lp))
            else:
                lps = lps._replace(**{block: out_lp})
            accepts[i] = accept

    return params, lps, jnp.stack(accepts).astype(dtype)
