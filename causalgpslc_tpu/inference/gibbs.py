"""The outer Gibbs loop: MH-within-Gibbs + elliptical slice sampling.

Parity target: the 8 ``Posterior`` dispatches of
``/root/reference/src/inference.jl`` — per outer iteration, ``nMHInner``
hyperparameter MH sweeps ("Algorithm 2"), then ``nESInner`` elliptical-slice
sweeps over each latent-confounder column and (binary treatment) ``logitT``
("Algorithm 3"), with the ESS prior covariances frozen at the
post-MH parameter values exactly as the reference computes ``uCov`` and
``logitTCov`` once per outer iteration (``src/inference.jl:48``, ``:216-227``).

Degenerate-variant semantics follow the reference:
- NoU+NoCov: the three outcome-block MH moves run once per outer iteration
  (no inner loop, ``src/inference.jl:157-163``), no ESS (``:371-376``).
- NoU binary: ESS over ``logitT`` only (``:346-348``).
- NoU continuous: MH only.

TPU design: one chain's outer step is a pure jitted function; chains batch
with ``vmap`` (the per-move Choleskys become batched (C, n, n) factorizations
on the MXU) and shard over a device mesh via ``causalgpslc_tpu.parallel``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..hyperparameters import HyperParameters
from ..models.blocks import (
    compute_block_lps,
    logp_t_bernoulli,
    t_cov,
    u_conditional_loglik,
    u_cov,
)
from ..models.spec import GPSLCParams, ModelData, ModelSpec
from ..models.state import init_from_prior
from ..ops.distributions import bernoulli_logit_logpdf
from ..ops.blocked_chol import CholFactors, blocked_cholesky, mvn_logpdf_b
from ..ops.linalg import mvn_logpdf_chol, quantum_free_mode, stabilize_cov
from .ess import ess_update
from .mh import block_sites, mh_blocked_sweep, mh_grouped_sweep, mh_sweep, sweep_moves

__all__ = ["StepStats", "make_outer_step", "make_chain_runner", "run_mcmc"]


class StepStats(NamedTuple):
    """Per-outer-iteration observability (the reference has only a tqdm bar)."""

    mh_accept_rate: jax.Array
    ess_iters: jax.Array
    log_joint_blocks: jax.Array  # sum of block log-liks at end of iteration
    move_accepts: jax.Array  # per-move acceptance fraction over the inner sweeps


def _has_mh_inner_loop(spec: ModelSpec) -> bool:
    return spec.has_u or spec.has_x


def _uses_logit_ess(spec: ModelSpec) -> bool:
    return spec.binary_t and (spec.has_u or spec.has_x)


def _split_counts(total: int, rounds: int) -> list[int]:
    """Per-round inner budgets; remainders go to the LATER rounds."""
    base, rem = divmod(total, rounds)
    return [base + (1 if r >= rounds - rem else 0) for r in range(rounds)]


def make_outer_step(spec: ModelSpec, priors: dict, hp: HyperParameters):
    """Build the jittable single-chain outer step ``(params, data, key) -> (params, stats)``."""
    from .mh import resolve_move_proposals

    use_blocked = hp.mh_block_sweep
    wide = (hp.mh_wide_drift, hp.mh_wide_prob) if hp.mh_wide_drift else None
    if use_blocked:
        base_sweep = mh_blocked_sweep
    elif hp.mh_grouped_sweep:
        base_sweep = mh_grouped_sweep
    else:
        base_sweep = mh_sweep
    move_cfg = None if use_blocked else resolve_move_proposals(spec, hp)
    if move_cfg is None:
        sweep_fn = partial(base_sweep, wide=wide)
    else:
        sweep_fn = partial(base_sweep, wide=wide, move_cfg=move_cfg)
    n_moves = len(block_sites(spec)) if use_blocked else len(sweep_moves(spec))
    n_mh_inner = hp.n_mh_inner if (_has_mh_inner_loop(spec) and hp.n_mh_inner) else 1
    n_es_inner = hp.n_es_inner if hp.n_es_inner else 0
    # Interleaved Gibbs rounds (round 5): each outer iteration runs
    # ``gibbs_rounds`` segments of (MH sweeps + ES sweeps); the per-sweep
    # keys are fold_in(k_mh, global_sweep_index) in BOTH schedules, so
    # rounds=1 traces the exact round-4 program.
    rounds = hp.gibbs_rounds if (n_es_inner > 0 and _has_mh_inner_loop(spec)) else 1
    mh_counts = _split_counts(n_mh_inner, rounds)
    es_counts = _split_counts(n_es_inner, rounds) if n_es_inner else [0] * rounds
    # None = platform default: unrolled straight-line code on TPU (runtime-
    # bound: While iterations pay a dispatch quantum), rolled fori_loop on
    # CPU (compile-bound: the unrolled program duplicates the graph ~15x).
    # Bit-identical samples either way.
    inner_unroll = (
        hp.inner_unroll if hp.inner_unroll is not None else jax.default_backend() != "cpu"
    )

    def outer_step(params: GPSLCParams, data: ModelData, key: jax.Array, drifts=None):
        dtype = data.y.dtype
        k_mh, k_ess = jax.random.split(key)

        # ---- Algorithm 2: hyperparameter MH sweeps -----------------------
        lps = compute_block_lps(spec, data, params)

        def mh_segment(params, lps, i0, count):
            def mh_body(i, carry):
                params, lps, acc = carry
                params, lps, a = sweep_fn(
                    jax.random.fold_in(k_mh, i), spec, priors, data, params, lps, drifts
                )
                return params, lps, acc + a

            carry = (params, lps, jnp.zeros((n_moves,), dtype=dtype))
            if inner_unroll and count <= 16:
                # statically unrolled: on the axon backend every XLA While/fori
                # ITERATION pays a fixed dispatch quantum (BASELINE.md), while
                # straight-line chains are free — same RNG stream either way.
                for i in range(i0, i0 + count):
                    carry = mh_body(i, carry)
            else:
                # rolled: body traced once — ~4-5x faster cold compiles at a
                # per-iteration quantum cost (hp.inner_unroll=False).
                carry = jax.lax.fori_loop(i0, i0 + count, mh_body, carry)
            return carry

        use_u_ess = spec.has_u and n_es_inner > 0
        use_logit_ess = _uses_logit_ess(spec) and n_es_inner > 0

        def es_segment(params, lps, j0, count):
            """ES sweeps ``j in [j0, j0+count)`` with prior covariances frozen
            at the CURRENT params (Algorithm 3; the reference freezes once per
            outer iteration — ``src/inference.jl:48``, ``:216-227`` — which is
            the rounds=1 case). Returns (params, iters, lps_total)."""
            # ESS prior covariances frozen at current params; all needed
            # priors share one stacked factorization, routed through the
            # quantum-free blocked path on TPU f32 (the dense factor feeds
            # the nu-draws; the block factors make the per-move prior logpdf
            # refreshes solve-free straight-line matmuls).
            ess_covs = []
            if use_u_ess:
                ess_covs.append(u_cov(data, params))
            if use_logit_ess:
                ess_covs.append(t_cov(spec, data, params))
            stacked = stabilize_cov(jnp.stack(ess_covs))
            qf_mode = quantum_free_mode(dtype)
            if qf_mode is not None:
                facs = blocked_cholesky(stacked, use_pallas=qf_mode == "pallas")
                dense = facs.l[..., : spec.n, : spec.n]

                def _fac(i):
                    return CholFactors(l=facs.l[i], linv=facs.linv[i], n=spec.n)

                u_fac = _fac(0) if use_u_ess else None
                t_fac = _fac(len(ess_covs) - 1) if use_logit_ess else None
            else:
                dense = jnp.linalg.cholesky(stacked)
                u_fac = t_fac = None
            u_chol = dense[0] if use_u_ess else None
            t_chol = dense[len(ess_covs) - 1] if use_logit_ess else None

            # cached likelihood components for the U moves
            x_sum0 = jnp.sum(lps.x) if lps.x is not None else jnp.zeros((), dtype=dtype)
            bern_ll0 = (
                logp_t_bernoulli(spec, data, params)
                if spec.binary_t
                else jnp.zeros((), dtype=dtype)
            )

            def es_sweep(j, params, x_sum, t_lp, y_lp, bern_ll, ess_iters):
                """One ES sweep (logitT + each U column); ``j`` may be traced."""
                kj = jax.random.fold_in(k_ess, j)

                if use_logit_ess:
                    def bern_lik(lt):
                        return bernoulli_logit_logpdf(data.t, lt), jnp.zeros((), dtype=dtype)

                    lt_new, bern_ll, _, it = ess_update(
                        jax.random.fold_in(kj, 1000),
                        params.logit_t,
                        t_chol,
                        bern_lik,
                        bern_ll,
                        jnp.zeros((), dtype=dtype),
                        spec_batch=hp.ess_spec_batch,
                    )
                    params = params._replace(logit_t=lt_new)
                    ess_iters = ess_iters + it
                    if use_u_ess:
                        # the U-move likelihood's T-GP factor depends on
                        # logitT; its covariance does not, so refresh via the
                        # frozen factor (O(n^2), no new Cholesky).
                        t_lp = (
                            mvn_logpdf_b(lt_new, t_fac)
                            if t_fac is not None
                            else mvn_logpdf_chol(lt_new, t_chol)
                        )

                if use_u_ess:
                    for k in range(spec.n_u):
                        def u_lik(col, params=params, k=k):
                            p2 = params._replace(u=params.u.at[:, k].set(col))
                            return u_conditional_loglik(spec, data, p2)

                        cur_ll = x_sum + t_lp + y_lp
                        col_new, _, (x_sum, t_lp, y_lp), it = ess_update(
                            jax.random.fold_in(kj, k),
                            params.u[:, k],
                            u_chol,
                            u_lik,
                            cur_ll,
                            (x_sum, t_lp, y_lp),
                            spec_batch=hp.ess_spec_batch,
                        )
                        params = params._replace(u=params.u.at[:, k].set(col_new))
                        ess_iters = ess_iters + it
                return params, x_sum, t_lp, y_lp, bern_ll, ess_iters

            carry = (params, x_sum0, lps.t, lps.y, bern_ll0, jnp.zeros((), dtype=jnp.int32))
            if inner_unroll and count <= 16:
                for j in range(j0, j0 + count):
                    carry = es_sweep(j, *carry)
            else:
                carry = jax.lax.fori_loop(
                    j0, j0 + count, lambda j, c: es_sweep(j, *c), carry
                )
            params, x_sum, t_lp, y_lp, bern_ll, iters = carry

            lps_total = x_sum + t_lp + y_lp + (bern_ll if spec.binary_t else 0.0)
            if lps.u is not None:
                # U prior term at final state
                if u_fac is not None:
                    lps_total = lps_total + jnp.sum(mvn_logpdf_b(params.u.T, u_fac))
                else:
                    lps_total = lps_total + jnp.sum(
                        jax.vmap(lambda c: mvn_logpdf_chol(c, u_chol))(params.u.T)
                    )
            return params, iters, lps_total

        # ---- the Gibbs rounds (rounds == 1 traces the round-4 program) ---
        n_acc = None
        ess_iters = None
        lps_total = None
        mh_off = es_off = 0
        for r in range(rounds):
            if r > 0 and es_counts[r - 1] > 0 and (use_u_ess or use_logit_ess):
                # ES moved U/logitT: refresh every block log-lik for the next
                # MH segment (one stacked evaluation)
                lps = compute_block_lps(spec, data, params)
            params, lps, acc_r = mh_segment(params, lps, mh_off, mh_counts[r])
            n_acc = acc_r if n_acc is None else n_acc + acc_r
            mh_off += mh_counts[r]
            if (use_u_ess or use_logit_ess) and es_counts[r] > 0:
                params, it_r, lps_total = es_segment(params, lps, es_off, es_counts[r])
                ess_iters = it_r if ess_iters is None else ess_iters + it_r
                es_off += es_counts[r]

        move_accepts = n_acc / n_mh_inner
        accept_rate = jnp.mean(move_accepts)
        if ess_iters is None:
            ess_iters = jnp.zeros((), dtype=jnp.int32)
        if lps_total is None:
            lps_total = lps.t + lps.y
            if lps.x is not None:
                lps_total = lps_total + jnp.sum(lps.x)
            if lps.u is not None:
                lps_total = lps_total + lps.u
            if spec.binary_t:
                lps_total = lps_total + logp_t_bernoulli(spec, data, params)

        stats = StepStats(
            mh_accept_rate=accept_rate,
            ess_iters=ess_iters,
            log_joint_blocks=lps_total,
            move_accepts=move_accepts,
        )
        return params, stats

    return outer_step


def make_chain_runner(
    spec: ModelSpec,
    priors: dict,
    data: ModelData,
    hp: HyperParameters,
    init_params: Optional[GPSLCParams] = None,
    proposal_params=None,
):
    """Build ``one_chain(chain_key) -> (samples, stats, final)`` for a single
    chain's full run. Shared by the on-chip ``vmap`` path (:func:`run_mcmc`)
    and the mesh-sharded path (``parallel.mesh.run_mcmc_sharded``), so both
    produce bit-identical per-chain results from the same chain keys.

    ``proposal_params``: a :class:`~causalgpslc_tpu.inference.mh.
    ProposalParams` of runtime per-move proposal arrays (requires
    ``hp.dynamic_proposals``)."""
    outer_step = make_outer_step(spec, priors, hp)
    dtype = data.y.dtype
    n_moves = len(block_sites(spec)) if hp.mh_block_sweep else len(sweep_moves(spec))
    if hp.dynamic_proposals and proposal_params is None:
        from .mh import proposal_params_for

        proposal_params = proposal_params_for(spec, priors, hp)

    def one_chain(chain_key):
        k_init, k_run = jax.random.split(chain_key)
        params0 = (
            init_params
            if init_params is not None
            else init_from_prior(k_init, spec, priors, data, dtype=dtype)
        )
        drifts0 = jnp.full((n_moves,), priors["drift"], dtype=dtype)

        def body(carry, step_key):
            params, drifts, it = carry
            if hp.dynamic_proposals:
                runtime_drifts = proposal_params
            elif hp.adapt_proposals:
                runtime_drifts = drifts
            else:
                runtime_drifts = None
            params, stats = outer_step(params, data, step_key, runtime_drifts)
            if hp.adapt_proposals:
                # Robbins-Monro on log proposal variance toward the target
                # acceptance rate, frozen after burn-in (diminishing/frozen
                # adaptation keeps the post-burn-in kernel exactly Markov).
                gamma = 0.5 / (1.0 + it) ** 0.6
                adapted = jnp.exp(
                    jnp.log(drifts) + gamma * (stats.move_accepts - hp.target_accept)
                )
                adapted = jnp.clip(adapted, 1e-4, 1e3)
                drifts = jnp.where(it < hp.n_burn_in, adapted, drifts)
            return (params, drifts, it + 1), (params, stats)

        (final, _, _), (samples, stats) = jax.lax.scan(
            body, (params0, drifts0, jnp.zeros((), dtype=dtype)), jax.random.split(k_run, hp.n_outer)
        )
        return samples, stats, final

    return one_chain


def run_mcmc(
    key: jax.Array,
    spec: ModelSpec,
    priors: dict,
    data: ModelData,
    hp: HyperParameters,
    init_params: Optional[GPSLCParams] = None,
    proposal_params=None,
):
    """Run ``hp.n_chains`` independent chains for ``hp.n_outer`` iterations.

    Returns ``(samples, stats, final_params)`` where every leaf of ``samples``
    has leading dims ``(n_chains, n_outer)`` — the reference's
    ``posteriorSamples`` vector of choicemaps (``src/inference.jl:56``),
    chain-batched. All-device computation; jit-compiled once per
    (spec, shapes) combination.
    """
    one_chain = make_chain_runner(spec, priors, data, hp, init_params, proposal_params)
    chain_keys = jax.random.split(key, hp.n_chains)
    return jax.vmap(one_chain)(chain_keys)


@partial(jax.jit, static_argnames=("spec", "hp", "priors_items"))
def _run_mcmc_jit(key, spec, priors_items, data, hp):
    return run_mcmc(key, spec, dict(priors_items), data, hp)


def run_mcmc_jit(key, spec, priors: dict, data, hp):
    """Jitted entry: hashable statics, priors passed as a frozen item tuple."""
    from ..hyperparameters import frozen_prior_items

    return _run_mcmc_jit(key, spec, frozen_prior_items(priors), data, hp)
