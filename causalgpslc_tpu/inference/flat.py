"""Flattened outer-step execution: one scan per chunk, no nested loop re-staging.

Round-4 on-chip probes (``benchmarks/profile_outer*.py``, results in
``benchmarks/profile*_r04.json`` and BASELINE.md) resolved the axon dispatch
model that round 3 could not reconcile:

- an XLA While loop's FIRST iteration streams op-by-op at ~0.12-0.17 s per
  MH sweep of work; subsequent iterations replay at ~0.016-0.025 s — a ~7x
  gap. Straight-line code always pays the streaming rate (``mh3u_es0``), and
  XLA unrolls trip-count-1 loops, which is why one rolled inner sweep costs
  the same as an explicit straight-line sweep (``mh1_es0`` == ``mh1u_es0``).
- the re-staging recurs at EVERY entry of a nested loop — i.e. once per
  OUTER iteration for the MH fori and the ES loop nest — which is the
  "budget-independent ~0.36 s/outer floor" of BASELINE.md round 3.
- a single flat scan over sweeps (no nested fori) runs every sweep at the
  replay rate: 0.0245 s/sweep uniformly (``flat_mh`` probe).

This module therefore executes the chunk as ONE ``lax.scan`` over phase
steps — ``[refresh, mh x n_mh, freeze, es x n_es, final]`` per outer
iteration, dispatched through ``lax.switch`` — so the expensive streaming
happens once per chunk program instead of once per outer iteration.

The schedule is an EXECUTION-ORDER-ONLY change: every phase body reuses the
same functions as :func:`causalgpslc_tpu.inference.gibbs.make_outer_step`
(``mh_sweep``/``mh_grouped_sweep``, ``ess_update``, ``compute_block_lps``,
the frozen-covariance factorization) with the identical per-step PRNG keys,
so samples are BIT-IDENTICAL to the rolled path (equivalence-tested in
``tests/test_flat.py``). Parity target: the same ``Posterior`` semantics of
``/root/reference/src/inference.jl`` as gibbs.py.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..hyperparameters import HyperParameters
from ..models.blocks import (
    BlockLps,
    compute_block_lps,
    logp_t_bernoulli,
    t_cov,
    u_conditional_loglik,
    u_cov,
)
from ..models.spec import GPSLCParams, ModelData, ModelSpec
from ..ops.blocked_chol import CholFactors, blocked_cholesky, mvn_logpdf_b
from ..ops.distributions import bernoulli_logit_logpdf
from ..ops.linalg import mvn_logpdf_chol, quantum_free_mode, stabilize_cov
from .ess import ess_update
from .gibbs import StepStats, _has_mh_inner_loop, _uses_logit_ess
from .mh import block_sites, mh_blocked_sweep, mh_grouped_sweep, mh_sweep, sweep_moves

__all__ = ["flat_phase_plan", "make_flat_chunk_fn"]

# phase/branch ids
REFRESH, MH, FREEZE, ES, FINAL = range(5)


class _FlatCarry(NamedTuple):
    params: GPSLCParams
    lps: BlockLps
    ess_l: Optional[jax.Array]  # stacked frozen factors (B, np, np) / (B, n, n)
    ess_linv: Optional[jax.Array]  # QFC diagonal-block inverses, else None
    x_sum: jax.Array
    t_lp: jax.Array
    y_lp: jax.Array
    bern_ll: jax.Array
    acc: jax.Array  # (n_moves,) accepted-count accumulator over the MH sweeps
    ess_iters: jax.Array
    log_joint: jax.Array


def _budgets(spec: ModelSpec, hp: HyperParameters):
    n_mh = hp.n_mh_inner if (_has_mh_inner_loop(spec) and hp.n_mh_inner) else 1
    n_es = hp.n_es_inner if hp.n_es_inner else 0
    use_u_ess = spec.has_u and n_es > 0
    use_logit_ess = _uses_logit_ess(spec) and n_es > 0
    return n_mh, n_es, use_u_ess, use_logit_ess


def flat_phase_plan(spec: ModelSpec, hp: HyperParameters) -> list[int]:
    """Static branch-id sequence of ONE outer iteration."""
    n_mh, n_es, use_u_ess, use_logit_ess = _budgets(spec, hp)
    plan = [REFRESH] + [MH] * n_mh
    if use_u_ess or use_logit_ess:
        plan += [FREEZE] + [ES] * n_es
    return plan + [FINAL]


def make_flat_chunk_fn(spec: ModelSpec, priors: dict, data: ModelData, hp: HyperParameters):
    """Build ``chunk(params, step_keys, drifts) -> (final, samples, stats)``.

    ``step_keys``: (n_steps, 2) per-outer-iteration keys — the same keys the
    rolled runner's ``lax.scan`` consumes, so the chain is bit-identical.
    Single-chain; callers ``vmap`` over chains exactly like the rolled path.
    """
    dtype = data.y.dtype
    n_mh, n_es, use_u_ess, use_logit_ess = _budgets(spec, hp)
    has_ess = use_u_ess or use_logit_ess
    qf_mode = quantum_free_mode(dtype)
    wide = (hp.mh_wide_drift, hp.mh_wide_prob) if hp.mh_wide_drift else None
    if hp.mh_block_sweep:
        base_sweep = mh_blocked_sweep
    elif hp.mh_grouped_sweep:
        base_sweep = mh_grouped_sweep
    else:
        base_sweep = mh_sweep
    from .mh import resolve_move_proposals

    move_cfg = None if hp.mh_block_sweep else resolve_move_proposals(spec, hp)
    n_moves = len(block_sites(spec)) if hp.mh_block_sweep else len(sweep_moves(spec))
    n_cov = (1 if use_u_ess else 0) + (1 if use_logit_ess else 0)

    plan = flat_phase_plan(spec, hp)
    spo = len(plan)  # steps per outer

    # -- frozen-factor carry shapes (via eval_shape; never executed) --------
    if has_ess:
        def _freeze_shapes(params):
            covs = []
            if use_u_ess:
                covs.append(u_cov(data, params))
            if use_logit_ess:
                covs.append(t_cov(spec, data, params))
            stacked = stabilize_cov(jnp.stack(covs))
            if qf_mode is not None:
                facs = blocked_cholesky(stacked, use_pallas=qf_mode == "pallas")
                return facs.l, facs.linv
            return jnp.linalg.cholesky(stacked), None
    else:
        _freeze_shapes = None

    # ---- phase bodies ------------------------------------------------------

    def refresh_branch(c: _FlatCarry, key, drifts):
        lps = compute_block_lps(spec, data, c.params)
        return c._replace(
            lps=lps,
            acc=jnp.zeros((n_moves,), dtype=dtype),
            ess_iters=jnp.zeros((), dtype=jnp.int32),
        )

    def mh_branch(c: _FlatCarry, key, drifts):
        kw = {} if move_cfg is None else {"move_cfg": move_cfg}
        params, lps, a = base_sweep(
            key, spec, priors, data, c.params, c.lps,
            drifts if (hp.adapt_proposals or hp.dynamic_proposals) else None, wide, **kw,
        )
        return c._replace(params=params, lps=lps, acc=c.acc + a)

    def freeze_branch(c: _FlatCarry, key, drifts):
        params, lps = c.params, c.lps
        covs = []
        if use_u_ess:
            covs.append(u_cov(data, params))
        if use_logit_ess:
            covs.append(t_cov(spec, data, params))
        stacked = stabilize_cov(jnp.stack(covs))
        if qf_mode is not None:
            facs = blocked_cholesky(stacked, use_pallas=qf_mode == "pallas")
            ess_l, ess_linv = facs.l, facs.linv
        else:
            ess_l, ess_linv = jnp.linalg.cholesky(stacked), None
        x_sum0 = jnp.sum(lps.x) if lps.x is not None else jnp.zeros((), dtype=dtype)
        bern_ll0 = (
            logp_t_bernoulli(spec, data, params)
            if spec.binary_t
            else jnp.zeros((), dtype=dtype)
        )
        return c._replace(
            ess_l=ess_l, ess_linv=ess_linv,
            x_sum=x_sum0, t_lp=lps.t, y_lp=lps.y, bern_ll=bern_ll0,
        )

    def _factors(c: _FlatCarry):
        if qf_mode is not None:
            dense = c.ess_l[..., : spec.n, : spec.n]

            def fac(i):
                return CholFactors(l=c.ess_l[i], linv=c.ess_linv[i], n=spec.n)
        else:
            dense = c.ess_l
            fac = None
        u_fac = fac(0) if (use_u_ess and fac is not None) else None
        t_fac = fac(n_cov - 1) if (use_logit_ess and fac is not None) else None
        u_chol = dense[0] if use_u_ess else None
        t_chol = dense[n_cov - 1] if use_logit_ess else None
        return u_fac, t_fac, u_chol, t_chol

    def es_branch(c: _FlatCarry, kj, drifts):
        # one ES sweep: identical body (and RNG substreams) to
        # gibbs.make_outer_step's es_sweep with kj = fold_in(k_ess, j)
        params = c.params
        x_sum, t_lp, y_lp, bern_ll, ess_iters = (
            c.x_sum, c.t_lp, c.y_lp, c.bern_ll, c.ess_iters,
        )
        u_fac, t_fac, u_chol, t_chol = _factors(c)

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

        return c._replace(
            params=params, x_sum=x_sum, t_lp=t_lp, y_lp=y_lp,
            bern_ll=bern_ll, ess_iters=ess_iters,
        )

    def final_branch(c: _FlatCarry, key, drifts):
        lps = c.lps
        if has_ess:
            lps_total = c.x_sum + c.t_lp + c.y_lp + (
                c.bern_ll if spec.binary_t else 0.0
            )
            if lps.u is not None:
                u_fac, _, u_chol, _ = _factors(c)
                if u_fac is not None:
                    lps_total = lps_total + jnp.sum(mvn_logpdf_b(c.params.u.T, u_fac))
                else:
                    lps_total = lps_total + jnp.sum(
                        jax.vmap(lambda col: mvn_logpdf_chol(col, u_chol))(c.params.u.T)
                    )
        else:
            lps_total = lps.t + lps.y
            if lps.x is not None:
                lps_total = lps_total + jnp.sum(lps.x)
            if lps.u is not None:
                lps_total = lps_total + lps.u
            if spec.binary_t:
                lps_total = lps_total + logp_t_bernoulli(spec, data, c.params)
        return c._replace(log_joint=lps_total)

    # lax.switch traces EVERY branch, so only include the phases the plan
    # uses (the NoU/NoCov degenerate variants have no freeze/es machinery)
    impl = {
        REFRESH: refresh_branch,
        MH: mh_branch,
        FREEZE: freeze_branch,
        ES: es_branch,
        FINAL: final_branch,
    }
    kinds = sorted(set(plan))
    branches = [impl[k] for k in kinds]
    kind_to_idx = {k: i for i, k in enumerate(kinds)}
    plan_idx = [kind_to_idx[k] for k in plan]

    # ---- the chunk ---------------------------------------------------------

    def chunk(params: GPSLCParams, step_keys: jax.Array, drifts):
        n_steps = step_keys.shape[0]

        def per_outer_keys(step_key):
            k_mh, k_ess = jax.random.split(step_key)
            ks = [step_key]  # refresh (unused)
            ks += [jax.random.fold_in(k_mh, i) for i in range(n_mh)]
            if has_ess:
                ks += [step_key]  # freeze (unused)
                ks += [jax.random.fold_in(k_ess, j) for j in range(n_es)]
            ks += [step_key]  # final (unused)
            return jnp.stack(ks)

        keys = jax.vmap(per_outer_keys)(step_keys).reshape((n_steps * spo,) + step_keys.shape[1:])
        branch_ids = jnp.asarray(np.tile(np.asarray(plan_idx, dtype=np.int32), n_steps))

        lps0 = compute_block_lps(spec, data, params)
        if has_ess:
            l_sh, linv_sh = jax.eval_shape(_freeze_shapes, params)
            ess_l0 = jnp.zeros(l_sh.shape, dtype=l_sh.dtype)
            ess_linv0 = (
                jnp.zeros(linv_sh.shape, dtype=linv_sh.dtype)
                if linv_sh is not None
                else None
            )
        else:
            ess_l0 = ess_linv0 = None
        carry0 = _FlatCarry(
            params=params,
            lps=lps0,
            ess_l=ess_l0,
            ess_linv=ess_linv0,
            x_sum=jnp.zeros((), dtype=dtype),
            t_lp=jnp.zeros((), dtype=dtype),
            y_lp=jnp.zeros((), dtype=dtype),
            bern_ll=jnp.zeros((), dtype=dtype),
            acc=jnp.zeros((n_moves,), dtype=dtype),
            ess_iters=jnp.zeros((), dtype=jnp.int32),
            log_joint=jnp.zeros((), dtype=dtype),
        )

        def body(c, x):
            bid, key = x
            c = jax.lax.switch(bid, branches, c, key, drifts)
            return c, (c.params, c.acc, c.ess_iters, c.log_joint)

        final, (all_params, all_acc, all_iters, all_lj) = jax.lax.scan(
            body, carry0, (branch_ids, keys)
        )

        # gather the end-of-outer-iteration states (the FINAL steps)
        take = np.arange(1, n_steps + 1) * spo - 1
        samples = jax.tree.map(lambda a: a[take] if a is not None else None, all_params)
        move_accepts = all_acc[take] / n_mh
        stats = StepStats(
            mh_accept_rate=jnp.mean(move_accepts, axis=-1),
            ess_iters=all_iters[take],
            log_joint_blocks=all_lj[take],
            move_accepts=move_accepts,
        )
        return final.params, samples, stats

    return chunk
