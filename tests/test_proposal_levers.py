"""Round-5 statistical-efficiency levers: per-site proposals, delayed
rejection, interleaved Gibbs rounds.

All three are exact kernels for the same posterior; the tests check
(a) exactness — DR and per-site mixtures leave their targets invariant,
(b) wiring — overrides that restate the global configuration reproduce the
default chain bit-for-bit across every execution schedule,
(c) behavior — interleaved rounds still move every site and conserve the
total inner budget.

Reference kernel being improved: ``/root/reference/src/inference.jl:21-57``
+ ``src/proposal.jl:32-41`` (fixed drift=0.5 single-component proposal).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import causalgpslc_tpu as cg
from causalgpslc_tpu.diagnostics import stuck_sites
from causalgpslc_tpu.inference.gibbs import make_outer_step, run_mcmc_jit
from causalgpslc_tpu.inference.mh import (
    mh_move,
    mh_move_dr,
    resolve_move_proposals,
    sweep_moves,
)
from causalgpslc_tpu.models.blocks import compute_block_lps
from causalgpslc_tpu.models.state import init_from_prior
from causalgpslc_tpu.ops.distributions import inv_gamma_logpdf
from causalgpslc_tpu.inference.proposal import propose, proposal_logpdf

from test_models import make_case


# ---------------------------------------------------------------------------
# (a) exactness
# ---------------------------------------------------------------------------


def test_delayed_rejection_scalar_invariance():
    """Independent re-derivation of the two-stage DR acceptance on a pure
    InvGamma target (no likelihood): wide stage 1, narrow stage 2 from the
    current point, Tierney-Mira correction. Long-run moments must match
    InvGamma(4, 4)."""
    shape, scale, drift, wide_var = 4.0, 4.0, 0.5, 50.0

    def log1mexp(la):
        la = jnp.minimum(la, 0.0)
        return jnp.where(la < -0.693, jnp.log1p(-jnp.exp(la)), jnp.log(-jnp.expm1(la)))

    def pi(v):
        return inv_gamma_logpdf(v, shape, scale)

    def step(x, key):
        k1, k2, ka1, ka2 = jax.random.split(key, 4)
        y1 = propose(k1, x, wide_var)
        la1 = (pi(y1) - pi(x)) + proposal_logpdf(x, y1, wide_var) - proposal_logpdf(y1, x, wide_var)
        acc1 = jnp.log(jax.random.uniform(ka1, dtype=x.dtype)) < la1
        y2 = propose(k2, x, drift)
        la1_rev = (pi(y1) - pi(y2)) + proposal_logpdf(y2, y1, wide_var) - proposal_logpdf(y1, y2, wide_var)
        log_num = pi(y2) + proposal_logpdf(y1, y2, wide_var) + proposal_logpdf(x, y2, drift) + log1mexp(la1_rev)
        log_den = pi(x) + proposal_logpdf(y1, x, wide_var) + proposal_logpdf(y2, x, drift) + log1mexp(la1)
        acc2 = (~acc1) & (jnp.log(jax.random.uniform(ka2, dtype=x.dtype)) < log_num - log_den)
        out = jnp.where(acc1, y1, jnp.where(acc2, y2, x))
        return out, out

    keys = jax.random.split(jax.random.PRNGKey(5), 80000)
    _, draws = jax.lax.scan(step, jnp.asarray(1.0), keys)
    draws = np.asarray(draws)[8000:]
    # InvGamma(4, 4): mean = 4/3, var = 8/9
    assert draws.mean() == pytest.approx(4.0 / 3.0, rel=0.05)
    assert draws.var() == pytest.approx(8.0 / 9.0, rel=0.25)


def test_mh_move_dr_matches_plain_move_conditional():
    """mh_move_dr and mh_move target the same conditional p(ty_ls | rest):
    two long single-site chains from the same state must agree in
    distribution (mean/quantiles), which pins the in-tree DR acceptance (not
    just the scalar re-derivation above) to the exact conditional."""
    spec, data = make_case(True, False, False)
    pp = cg.default_prior_parameters()
    params = init_from_prior(jax.random.PRNGKey(0), spec, pp, data)
    lps0 = compute_block_lps(spec, data, params)

    def chain(move_fn, key, n_steps):
        def step(carry, k):
            p, lps = carry
            p, lps, _ = move_fn(k, p, lps)
            return (p, lps), p.ty_ls

        keys = jax.random.split(key, n_steps)
        _, draws = jax.lax.scan(step, (params, lps0), keys)
        return np.asarray(draws)

    def plain(k, p, lps):
        return mh_move(k, spec, pp, data, p, lps, "ty_ls", None, None, (50.0, 0.3))

    def dr(k, p, lps):
        return mh_move_dr(k, spec, pp, data, p, lps, "ty_ls", None, None, 50.0)

    d_plain = chain(plain, jax.random.PRNGKey(1), 40000)[4000:]
    d_dr = chain(dr, jax.random.PRNGKey(2), 40000)[4000:]
    assert d_plain.mean() == pytest.approx(d_dr.mean(), rel=0.1)
    for q in (0.1, 0.5, 0.9):
        assert np.quantile(d_plain, q) == pytest.approx(np.quantile(d_dr, q), rel=0.15)


def test_dr_stage2_recovers_narrow_acceptance():
    """DR must accept strictly more often than the always-wide single-stage
    kernel (stage 2 recovers narrow moves the wide stage rejected) — the
    whole point of the construction."""
    spec, data = make_case(True, False, False)
    pp = cg.default_prior_parameters()
    params = init_from_prior(jax.random.PRNGKey(0), spec, pp, data)
    lps0 = compute_block_lps(spec, data, params)

    def run(move_fn, n_steps=4000):
        def step(carry, k):
            p, lps, acc = carry
            p, lps, a = move_fn(k, p, lps)
            return (p, lps, acc + a), None

        keys = jax.random.split(jax.random.PRNGKey(9), n_steps)
        (_, _, acc), _ = jax.lax.scan(step, (params, lps0, jnp.zeros((), jnp.int32)), keys)
        return int(acc) / n_steps

    wide_only = run(lambda k, p, l: mh_move(k, spec, pp, data, p, l, "ty_ls", None, None, (50.0, 1.0)))
    dr = run(lambda k, p, l: mh_move_dr(k, spec, pp, data, p, l, "ty_ls", None, None, 50.0))
    assert dr > wide_only


# ---------------------------------------------------------------------------
# (b) wiring: restated-default overrides are bit-identical
# ---------------------------------------------------------------------------


def _mcmc(spec, data, pp, **hp_kw):
    kw = dict(
        n_u=spec.n_u, n_outer=4, n_mh_inner=3, n_es_inner=2, n_burn_in=1,
        n_chains=2, inner_unroll=False,
    )
    kw.update(hp_kw)
    hp = cg.default_hyperparameters(**kw)
    return run_mcmc_jit(jax.random.PRNGKey(11), spec, pp, data, hp)


def _assert_samples_equal(a, b):
    for f in a._fields:
        x, y = getattr(a, f), getattr(b, f)
        if x is None:
            assert y is None, f
            continue
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=f)


@pytest.mark.parametrize("grouped", [False, True])
def test_site_proposals_restating_global_is_bit_identical(grouped):
    """mh_site_proposals entries that restate the global (drift, wide)
    configuration must reproduce the default chain bit-for-bit, for both the
    site sweep and the grouped execution."""
    spec, data = make_case(True, True, False)
    pp = cg.default_prior_parameters()
    base, _, _ = _mcmc(
        spec, data, pp, mh_wide_drift=100.0, mh_wide_prob=0.3, mh_grouped_sweep=grouped
    )
    fields = sorted({f for f, _ in sweep_moves(spec)})
    over = tuple((f, pp["drift"], 100.0, 0.3) for f in fields)
    redo, _, _ = _mcmc(
        spec, data, pp, mh_wide_drift=100.0, mh_wide_prob=0.3,
        mh_grouped_sweep=grouped, mh_site_proposals=over,
    )
    _assert_samples_equal(base, redo)


def test_site_proposals_change_only_listed_fields():
    """An override on ty_ls alone must leave the other sites' proposal
    streams intact (same RNG keys), so non-ty_ls draws of the FIRST sweep
    agree with the default chain's first sweep."""
    spec, data = make_case(True, False, False)
    pp = cg.default_prior_parameters()
    cfg = resolve_move_proposals(
        spec,
        cg.default_hyperparameters(
            mh_wide_drift=100.0, mh_wide_prob=0.3,
            mh_site_proposals=(("ty_ls", 2.0, 300.0, 0.7),),
        ),
    )
    moves = sweep_moves(spec)
    for (field, _), (drift, wide, dr) in zip(moves, cfg):
        if field == "ty_ls":
            assert (drift, wide, dr) == (2.0, (300.0, 0.7), False)
        else:
            assert (drift, wide, dr) == (None, (100.0, 0.3), False)


def test_dr_fields_run_and_mix():
    """End-to-end Gibbs with DR on the y-block lengthscale: runs for the
    full model, no stuck sites, samples finite."""
    spec, data = make_case(True, False, False)
    pp = cg.default_prior_parameters()
    samples, stats, _ = _mcmc(
        spec, data, pp, n_outer=12, n_mh_inner=4,
        mh_wide_drift=100.0, mh_wide_prob=0.3, mh_dr_fields=("ty_ls", "uy_ls"),
    )
    assert np.isfinite(np.asarray(samples.ty_ls)).all()
    stuck = stuck_sites(samples)
    assert not stuck, f"stuck sites with DR: {stuck}"
    assert np.isfinite(np.asarray(stats.log_joint_blocks)).all()


# ---------------------------------------------------------------------------
# (c) interleaved Gibbs rounds
# ---------------------------------------------------------------------------


def test_gibbs_rounds_counts_split():
    from causalgpslc_tpu.inference.gibbs import _split_counts

    assert _split_counts(10, 2) == [5, 5]
    assert _split_counts(5, 2) == [2, 3]
    assert _split_counts(5, 3) == [1, 2, 2]
    assert _split_counts(1, 1) == [1]


@pytest.mark.parametrize("binary_t", [False, True])
def test_gibbs_rounds_interleaved_runs_and_mixes(binary_t):
    """rounds=2 on the full model: every site still moves, the per-move
    acceptance average stays a fraction of the SAME total inner budget, and
    the log-joint stays finite (the interleaved schedule is a composition of
    the same exact kernels)."""
    spec, data = make_case(True, False, binary_t)
    pp = cg.default_prior_parameters()
    samples, stats, _ = _mcmc(
        spec, data, pp, n_outer=12, n_mh_inner=4, n_es_inner=2, gibbs_rounds=2,
        mh_wide_drift=100.0, mh_wide_prob=0.3,
    )
    stuck = stuck_sites(samples)
    assert not stuck, f"stuck sites with gibbs_rounds=2: {stuck}"
    ma = np.asarray(stats.move_accepts)
    assert ma.min() >= 0.0 and ma.max() <= 1.0
    assert np.isfinite(np.asarray(stats.log_joint_blocks)).all()
    # ESS ran in both rounds: iteration counts at least the per-sweep minimum
    assert int(np.min(np.asarray(stats.ess_iters))) >= 1


def test_gibbs_rounds_one_is_default_schedule():
    """gibbs_rounds=1 must be bit-identical to an hp without the field
    (the default path is the round-4 program)."""
    spec, data = make_case(True, False, False)
    pp = cg.default_prior_parameters()
    a, _, _ = _mcmc(spec, data, pp)
    b, _, _ = _mcmc(spec, data, pp, gibbs_rounds=1)
    _assert_samples_equal(a, b)


def test_gibbs_rounds_validation():
    with pytest.raises(ValueError, match="gibbs_rounds"):
        cg.default_hyperparameters(gibbs_rounds=0)
    with pytest.raises(ValueError, match="flat_execution"):
        cg.default_hyperparameters(gibbs_rounds=2, flat_execution=True)
    with pytest.raises(ValueError, match="site or grouped"):
        cg.default_hyperparameters(
            mh_site_proposals=(("ty_ls", 0.5, 100.0, 0.3),), mh_block_sweep=True
        )
    with pytest.raises(ValueError, match="site sweep"):
        cg.default_hyperparameters(mh_dr_fields=("ty_ls",), mh_grouped_sweep=True)
    with pytest.raises(ValueError, match="wide variance"):
        resolve_move_proposals(
            make_case(True, False, False)[0],
            cg.default_hyperparameters(mh_dr_fields=("ty_ls",)),
        )


# ---------------------------------------------------------------------------
# (d) dynamic (runtime) proposal parameters
# ---------------------------------------------------------------------------


def test_dynamic_proposals_restating_global_bit_identical():
    """ProposalParams restating the static global mixture must reproduce the
    static chain bit-for-bit (same RNG stream: both paths split + bernoulli +
    draw), through the chunked runner bench.py uses."""
    from causalgpslc_tpu.inference.mh import proposal_params_for
    from causalgpslc_tpu.parallel.checkpoint import run_mcmc_checkpointed

    spec, data = make_case(True, False, False)
    pp = cg.default_prior_parameters()
    kw = dict(
        n_u=spec.n_u, n_outer=4, n_mh_inner=3, n_es_inner=2, n_burn_in=1,
        n_chains=2, inner_unroll=False, mh_wide_drift=100.0, mh_wide_prob=0.3,
    )
    hp_s = cg.default_hyperparameters(**kw)
    hp_d = cg.default_hyperparameters(**kw, dynamic_proposals=True)
    s_static, _, _ = run_mcmc_checkpointed(
        jax.random.PRNGKey(4), spec, pp, data, hp_s, None, checkpoint_every=2
    )
    pprm = proposal_params_for(spec, pp, hp_d)
    np.testing.assert_allclose(np.asarray(pprm.narrow), 0.5)
    np.testing.assert_allclose(np.asarray(pprm.wide_var), 100.0)
    np.testing.assert_allclose(np.asarray(pprm.wide_prob), 0.3)
    s_dyn, _, _ = run_mcmc_checkpointed(
        jax.random.PRNGKey(4), spec, pp, data, hp_d, None, checkpoint_every=2,
        proposal_params=pprm,
    )
    _assert_samples_equal(s_static, s_dyn)


def test_dynamic_proposals_change_chains_through_chunked_runner():
    """A NON-restating ProposalParams passed through run_mcmc_checkpointed
    must actually change the chains (regression: the drifts slot was being
    overwritten with the flat static array whenever checkpoint_path was
    None, so every 'retuned' run silently reran the static kernel — the
    restating test cannot catch that, since the fallback is bit-identical
    to the static chain by construction)."""
    from causalgpslc_tpu.inference.mh import proposal_params_for
    from causalgpslc_tpu.parallel.checkpoint import run_mcmc_checkpointed

    spec, data = make_case(True, False, False)
    pp = cg.default_prior_parameters()
    kw = dict(
        n_u=spec.n_u, n_outer=4, n_mh_inner=3, n_es_inner=2, n_burn_in=1,
        n_chains=2, inner_unroll=False, mh_wide_drift=100.0, mh_wide_prob=0.3,
    )
    hp_d = cg.default_hyperparameters(**kw, dynamic_proposals=True)
    pprm = proposal_params_for(spec, pp, hp_d)
    base, _, _ = run_mcmc_checkpointed(
        jax.random.PRNGKey(4), spec, pp, data, hp_d, None, checkpoint_every=2,
        proposal_params=pprm,
    )
    retuned, _, _ = run_mcmc_checkpointed(
        jax.random.PRNGKey(4), spec, pp, data, hp_d, None, checkpoint_every=2,
        proposal_params=pprm._replace(
            wide_prob=jnp.zeros_like(pprm.wide_prob),
            narrow=jnp.full_like(pprm.narrow, 0.05),
        ),
    )
    assert not np.allclose(np.asarray(base.ty_ls), np.asarray(retuned.ty_ls))


def test_dynamic_proposals_retune_without_retrace():
    """Different ProposalParams inputs reuse ONE traced program (the whole
    point: on-chip kernel search without 15-min recompiles) and produce
    different chains."""
    from causalgpslc_tpu.inference.gibbs import make_outer_step
    from causalgpslc_tpu.inference.mh import ProposalParams, sweep_moves

    spec, data = make_case(True, False, False)
    pp = cg.default_prior_parameters()
    hp = cg.default_hyperparameters(
        n_u=spec.n_u, n_mh_inner=2, n_es_inner=1, inner_unroll=False,
        dynamic_proposals=True,
    )
    step = make_outer_step(spec, pp, hp)
    from causalgpslc_tpu.models.state import init_from_prior

    params = init_from_prior(jax.random.PRNGKey(0), spec, pp, data)
    n_moves = len(sweep_moves(spec))
    traces = []

    @jax.jit
    def stepj(params, key, pprm):
        traces.append(1)
        return step(params, data, key, pprm)

    def mk(wp):
        return ProposalParams(
            narrow=jnp.full((n_moves,), 0.5),
            wide_var=jnp.full((n_moves,), 100.0),
            wide_prob=jnp.full((n_moves,), wp),
        )

    out1, _ = stepj(params, jax.random.PRNGKey(1), mk(0.3))
    out2, _ = stepj(params, jax.random.PRNGKey(1), mk(0.9))
    assert len(traces) == 1, "retrace on new ProposalParams values"
    assert not np.allclose(np.asarray(out1.ty_ls), np.asarray(out2.ty_ls))


def test_dynamic_proposals_validation():
    with pytest.raises(ValueError, match="mutually exclusive"):
        cg.default_hyperparameters(dynamic_proposals=True, adapt_proposals=True)
    with pytest.raises(ValueError, match="site or grouped"):
        cg.default_hyperparameters(dynamic_proposals=True, mh_block_sweep=True)
