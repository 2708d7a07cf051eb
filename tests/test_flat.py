"""Flattened chunk execution (inference/flat.py) vs the rolled outer scan.

The flat schedule is an execution-order-only change (one scan of
switch-dispatched phase steps per chunk instead of nested inner loops), so
samples and stats must be BIT-IDENTICAL to the rolled runner for every model
variant and sampler option — the same guarantee class as the grouped-sweep
and scan_unroll equivalences.
"""

import pathlib

import jax
import numpy as np
import pandas as pd
import pytest

import causalgpslc_tpu as cg
from causalgpslc_tpu.models.spec import ModelSpec, make_model_data
from causalgpslc_tpu.parallel.checkpoint import run_mcmc_checkpointed

DATA = pathlib.Path(__file__).parent / "data"


def _setup(csv, **hp_overrides):
    d = cg.prepare_data(str(DATA / csv))
    kw = dict(n_outer=5, n_mh_inner=2, n_es_inner=2, n_burn_in=1, n_u=1, n_chains=2)
    kw.update(hp_overrides)
    hp = cg.default_hyperparameters(**kw)
    pp = cg.default_prior_parameters()
    spec, data = make_model_data(d, n_u=hp.n_u)
    return spec, pp, data, hp


def _run_both(spec, pp, data, hp, key=0, checkpoint_every=3):
    out = {}
    for flat in (False, True):
        s, st, f = run_mcmc_checkpointed(
            jax.random.PRNGKey(key), spec, pp, data, hp.replace(flat_execution=flat),
            None, checkpoint_every=checkpoint_every,
        )
        out[flat] = (s, st, f)
    return out


def _assert_identical(out, stats_too=True):
    s0, st0, f0 = out[False]
    s1, st1, f1 = out[True]
    for field in s0._fields:
        a, b = getattr(s0, field), getattr(s1, field)
        if a is None:
            assert b is None, field
            continue
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=field)
    if stats_too:
        for field in st0._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(st0, field)), np.asarray(getattr(st1, field)),
                rtol=1e-12, atol=1e-14, err_msg=field,
            )
    for field in f0._fields:
        a, b = getattr(f0, field), getattr(f1, field)
        if a is None:
            continue
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=field)


def test_flat_identical_nocov_continuous():
    spec, pp, data, hp = _setup("no_cov.csv")
    _assert_identical(_run_both(spec, pp, data, hp))


def test_flat_identical_with_covariates():
    spec, pp, data, hp = _setup("minimal.csv")
    _assert_identical(_run_both(spec, pp, data, hp))


def test_flat_identical_binary_treatment():
    rng = np.random.default_rng(0)
    n = 16
    df = pd.DataFrame(
        {
            "T": (rng.uniform(size=n) < 0.5).astype(float),
            "Y": rng.normal(size=n),
            "obj": np.repeat(np.arange(4), 4),
        }
    )
    d = cg.prepare_data(df)
    hp = cg.default_hyperparameters(
        n_outer=4, n_mh_inner=2, n_es_inner=2, n_burn_in=1, n_u=1, n_chains=2
    )
    pp = cg.default_prior_parameters()
    spec, data = make_model_data(d, n_u=hp.n_u)
    assert spec.binary_t
    _assert_identical(_run_both(spec, pp, data, hp))


def test_flat_identical_nou_degenerate():
    """NoU + NoCov: MH-only path (no ESS phases in the plan)."""
    from causalgpslc_tpu.inference.flat import FINAL, MH, REFRESH, flat_phase_plan

    spec, pp, data, hp = _setup("no_cov.csv", n_u=None, n_mh_inner=None, n_es_inner=None)
    plan = flat_phase_plan(spec, hp)
    assert plan[0] == REFRESH and plan[-1] == FINAL and set(plan[1:-1]) == {MH}
    _assert_identical(_run_both(spec, pp, data, hp))


def test_flat_identical_wide_and_specbatch():
    """Bench-shaped options: wide-jump mixture + speculative ESS batching."""
    spec, pp, data, hp = _setup(
        "no_cov.csv", mh_wide_drift=100.0, mh_wide_prob=0.3, ess_spec_batch=4
    )
    _assert_identical(_run_both(spec, pp, data, hp))


def test_flat_identical_grouped_sweep():
    spec, pp, data, hp = _setup("minimal.csv", mh_grouped_sweep=True)
    _assert_identical(_run_both(spec, pp, data, hp))


def test_flat_identical_blocked_sweep():
    spec, pp, data, hp = _setup("minimal.csv", mh_block_sweep=True)
    _assert_identical(_run_both(spec, pp, data, hp))


def test_flat_identical_adaptive_drifts():
    spec, pp, data, hp = _setup("no_cov.csv", adapt_proposals=True, n_burn_in=4, n_outer=6)
    _assert_identical(_run_both(spec, pp, data, hp))


def test_flat_identical_at_other_chunkings():
    """flat == rolled at every chunk size (per-chunk key derivation is shared,
    so the comparison holds chunking-by-chunking; note chunking itself changes
    the key tree in BOTH runners by design)."""
    spec, pp, data, hp = _setup("no_cov.csv")
    for every in (1, 5):
        _assert_identical(_run_both(spec, pp, data, hp, key=3, checkpoint_every=every))
