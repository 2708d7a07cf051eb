"""Mid-run checkpoint/resume: interrupted runs must reproduce uninterrupted ones."""

import pathlib

import jax
import numpy as np

import causalgpslc_tpu as cg
from causalgpslc_tpu.models.spec import make_model_data
from causalgpslc_tpu.parallel.checkpoint import (
    load_chain_state,
    run_mcmc_checkpointed,
    save_chain_state,
)


def setup(n_chains=2):
    d = cg.prepare_data(str(pathlib.Path(__file__).parent / "data" / "no_cov.csv"))
    hp = cg.default_hyperparameters(
        n_outer=6, n_mh_inner=1, n_es_inner=1, n_burn_in=1, n_u=1, n_chains=n_chains
    )
    pp = cg.default_prior_parameters()
    spec, data = make_model_data(d, n_u=hp.n_u)
    return spec, pp, data, hp


def test_checkpoint_round_trip(tmp_path):
    spec, pp, data, hp = setup()
    path = str(tmp_path / "state.npz")
    key = jax.random.PRNGKey(0)
    samples, _, final = run_mcmc_checkpointed(key, spec, pp, data, hp, path, checkpoint_every=2)
    assert samples.ty_ls.shape == (hp.n_chains, hp.n_outer)
    params, key_arr, outer_done, saved_samples = load_chain_state(path)
    assert outer_done == hp.n_outer
    np.testing.assert_array_equal(np.asarray(saved_samples.ty_ls), np.asarray(samples.ty_ls))


def test_resume_matches_uninterrupted(tmp_path):
    spec, pp, data, hp = setup()
    key = jax.random.PRNGKey(1)

    full_path = str(tmp_path / "full.npz")
    samples_full, _, _ = run_mcmc_checkpointed(key, spec, pp, data, hp, full_path, checkpoint_every=3)

    # interrupted: run 1 chunk only, then resume from the checkpoint file
    part_path = str(tmp_path / "part.npz")
    hp_short = hp.replace(n_outer=3)
    run_mcmc_checkpointed(key, spec, pp, data, hp_short, part_path, checkpoint_every=3)
    samples_resumed, _, _ = run_mcmc_checkpointed(key, spec, pp, data, hp, part_path, checkpoint_every=3)

    np.testing.assert_allclose(
        np.asarray(samples_resumed.ty_ls), np.asarray(samples_full.ty_ls), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(samples_resumed.u), np.asarray(samples_full.u), rtol=1e-12
    )


def test_pooled_adaptation_in_chunked_runner(tmp_path):
    """Chunked runs adapt proposal variances from POOLED cross-chain
    acceptance during burn-in; the run completes and moves all sites."""
    from causalgpslc_tpu.diagnostics import stuck_sites

    spec, pp, data, hp = setup(n_chains=4)
    hp = hp.replace(n_outer=12, n_burn_in=8, adapt_proposals=True)
    samples, _, _ = run_mcmc_checkpointed(
        jax.random.PRNGKey(3), spec, pp, data, hp, None, checkpoint_every=3
    )
    assert samples.ty_ls.shape == (4, 12)
    assert stuck_sites(samples) == []
