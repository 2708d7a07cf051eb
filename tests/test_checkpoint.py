"""Mid-run checkpoint/resume: interrupted runs must reproduce uninterrupted ones."""

import pathlib

import jax
import numpy as np
import pytest

import causalgpslc_tpu as cg
from causalgpslc_tpu.models.spec import make_model_data
from causalgpslc_tpu.parallel.checkpoint import (
    load_chain_state,
    run_mcmc_checkpointed,
    save_chain_state,
)


def setup(n_chains=2, **hp_overrides):
    d = cg.prepare_data(str(pathlib.Path(__file__).parent / "data" / "no_cov.csv"))
    kw = dict(n_outer=6, n_mh_inner=1, n_es_inner=1, n_burn_in=1, n_u=1, n_chains=n_chains)
    kw.update(hp_overrides)
    hp = cg.default_hyperparameters(**kw)
    pp = cg.default_prior_parameters()
    spec, data = make_model_data(d, n_u=hp.n_u)
    return spec, pp, data, hp


def test_checkpoint_round_trip(tmp_path):
    spec, pp, data, hp = setup()
    path = str(tmp_path / "state.npz")
    key = jax.random.PRNGKey(0)
    samples, stats, final = run_mcmc_checkpointed(key, spec, pp, data, hp, path, checkpoint_every=2)
    assert samples.ty_ls.shape == (hp.n_chains, hp.n_outer)
    # the chunked runner returns the full concatenated StepStats (the
    # verbose/chunked path must not lose diagnostics)
    assert stats is not None
    assert stats.mh_accept_rate.shape == (hp.n_chains, hp.n_outer)
    assert stats.log_joint_blocks.shape == (hp.n_chains, hp.n_outer)
    params, key_arr, outer_done, saved_samples, _drifts, saved_stats = load_chain_state(path)
    assert outer_done == hp.n_outer
    np.testing.assert_array_equal(np.asarray(saved_samples.ty_ls), np.asarray(samples.ty_ls))
    # stats persist in the snapshot, aligned with the samples
    assert saved_stats is not None
    np.testing.assert_array_equal(
        saved_stats["mh_accept_rate"], np.asarray(stats.mh_accept_rate)
    )


class _Interrupt(Exception):
    pass


def _crash_after(n_outer_done):
    """Progress callback simulating a crash right after a checkpoint write
    (the runner saves state before reporting progress)."""

    def cb(done, total):
        if done >= n_outer_done:
            raise _Interrupt

    return cb


@pytest.mark.parametrize("adapt", [False, True])
def test_resume_matches_uninterrupted(tmp_path, adapt):
    """Bit-exact resume, with and without proposal adaptation: adapted drift
    variances are Markov-chain state and must survive the checkpoint (silently
    resetting them mid-burn-in would change the continuation)."""
    # n_burn_in > first chunk so adaptation is active at the resume boundary
    spec, pp, data, hp = setup(adapt_proposals=adapt, n_burn_in=5 if adapt else 1)
    key = jax.random.PRNGKey(1)

    full_path = str(tmp_path / "full.npz")
    samples_full, _, _ = run_mcmc_checkpointed(key, spec, pp, data, hp, full_path, checkpoint_every=3)

    # interrupted: crash after the first chunk's checkpoint, then resume
    part_path = str(tmp_path / "part.npz")
    with pytest.raises(_Interrupt):
        run_mcmc_checkpointed(
            key, spec, pp, data, hp, part_path, checkpoint_every=3,
            progress_callback=_crash_after(3),
        )
    if adapt:
        _, _, _, _, drifts, _ = load_chain_state(part_path)
        assert drifts is not None
        assert not np.allclose(drifts, pp["drift"])  # adaptation actually moved them
    samples_resumed, stats_resumed, _ = run_mcmc_checkpointed(key, spec, pp, data, hp, part_path, checkpoint_every=3)

    np.testing.assert_allclose(
        np.asarray(samples_resumed.ty_ls), np.asarray(samples_full.ty_ls), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(samples_resumed.u), np.asarray(samples_full.u), rtol=1e-12
    )
    # stats cover the FULL horizon after a resume (pre-crash chunks restored
    # from the snapshot), staying aligned with the samples
    assert stats_resumed.mh_accept_rate.shape == (hp.n_chains, hp.n_outer)
    assert np.all(np.isfinite(np.asarray(stats_resumed.log_joint_blocks)))


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


def test_pooled_adaptation_identical_across_mesh_sizes(tmp_path):
    """The sharded chunked runner pools step-size adaptation across EVERY
    chain regardless of device layout (VERDICT r3 item 4): with
    adapt_proposals=True the adapted drifts — and hence the samples — match
    between a 1-device and an 8-device chain mesh (the pooled mean is the
    same global mean either way; the all-reduce rides the chain axis)."""
    from causalgpslc_tpu.parallel.mesh import chain_mesh

    spec, pp, data, hp = setup(n_chains=8)
    hp = hp.replace(n_outer=6, n_burn_in=5, adapt_proposals=True)
    key = jax.random.PRNGKey(7)

    paths = {}
    for n_dev in (1, 8):
        path = str(tmp_path / f"mesh{n_dev}.npz")
        paths[n_dev] = path
        samples, _, _ = run_mcmc_checkpointed(
            key, spec, pp, data, hp, path, checkpoint_every=2,
            mesh=chain_mesh(n_dev),
        )
        if n_dev == 1:
            ref = np.asarray(samples.ty_ls)
    np.testing.assert_allclose(np.asarray(samples.ty_ls), ref, rtol=1e-12, atol=1e-13)
    d1 = load_chain_state(paths[1])[4]
    d8 = load_chain_state(paths[8])[4]
    assert not np.allclose(d1, cg.default_prior_parameters()["drift"])  # adapted
    np.testing.assert_allclose(d1, d8, rtol=1e-13)


def test_sharded_chunked_matches_unsharded(tmp_path):
    """mesh= on the chunked runner reproduces the unsharded chunked run."""
    from causalgpslc_tpu.parallel.mesh import chain_mesh

    spec, pp, data, hp = setup(n_chains=8)
    key = jax.random.PRNGKey(5)
    s_plain, _, _ = run_mcmc_checkpointed(key, spec, pp, data, hp, None, checkpoint_every=3)
    s_shard, _, _ = run_mcmc_checkpointed(
        key, spec, pp, data, hp, None, checkpoint_every=3, mesh=chain_mesh()
    )
    for f in s_plain._fields:
        a, b = getattr(s_plain, f), getattr(s_shard, f)
        if a is None:
            continue
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-13, err_msg=f
        )


def test_scan_unroll_bitwise_identical():
    """scan_unroll>1 executes several outer iterations per XLA While
    iteration — same RNG stream, bit-identical samples."""
    spec, pp, data, hp = setup()
    key = jax.random.PRNGKey(9)
    outs = {}
    for u in (1, 3):
        s, _, _ = run_mcmc_checkpointed(
            key, spec, pp, data, hp, None, checkpoint_every=6, scan_unroll=u
        )
        outs[u] = s
    for f in outs[1]._fields:
        a, b = getattr(outs[1], f), getattr(outs[3], f)
        if a is None:
            continue
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=f)


def test_resume_under_mesh_matches_uninterrupted(tmp_path):
    """Crash-resume of the SHARDED chunked runner: the restored state must
    continue bit-compatibly with an uninterrupted sharded run."""
    from causalgpslc_tpu.parallel.mesh import chain_mesh

    spec, pp, data, hp = setup(n_chains=8)
    key = jax.random.PRNGKey(11)
    mesh = chain_mesh()

    full, _, _ = run_mcmc_checkpointed(
        key, spec, pp, data, hp, str(tmp_path / "f.npz"), checkpoint_every=3, mesh=mesh
    )
    part = str(tmp_path / "p.npz")
    with pytest.raises(_Interrupt):
        run_mcmc_checkpointed(
            key, spec, pp, data, hp, part, checkpoint_every=3, mesh=mesh,
            progress_callback=_crash_after(3),
        )
    resumed, stats, _ = run_mcmc_checkpointed(
        key, spec, pp, data, hp, part, checkpoint_every=3, mesh=mesh
    )
    np.testing.assert_allclose(
        np.asarray(resumed.ty_ls), np.asarray(full.ty_ls), rtol=1e-12
    )
    assert stats.mh_accept_rate.shape == (hp.n_chains, hp.n_outer)


def test_elastic_resume_across_mesh_sizes(tmp_path):
    """Elastic resume (VERDICT r4 item 6): a run checkpointed on an 8-device
    chain mesh resumes on a 4-device mesh — the snapshot records the global
    chain layout and the runner re-slices it for whatever layout resumes —
    matching the uninterrupted 8-device run per chain."""
    from causalgpslc_tpu.parallel.mesh import chain_mesh

    spec, pp, data, hp = setup(n_chains=8)
    key = jax.random.PRNGKey(13)

    full, _, _ = run_mcmc_checkpointed(
        key, spec, pp, data, hp, None, checkpoint_every=3, mesh=chain_mesh(8)
    )
    part = str(tmp_path / "p.npz")
    with pytest.raises(_Interrupt):
        run_mcmc_checkpointed(
            key, spec, pp, data, hp, part, checkpoint_every=3, mesh=chain_mesh(8),
            progress_callback=_crash_after(3),
        )
    resumed, stats, _ = run_mcmc_checkpointed(
        key, spec, pp, data, hp, part, checkpoint_every=3, mesh=chain_mesh(4)
    )
    for f in full._fields:
        a = getattr(full, f)
        if a is None:
            continue
        np.testing.assert_allclose(
            np.asarray(getattr(resumed, f)), np.asarray(a),
            rtol=1e-12, atol=1e-13, err_msg=f,
        )
    assert stats.mh_accept_rate.shape == (hp.n_chains, hp.n_outer)


def test_elastic_loader_assembles_rank_files(tmp_path):
    """load_chain_state_elastic reassembles the global state from per-rank
    files (each holding its chain rows) and prefers the newest outer_done
    whose files jointly cover every chain — stale files from an older
    process layout are ignored."""
    import jax.numpy as jnp

    from causalgpslc_tpu.models.spec import GPSLCParams
    from causalgpslc_tpu.parallel.checkpoint import load_chain_state_elastic

    n_chains = 4
    mk = lambda base: GPSLCParams(
        ty_ls=jnp.arange(base, base + n_chains, dtype=jnp.float64),
        y_noise=jnp.full((n_chains,), 0.5),
    )
    full = mk(10.0)
    base = str(tmp_path / "s.npz")
    key = np.zeros(2, dtype=np.uint32)

    # stale bare file from a Q=1 layout at outer_done=3
    save_chain_state(base, mk(99.0), key, 3, chain_rows=slice(0, n_chains), n_chains=n_chains)
    # current 2-rank layout at outer_done=6 (rows [0,1] and [2,3])
    for rank, rows in ((0, [0, 1]), (1, [2, 3])):
        part = jax.tree.map(lambda a: np.asarray(a)[rows], full)
        save_chain_state(
            f"{base}.rank{rank}", part, key, 6, chain_rows=np.asarray(rows),
            n_chains=n_chains,
        )

    params, _key, outer_done, samples, drifts, stats = load_chain_state_elastic(
        base, n_chains
    )
    assert outer_done == 6
    np.testing.assert_array_equal(np.asarray(params.ty_ls), np.asarray(full.ty_ls))
    assert samples is None and drifts is None and stats is None

    # incomplete coverage at the newest outer_done falls through to the
    # older complete layout rather than mixing epochs
    import os

    os.remove(f"{base}.rank1")
    params2, _k, od2, *_ = load_chain_state_elastic(base, n_chains)
    assert od2 == 3
    np.testing.assert_array_equal(np.asarray(params2.ty_ls), np.arange(99.0, 103.0))
