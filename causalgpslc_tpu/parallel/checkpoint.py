"""Mid-run MCMC checkpointing and resumption.

The reference can only checkpoint *after* inference (whole-object
serialization, ``/root/reference/src/io.jl``) because its GPSLCObject
constructor runs inference as a side effect — a crash loses the entire run
(SURVEY.md §5). Here the outer Gibbs loop executes in chunks of jitted scans
with the full chain-state pytree (params of every chain + PRNG key + retained
samples so far) snapshotted between chunks, so long multi-host runs resume
mid-MCMC bit-exactly.

Format: a single ``.npz`` of the flattened pytree (None-valued sites are
recorded in metadata), no external checkpoint dependency.
"""

from __future__ import annotations

import json
import os
import pathlib
from typing import Optional

import jax
import numpy as np

from ..hyperparameters import HyperParameters
from ..inference.gibbs import make_outer_step
from ..models.spec import GPSLCParams, ModelData, ModelSpec
from ..models.state import init_from_prior

__all__ = [
    "save_chain_state",
    "load_chain_state",
    "load_chain_state_elastic",
    "run_mcmc_checkpointed",
]


def _params_to_arrays(params: GPSLCParams) -> dict:
    return {
        f: np.asarray(getattr(params, f))
        for f in params._fields
        if getattr(params, f) is not None
    }


def _params_from_arrays(arrays: dict) -> GPSLCParams:
    return GPSLCParams(**{f: arrays[f] for f in arrays})


def save_chain_state(
    path: str, params: GPSLCParams, key, outer_done: int, samples=None, drifts=None,
    stats=None, chain_rows=None, n_chains: Optional[int] = None,
):
    """Atomically write chain state (+ optionally retained samples so far).

    ``chain_rows``/``n_chains`` record WHICH global chain rows this file
    holds (elastic-resume layout metadata): a multi-process run saves one
    file per rank, each covering its slice of the global chain axis, and
    :func:`load_chain_state_elastic` reassembles the global state from any
    covering set of files — so a run checkpointed on P processes can resume
    on Q (including Q=1). ``chain_rows`` accepts a ``slice`` or an index
    array; omitted => no layout metadata (single-chain large-N snapshots).

    ``drifts`` are the current adaptive proposal variances — part of the
    Markov-chain state whenever ``adapt_proposals=True``, so they must
    survive a resume (resetting them mid-burn-in would silently restart
    adaptation from the prior drift).

    ``stats`` is the per-outer-iteration diagnostics pytree accumulated so
    far (:class:`~causalgpslc_tpu.inference.gibbs.StepStats` or the large-N
    equivalent). Persisting it keeps stats aligned with ``samples`` across a
    crash-resume — without it a resumed run's stats would cover only
    post-resume chunks while samples cover the full horizon."""
    path = pathlib.Path(path)
    payload = {f"params/{k}": v for k, v in _params_to_arrays(params).items()}
    payload["key"] = np.asarray(key)
    if samples is not None:
        payload.update({f"samples/{k}": v for k, v in _params_to_arrays(samples).items()})
    if drifts is not None:
        payload["drifts"] = np.asarray(drifts)
    if stats is not None:
        payload.update(
            {
                f"stats/{f}": np.asarray(getattr(stats, f))
                for f in stats._fields
                if getattr(stats, f) is not None
            }
        )
    meta = {"outer_done": int(outer_done)}
    if chain_rows is not None:
        if isinstance(chain_rows, slice):
            rows = list(range(chain_rows.start or 0, chain_rows.stop))
        else:
            rows = [int(r) for r in np.asarray(chain_rows).reshape(-1)]
        meta["chain_rows"] = rows
    if n_chains is not None:
        meta["n_chains"] = int(n_chains)
    payload["meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)
    return str(path)


def _load_with_meta(path: str):
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"]).decode())
        params = _params_from_arrays(
            {k.split("/", 1)[1]: z[k] for k in z.files if k.startswith("params/")}
        )
        sample_keys = [k for k in z.files if k.startswith("samples/")]
        samples = (
            _params_from_arrays({k.split("/", 1)[1]: z[k] for k in sample_keys})
            if sample_keys
            else None
        )
        drifts = z["drifts"] if "drifts" in z.files else None
        stats_keys = [k for k in z.files if k.startswith("stats/")]
        stats = (
            {k.split("/", 1)[1]: z[k] for k in stats_keys} if stats_keys else None
        )
        return (params, z["key"], meta["outer_done"], samples, drifts, stats), meta


def load_chain_state(path: str):
    """Returns ``(params, key, outer_done, samples, drifts, stats)``.

    ``samples``/``drifts`` are ``None`` when absent; ``stats`` is a plain
    ``{field: array}`` dict (``None`` when absent) — callers rebuild their
    typed stats tuple (StepStats / LargeNStats) from it."""
    state, _ = _load_with_meta(path)
    return state


def load_chain_state_elastic(base_path: str, n_chains: int):
    """Assemble the GLOBAL chain state from any covering snapshot set.

    Candidates are ``base_path`` itself (single-process / Q=1 saves) and
    ``base_path.rank*`` (one file per process of a multi-process run, each
    holding the chain rows its ``meta['chain_rows']`` records). Among
    candidate files the largest ``outer_done`` whose files jointly cover all
    ``n_chains`` rows wins — stale files from a previous process layout (a
    P-process run later resumed on Q processes leaves both sets on disk) are
    ignored. Returns ``(params, key, outer_done, samples, drifts, stats)``
    with every chain-led leaf assembled in global row order, or ``None``
    when no snapshot exists. Requires the snapshot files to live on storage
    every process can read (shared filesystem), which is also what writing
    them assumed."""
    base = pathlib.Path(base_path)
    candidates = []
    if base.exists():
        candidates.append(base)
    candidates.extend(sorted(base.parent.glob(base.name + ".rank*")))
    loaded = []
    for p in candidates:
        state, meta = _load_with_meta(str(p))
        rows = meta.get("chain_rows")
        if rows is None:
            # legacy file without layout metadata: a bare file holds every
            # chain; a rank file's placement is unknowable => unusable
            if str(p) == str(base):
                rows = list(range(int(np.asarray(state[0].ty_ls).shape[0])))
            else:
                continue
        loaded.append((state, [int(r) for r in rows], int(state[2])))
    if not loaded:
        return None
    for od in sorted({od for _, _, od in loaded}, reverse=True):
        group = [(s, r) for s, r, o in loaded if o == od]
        covered = sorted(r for _, rows in group for r in rows)
        if covered != list(range(n_chains)):
            continue
        if len(group) == 1 and group[0][1] == list(range(n_chains)):
            return group[0][0]

        def _assemble(leaves):
            pieces = [(rows, leaf) for (st, rows), leaf in zip(group, leaves)]
            out = None
            for rows, leaf in pieces:
                if leaf is None:
                    return None
                a = np.asarray(leaf)
                if out is None:
                    out = np.empty((n_chains,) + a.shape[1:], dtype=a.dtype)
                out[np.asarray(rows)] = a
            return out

        def _assemble_tree(trees):
            if any(t is None for t in trees):
                return None
            return jax.tree.map(lambda *ls: _assemble(ls), *trees)

        params = _assemble_tree([s[0] for s, _ in group])
        samples = _assemble_tree([s[3] for s, _ in group])
        stats_dicts = [s[5] for s, _ in group]
        stats = (
            {
                k: _assemble([d[k] for d in stats_dicts])
                for k in stats_dicts[0]
            }
            if all(d is not None for d in stats_dicts)
            else None
        )
        key, drifts = group[0][0][1], group[0][0][4]
        return params, key, od, samples, drifts, stats
    raise ValueError(
        f"checkpoint files under {base_path} do not cover all {n_chains} "
        "chains at any single outer_done — cannot resume elastically"
    )


def _concat_samples(a: Optional[GPSLCParams], b: GPSLCParams) -> GPSLCParams:
    if a is None:
        return b
    return jax.tree.map(lambda x, y: np.concatenate([np.asarray(x), np.asarray(y)], axis=1), a, b)


def _to_host(leaf):
    """Fetch a (possibly sharded) array to host numpy.

    Single-process (including the 8-way virtual CPU mesh): plain
    ``np.asarray``. Multi-process: a globally-sharded array is not fully
    addressable, so assemble THIS process's chain rows from its addressable
    shards (sorted by their position on the chain axis) — each host keeps its
    own slice of the chain axis, the layout ``process_local_chain_slice``
    describes."""
    if jax.process_count() == 1 or not hasattr(leaf, "addressable_shards"):
        return np.asarray(leaf)
    shards = sorted(
        leaf.addressable_shards,
        key=lambda s: (s.index[0].start or 0) if s.index else 0,
    )
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def run_mcmc_checkpointed(
    key: jax.Array,
    spec: ModelSpec,
    priors: dict,
    data: ModelData,
    hp: HyperParameters,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 8,
    progress_callback=None,
    scan_unroll: int = 1,
    mesh=None,
    proposal_params=None,
):
    """Chunked chain-batched MCMC with periodic state snapshots.

    If ``checkpoint_path`` exists, resumes from it (same spec/budgets assumed)
    and runs only the remaining outer iterations; ``None`` disables snapshots
    (chunked execution only — the host regains control between chunks, which
    is also the progress-reporting hook, the analog of the reference's tqdm
    bar at ``src/inference.jl:21``). ``progress_callback(outer_done, n_outer)``
    fires after every chunk. Returns ``(samples, stats, final_params)`` shaped
    like :func:`run_mcmc` (samples lead with ``(n_chains, n_outer)``; ``stats``
    is the full concatenated :class:`~causalgpslc_tpu.inference.gibbs.StepStats`,
    so diagnostics survive the chunked path too — including across a
    crash-resume, since snapshots persist the accumulated stats alongside the
    samples).

    ``mesh``: optional 1-D chain mesh (``parallel.mesh.chain_mesh`` or the
    multihost ``global_chain_mesh``). Chains shard over its ``"chains"`` axis
    (``hp.n_chains`` must be a multiple of the mesh size) and, with
    ``hp.adapt_proposals=True``, the per-chunk step-size adaptation pools the
    MOVE ACCEPTANCE ACROSS EVERY CHAIN ON EVERY DEVICE/HOST — the cross-host
    all-reduce of the north star (SURVEY.md §5) — so adapted drifts are
    identical on 1 and N devices by construction (the pooled mean is the same
    global mean regardless of layout). Under multi-process execution each
    host returns (and snapshots) its own chain rows.
    """
    from functools import partial

    outer_step = make_outer_step(spec, priors, hp)
    dtype = data.y.dtype

    if hp.flat_execution:
        from ..inference.flat import make_flat_chunk_fn

        flat_chunk = make_flat_chunk_fn(spec, priors, data, hp)

        @partial(jax.jit, static_argnames=("n_steps",))
        def run_chunk(params, chunk_key, drifts, n_steps):
            # flattened schedule: same per-outer step keys as the rolled scan
            # below, so the chain is bit-identical (inference/flat.py)
            final, samples, stats = flat_chunk(
                params, jax.random.split(chunk_key, n_steps), drifts
            )
            return final, (samples, stats)
    else:
        @partial(jax.jit, static_argnames=("n_steps",))
        def run_chunk(params, chunk_key, drifts, n_steps):
            def body(p, k):
                p, stats = outer_step(
                    p, data, k,
                    drifts if (hp.adapt_proposals or hp.dynamic_proposals) else None,
                )
                return p, (p, stats)

            # scan_unroll > 1 executes that many outer iterations per XLA While
            # iteration (identical samples): on the axon backend each While
            # iteration pays a fixed dispatch quantum, so unrolling trades
            # compile time for fewer quanta per chunk.
            return jax.lax.scan(
                body, params, jax.random.split(chunk_key, n_steps), unroll=scan_unroll
            )

    if mesh is None:
        run_chunk_chains = jax.jit(
            jax.vmap(run_chunk, in_axes=(0, 0, None, None)), static_argnames=("n_steps",)
        )
        chain_sharding = replicated = None
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .mesh import CHAIN_AXIS

        n_dev = mesh.devices.size
        if hp.n_chains % n_dev != 0:
            raise ValueError(
                f"n_chains={hp.n_chains} must be a multiple of mesh size {n_dev}"
            )
        chain_sharding = NamedSharding(mesh, P(CHAIN_AXIS))
        replicated = NamedSharding(mesh, P())
        run_chunk_chains = jax.jit(
            jax.vmap(run_chunk, in_axes=(0, 0, None, None)),
            static_argnames=("n_steps",),
            out_shardings=chain_sharding,
        )

    from ..inference.mh import block_sites, sweep_moves as _sweep_moves

    n_moves = (
        len(block_sites(spec)) if hp.mh_block_sweep else len(_sweep_moves(spec))
    )
    if hp.dynamic_proposals:
        if checkpoint_path is not None:
            raise ValueError(
                "dynamic_proposals does not support snapshots yet (the drifts "
                "slot holds a ProposalParams pytree, not a flat array); run "
                "with checkpoint_path=None"
            )
        # runtime per-move proposal arrays ride the drifts slot: one compiled
        # chunk program serves every per-site tuning (inference/mh.py
        # ProposalParams; the round-5 on-chip kernel search)
        from ..inference.mh import proposal_params_for

        drifts = (
            proposal_params
            if proposal_params is not None
            else proposal_params_for(spec, priors, hp)
        )
        drifts = jax.tree.map(lambda a: jax.numpy.asarray(a, dtype=dtype), drifts)
    else:
        if proposal_params is not None:
            raise ValueError("proposal_params requires hp.dynamic_proposals=True")
        drifts = jax.numpy.full((n_moves,), priors["drift"], dtype=dtype)

    base_checkpoint_path = checkpoint_path
    if checkpoint_path is not None and jax.process_count() > 1:
        # each host snapshots its own chain rows; the layout metadata each
        # file carries lets load_chain_state_elastic reassemble the global
        # state, so resume works on a DIFFERENT process/device layout too
        checkpoint_path = f"{checkpoint_path}.rank{jax.process_index()}"

    if jax.process_count() > 1:
        from .multihost import process_local_chain_slice

        local_rows = process_local_chain_slice(hp.n_chains, mesh)
    else:
        local_rows = slice(0, hp.n_chains)

    stats = None
    resume_state = (
        load_chain_state_elastic(base_checkpoint_path, hp.n_chains)
        if base_checkpoint_path is not None
        else None
    )
    if resume_state is not None:
        # global state reassembled from whatever snapshot layout exists;
        # this process keeps only its CURRENT rows (elastic resume)
        params_g, key_arr, outer_done, samples_g, saved_drifts, saved_stats = resume_state
        params = jax.tree.map(
            lambda a: jax.numpy.asarray(np.asarray(a)[local_rows], dtype=dtype), params_g
        )
        samples = (
            None
            if samples_g is None
            else jax.tree.map(lambda a: np.asarray(a)[local_rows], samples_g)
        )
        key = jax.numpy.asarray(key_arr)
        if saved_drifts is not None:
            drifts = jax.numpy.asarray(saved_drifts, dtype=dtype)
        if saved_stats is not None:
            from ..inference.gibbs import StepStats

            stats = StepStats(
                **{
                    f: (
                        None
                        if saved_stats.get(f) is None
                        else np.asarray(saved_stats[f])[local_rows]
                    )
                    for f in StepStats._fields
                }
            )
    else:
        chain_keys = jax.random.split(jax.random.fold_in(key, 0), hp.n_chains)
        params = jax.vmap(lambda k: init_from_prior(k, spec, priors, data, dtype=dtype))(
            chain_keys
        )
        outer_done, samples = 0, None

    if mesh is not None:
        if jax.process_count() > 1 and outer_done > 0:
            # resumed params are this process's local chain rows; reassemble
            # the global sharded array from the per-process pieces
            params = jax.tree.map(
                lambda a: jax.make_array_from_process_local_data(
                    chain_sharding, np.asarray(a)
                ),
                params,
            )
        else:
            params = jax.device_put(params, chain_sharding)
        drifts = jax.device_put(drifts, replicated)

    while outer_done < hp.n_outer:
        n_steps = min(checkpoint_every, hp.n_outer - outer_done)
        key, sub = jax.random.split(key)
        chunk_keys = jax.random.split(sub, hp.n_chains)
        if mesh is not None:
            chunk_keys = jax.device_put(chunk_keys, chain_sharding)
        params, (chunk_samples, chunk_stats) = run_chunk_chains(
            params, chunk_keys, drifts, n_steps
        )
        if hp.adapt_proposals and outer_done + n_steps < hp.n_burn_in:
            # POOLED step-size adaptation: mean acceptance across every chain
            # — under a sharded stats pytree this jitted global mean lowers
            # to an all-reduce over the chain axis (cross-host when the mesh
            # spans hosts: the "psum for step-size adaptation" of the north
            # star), so the adapted drifts are bit-identical on every process
            # and at every mesh size. Robbins-Monro on log-variance, frozen
            # after burn-in.
            pooled = jax.jit(
                lambda s: jax.numpy.mean(s, axis=(0, 1)),
                **({"out_shardings": replicated} if mesh is not None else {}),
            )(chunk_stats.move_accepts)
            gamma = 0.5 / (1.0 + (outer_done + n_steps)) ** 0.6
            drifts = jax.numpy.clip(
                jax.numpy.exp(
                    jax.numpy.log(drifts) + gamma * (pooled - hp.target_accept)
                ),
                1e-4,
                1e3,
            )
            if mesh is not None:
                drifts = jax.device_put(drifts, replicated)
        samples = _concat_samples(samples, jax.tree.map(_to_host, chunk_samples))
        stats = _concat_samples(stats, jax.tree.map(_to_host, chunk_stats))
        outer_done += n_steps
        if checkpoint_path is not None:
            save_chain_state(
                checkpoint_path, jax.tree.map(_to_host, params), key, outer_done,
                samples, drifts, stats,
                chain_rows=local_rows, n_chains=hp.n_chains,
            )
        if progress_callback is not None:
            progress_callback(outer_done, hp.n_outer)

    return samples, stats, params
