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

__all__ = ["save_chain_state", "load_chain_state", "run_mcmc_checkpointed"]


def _params_to_arrays(params: GPSLCParams) -> dict:
    return {
        f: np.asarray(getattr(params, f))
        for f in params._fields
        if getattr(params, f) is not None
    }


def _params_from_arrays(arrays: dict) -> GPSLCParams:
    return GPSLCParams(**{f: arrays[f] for f in arrays})


def save_chain_state(
    path: str, params: GPSLCParams, key, outer_done: int, samples=None, drifts=None
):
    """Atomically write chain state (+ optionally retained samples so far).

    ``drifts`` are the current adaptive proposal variances — part of the
    Markov-chain state whenever ``adapt_proposals=True``, so they must
    survive a resume (resetting them mid-burn-in would silently restart
    adaptation from the prior drift)."""
    path = pathlib.Path(path)
    payload = {f"params/{k}": v for k, v in _params_to_arrays(params).items()}
    payload["key"] = np.asarray(key)
    if samples is not None:
        payload.update({f"samples/{k}": v for k, v in _params_to_arrays(samples).items()})
    if drifts is not None:
        payload["drifts"] = np.asarray(drifts)
    payload["meta"] = np.frombuffer(
        json.dumps({"outer_done": int(outer_done)}).encode(), dtype=np.uint8
    )
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)
    return str(path)


def load_chain_state(path: str):
    """Returns (params, key, outer_done, samples-or-None, drifts-or-None)."""
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
        return params, z["key"], meta["outer_done"], samples, drifts


def _concat_samples(a: Optional[GPSLCParams], b: GPSLCParams) -> GPSLCParams:
    if a is None:
        return b
    return jax.tree.map(lambda x, y: np.concatenate([np.asarray(x), np.asarray(y)], axis=1), a, b)


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
    so diagnostics survive the chunked path too).
    """
    from functools import partial

    outer_step = make_outer_step(spec, priors, hp)
    dtype = data.y.dtype

    priors_items = tuple(sorted((k, float(v)) for k, v in priors.items()))

    @partial(jax.jit, static_argnames=("n_steps",))
    def run_chunk(params, chunk_key, drifts, n_steps):
        def body(p, k):
            p, stats = outer_step(p, data, k, drifts if hp.adapt_proposals else None)
            return p, (p, stats)

        # scan_unroll > 1 executes that many outer iterations per XLA While
        # iteration (identical samples): on the axon backend each While
        # iteration pays a fixed dispatch quantum, so unrolling trades
        # compile time for fewer quanta per chunk.
        return jax.lax.scan(
            body, params, jax.random.split(chunk_key, n_steps), unroll=scan_unroll
        )

    run_chunk_chains = jax.jit(
        jax.vmap(run_chunk, in_axes=(0, 0, None, None)), static_argnames=("n_steps",)
    )

    from ..inference.mh import block_sites, sweep_moves as _sweep_moves

    n_moves = (
        len(block_sites(spec)) if hp.mh_block_sweep else len(_sweep_moves(spec))
    )
    drifts = jax.numpy.full((n_moves,), priors["drift"], dtype=dtype)

    if checkpoint_path is not None and os.path.exists(checkpoint_path):
        params, key_arr, outer_done, samples, saved_drifts = load_chain_state(checkpoint_path)
        params = jax.tree.map(lambda a: jax.numpy.asarray(a, dtype=dtype), params)
        key = jax.numpy.asarray(key_arr)
        if saved_drifts is not None:
            drifts = jax.numpy.asarray(saved_drifts, dtype=dtype)
    else:
        chain_keys = jax.random.split(jax.random.fold_in(key, 0), hp.n_chains)
        params = jax.vmap(lambda k: init_from_prior(k, spec, priors, data, dtype=dtype))(
            chain_keys
        )
        outer_done, samples = 0, None

    stats = None
    while outer_done < hp.n_outer:
        n_steps = min(checkpoint_every, hp.n_outer - outer_done)
        key, sub = jax.random.split(key)
        chunk_keys = jax.random.split(sub, hp.n_chains)
        params, (chunk_samples, chunk_stats) = run_chunk_chains(
            params, chunk_keys, drifts, n_steps
        )
        samples = _concat_samples(samples, jax.tree.map(np.asarray, chunk_samples))
        stats = _concat_samples(stats, jax.tree.map(np.asarray, chunk_stats))
        outer_done += n_steps
        if hp.adapt_proposals and outer_done < hp.n_burn_in:
            # POOLED step-size adaptation: mean acceptance across every chain
            # (an all-reduce over the chain axis when sharded — the
            # "cross-host psum for step-size adaptation" of the north star),
            # Robbins-Monro on log-variance, frozen after burn-in.
            pooled = jax.numpy.mean(chunk_stats.move_accepts, axis=(0, 1))  # (n_moves,)
            gamma = 0.5 / (1.0 + outer_done) ** 0.6
            drifts = jax.numpy.clip(
                jax.numpy.exp(
                    jax.numpy.log(drifts) + gamma * (pooled - hp.target_accept)
                ),
                1e-4,
                1e3,
            )
        if checkpoint_path is not None:
            save_chain_state(checkpoint_path, params, key, outer_done, samples, drifts)
        if progress_callback is not None:
            progress_callback(outer_done, hp.n_outer)

    return samples, stats, params
