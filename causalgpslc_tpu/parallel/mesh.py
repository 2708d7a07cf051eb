"""Device meshes and chain-parallel MCMC execution.

The reference has no parallelism of any kind (SURVEY.md §2c): one chain, one
thread, BLAS-internal threading at most. Chain data-parallelism is this
framework's primary scaling axis: chains batch on-chip via ``vmap`` (batched
(C, n, n) Choleskys on the MXU) and shard across chips/hosts via a 1-D
``jax.sharding.Mesh`` over a ``"chains"`` axis. Data (X, T, Y, SigmaU) is
replicated; chain state and PRNG keys are sharded; XLA inserts the ICI/DCN
collectives for pooled cross-chain statistics (acceptance rates, ESS
iteration counts) — the ``psum`` analog of the reference's serial
``push!(posteriorSamples, ...)`` accumulation (``src/inference.jl:56``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..hyperparameters import HyperParameters
from ..inference.gibbs import make_chain_runner
from ..models.spec import ModelData, ModelSpec

__all__ = ["chain_mesh", "run_mcmc_sharded", "pooled_chain_stats"]

CHAIN_AXIS = "chains"


def chain_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over all (or the first ``n_devices``) local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (CHAIN_AXIS,))


def run_mcmc_sharded(
    key: jax.Array,
    spec: ModelSpec,
    priors: dict,
    data: ModelData,
    hp: HyperParameters,
    mesh: Optional[Mesh] = None,
):
    """Chain-sharded MCMC: ``hp.n_chains`` chains over ``mesh``'s chain axis.

    ``n_chains`` must be a multiple of the mesh size (chains are cheap —
    round up). Returns the same ``(samples, stats, final)`` as
    :func:`~causalgpslc_tpu.inference.gibbs.run_mcmc` — per-chain results
    match the unsharded run to ULP level (same chain keys and per-chain
    program via the shared ``make_chain_runner``; XLA may fuse the
    chain-batched and per-device layouts differently), with sample leaves
    sharded chain-major across devices.
    """
    mesh = mesh if mesh is not None else chain_mesh()
    n_dev = mesh.devices.size
    if hp.n_chains % n_dev != 0:
        raise ValueError(
            f"n_chains={hp.n_chains} must be a multiple of mesh size {n_dev}"
        )

    chain_sharding = NamedSharding(mesh, P(CHAIN_AXIS))
    replicated = NamedSharding(mesh, P())

    priors_static = tuple(sorted((k, float(v)) for k, v in priors.items()))

    @partial(
        jax.jit,
        static_argnames=("spec", "priors_items", "hp"),
        out_shardings=chain_sharding,
    )
    def _run(chain_keys, spec, priors_items, data, hp):
        one_chain = make_chain_runner(spec, dict(priors_items), data, hp)
        return jax.vmap(one_chain)(chain_keys)

    chain_keys = jax.device_put(jax.random.split(key, hp.n_chains), chain_sharding)
    data = jax.device_put(data, replicated)
    return _run(chain_keys, spec, priors_static, data, hp)


def pooled_chain_stats(stats) -> dict:
    """Cross-chain pooled diagnostics (the multi-chip psum ride-along).

    Under a sharded ``stats`` pytree these means lower to ICI all-reduces.
    """
    return {
        "mean_mh_accept_rate": jax.numpy.mean(stats.mh_accept_rate),
        "mean_ess_iters": jax.numpy.mean(
            jax.numpy.asarray(stats.ess_iters, dtype=jax.numpy.float32)
        ),
        "final_log_joint_mean": jax.numpy.mean(stats.log_joint_blocks[..., -1]),
    }
