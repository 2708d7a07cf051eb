"""Multi-host (multi-process) execution helpers.

The reference is strictly single-process (SURVEY.md §2c). Here multi-host
pods initialize through ``jax.distributed`` and chains shard over the global
device set: every process runs the same program; each host's
addressable shard of the chain axis lives on its own chips, and pooled
statistics ride the ICI/DCN collectives XLA inserts for cross-shard
reductions.

Also usable for CPU-only multi-process testing (each process pinned to
virtual CPU devices), which is how ``tests/test_multihost.py`` exercises the
path without a pod.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import CHAIN_AXIS

__all__ = ["initialize_multihost", "global_chain_mesh", "process_local_chain_slice"]


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the process group. On TPU pods all arguments auto-detect; for
    CPU/manual setups pass coordinator ``host:port``, world size and rank."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def global_chain_mesh() -> Mesh:
    """1-D chain mesh over every device in the job (all hosts)."""
    return Mesh(np.asarray(jax.devices()), (CHAIN_AXIS,))


def process_local_chain_slice(n_chains: int, mesh: Optional[Mesh] = None):
    """This process's rows of the global chain axis (for host-local sample
    extraction after a sharded run).

    Derived from the mesh's actual device order and each device's
    ``process_index`` — NOT from device ids, which real pods do not guarantee
    to be contiguous per host. Returns a ``slice`` when the rows are
    contiguous (the common case) and an integer index array otherwise; both
    work as a numpy row indexer.
    """
    devices = (
        mesh.devices.reshape(-1) if mesh is not None else np.asarray(jax.devices())
    )
    n_dev = devices.size
    per_dev = n_chains // n_dev
    pid = jax.process_index()
    positions = [i for i, d in enumerate(devices) if d.process_index == pid]
    if not positions:
        return slice(0, 0)
    idx = np.concatenate(
        [np.arange(p * per_dev, (p + 1) * per_dev) for p in positions]
    )
    if np.array_equal(idx, np.arange(idx[0], idx[0] + idx.size)):
        return slice(int(idx[0]), int(idx[0] + idx.size))
    return idx
