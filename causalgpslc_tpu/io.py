"""Checkpoint I/O: save/load a whole GPSLCObject.

Parity target: ``saveGPSLCObject``/``loadGPSLCObject``
(``/root/reference/src/io.jl:14-34``) — whole-object serialization to a
``.gpslc`` file (extension auto-appended), carrying data, configuration and
all posterior samples so estimation resumes without re-running MCMC.

Format: a single pickle of host-side numpy pytrees (device arrays are pulled
host-side on save and re-uploaded lazily on use — every op in the package
accepts numpy leaves). Mid-run chain-state checkpointing lives in
``causalgpslc_tpu.parallel.checkpoint``.
"""

from __future__ import annotations

import pickle

import jax
import numpy as np

from .api import GPSLCObject

__all__ = ["save_gpslc_object", "load_gpslc_object"]

_EXT = ".gpslc"


def _normalize(filename: str) -> str:
    if filename.endswith(_EXT):
        return filename
    return filename + _EXT


def _to_host(tree):
    return jax.tree.map(lambda a: np.asarray(a) if hasattr(a, "shape") else a, tree)


def save_gpslc_object(g: GPSLCObject, filename: str) -> str:
    """Serialize ``g`` (posterior samples included) to ``<filename>.gpslc``."""
    path = _normalize(filename)
    host = GPSLCObject(
        hyperparams=g.hyperparams,
        priorparams=g.priorparams,
        prepared=g.prepared,
        spec=g.spec,
        data=_to_host(g.data),
        posterior_samples=_to_host(g.posterior_samples),
        stats=_to_host(g.stats),
    )
    with open(path, "wb") as f:
        pickle.dump(host, f)
    return path


def load_gpslc_object(filename: str) -> GPSLCObject:
    with open(_normalize(filename), "rb") as f:
        return pickle.load(f)
