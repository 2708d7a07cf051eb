"""Checkpoint I/O: save/load a whole GPSLCObject.

Parity target: ``saveGPSLCObject``/``loadGPSLCObject``
(``/root/reference/src/io.jl:14-34``) — whole-object serialization to a
``.gpslc`` file (extension auto-appended), carrying data, configuration and
all posterior samples so estimation resumes without re-running MCMC.

Format (round 4): a single ``.npz`` of host numpy arrays plus a JSON
metadata record — loading executes NO code, unlike pickle (or the
reference's Julia ``Serialization``, which has the same
arbitrary-code-on-load class of issue). Legacy pickle ``.gpslc`` files load
only with an explicit ``allow_pickle=True`` opt-in. Mid-run chain-state
checkpointing lives in ``causalgpslc_tpu.parallel.checkpoint`` (same npz
family).
"""

from __future__ import annotations

import dataclasses
import json
import zipfile

import jax
import numpy as np

from .api import GPSLCObject
from .data import PreparedData
from .hyperparameters import HyperParameters
from .inference.gibbs import StepStats
from .models.spec import GPSLCParams, ModelData, ModelSpec

__all__ = ["save_gpslc_object", "load_gpslc_object"]

_EXT = ".gpslc"
_FORMAT = 1


def _normalize(filename: str) -> str:
    if filename.endswith(_EXT):
        return filename
    return filename + _EXT


def _put(payload: dict, prefix: str, tree) -> None:
    """Flatten a NamedTuple/None-leaf pytree of arrays into payload."""
    if tree is None:
        return
    for f in tree._fields:
        v = getattr(tree, f)
        if v is not None:
            payload[f"{prefix}/{f}"] = np.asarray(v)


def _get(z, prefix: str, cls, fields=None):
    keys = [k for k in z.files if k.startswith(prefix + "/")]
    if not keys:
        return None
    vals = {k.split("/", 1)[1]: z[k] for k in keys}
    if fields is not None:
        return cls(**{f: vals.get(f) for f in fields})
    return cls(**vals)


def save_gpslc_object(g: GPSLCObject, filename: str) -> str:
    """Serialize ``g`` (posterior samples included) to ``<filename>.gpslc``."""
    path = _normalize(filename)
    meta = {
        "format": _FORMAT,
        "hyperparams": dataclasses.asdict(g.hyperparams),
        "priorparams": {k: float(v) for k, v in g.priorparams.items()},
        "spec": dataclasses.asdict(g.spec),
        "prepared_binary_t": bool(g.prepared.binary_t),
        "stats_class": type(g.stats).__name__ if g.stats is not None else None,
    }
    payload: dict = {}
    for name in ("sigma_u", "obj", "x", "t", "y"):
        v = getattr(g.prepared, name)
        if v is not None:
            arr = np.asarray(v)
            if arr.dtype == object:  # pandas string labels -> unicode dtype
                arr = arr.astype(str)
            payload[f"prepared/{name}"] = arr
    _put(payload, "data", g.data)
    _put(payload, "samples", g.posterior_samples)
    if g.stats is not None and hasattr(g.stats, "_fields"):
        _put(payload, "stats", g.stats)
    payload["meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    with open(path, "wb") as f:
        np.savez(f, **payload)
    return path


def load_gpslc_object(filename: str, allow_pickle: bool = False) -> GPSLCObject:
    """Load a ``.gpslc`` file.

    ``allow_pickle=True`` additionally accepts the legacy (pre-round-4)
    pickle format — only use it on files you created yourself: unpickling
    executes arbitrary code embedded in the file.
    """
    path = _normalize(filename)
    if not zipfile.is_zipfile(path):
        if not allow_pickle:
            raise ValueError(
                f"{path} is not an npz-format .gpslc file. If this is a "
                "legacy pickle checkpoint YOU created, reload with "
                "load_gpslc_object(..., allow_pickle=True) and re-save."
            )
        import pickle

        with open(path, "rb") as f:
            return pickle.load(f)

    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(bytes(z["meta"]).decode())
        hp = HyperParameters(**meta["hyperparams"])
        spec = ModelSpec(**meta["spec"])
        prepared_arrays = {
            k.split("/", 1)[1]: z[k] for k in z.files if k.startswith("prepared/")
        }
        prepared = PreparedData(
            sigma_u=prepared_arrays.get("sigma_u"),
            obj=prepared_arrays.get("obj"),
            x=prepared_arrays.get("x"),
            t=prepared_arrays["t"],
            y=prepared_arrays["y"],
            binary_t=meta["prepared_binary_t"],
        )
        data = _get(z, "data", ModelData, ModelData._fields)
        samples = _get(z, "samples", GPSLCParams, GPSLCParams._fields)
        stats = None
        stats_class = meta.get("stats_class")
        if stats_class == "StepStats":
            stats = _get(z, "stats", StepStats, StepStats._fields)
        elif stats_class == "LargeNStats":
            from .parallel.large_n import LargeNStats

            stats = _get(z, "stats", LargeNStats, LargeNStats._fields)
        elif stats_class is not None:
            import warnings

            warnings.warn(
                f"unknown stats class {stats_class!r} in {path}; stats "
                "restored as None",
                stacklevel=2,
            )
        return GPSLCObject(
            hyperparams=hp,
            priorparams=meta["priorparams"],
            prepared=prepared,
            spec=spec,
            data=data,
            posterior_samples=samples,
            stats=stats,
        )
