"""Native (C++) runtime components, loaded via ctypes.

``fastcsv``: one-pass mmap CSV parser + SigmaU block-matrix builder, the
native replacement for the reference's CSV.jl/DataFrames ingest
(``/root/reference/src/data.jl``). Compiled lazily with g++ on first use and
cached next to the source; every entry point has a pure-Python fallback, so
the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = pathlib.Path(__file__).parent
_SO = _DIR / "libfastcsv.so"
_SRC = _DIR / "fastcsv.cpp"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(_SRC), "-o", str(_SO)],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except Exception:
        _build_failed = True
        return None
    return _load_so()


def _load_so() -> ctypes.CDLL:
    lib = ctypes.CDLL(str(_SO))
    lib.fastcsv_parse.restype = ctypes.c_void_p
    lib.fastcsv_parse.argtypes = [ctypes.c_char_p]
    lib.fastcsv_error.restype = ctypes.c_char_p
    lib.fastcsv_error.argtypes = [ctypes.c_void_p]
    lib.fastcsv_rows.restype = ctypes.c_int64
    lib.fastcsv_rows.argtypes = [ctypes.c_void_p]
    lib.fastcsv_cols.restype = ctypes.c_int64
    lib.fastcsv_cols.argtypes = [ctypes.c_void_p]
    lib.fastcsv_data.restype = ctypes.POINTER(ctypes.c_double)
    lib.fastcsv_data.argtypes = [ctypes.c_void_p]
    lib.fastcsv_header.restype = ctypes.c_char_p
    lib.fastcsv_header.argtypes = [ctypes.c_void_p]
    lib.fastcsv_labels.restype = ctypes.c_char_p
    lib.fastcsv_labels.argtypes = [ctypes.c_void_p]
    lib.fastcsv_flags.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.fastcsv_flags.argtypes = [ctypes.c_void_p]
    lib.fastcsv_free.argtypes = [ctypes.c_void_p]
    lib.fastcsv_sigma_u.argtypes = [
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_double,
        ctypes.c_double,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
    ]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    """The compiled library, building it on first call; None if unavailable."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if _SO.exists() and _SO.stat().st_mtime >= _SRC.stat().st_mtime:
            _lib = _load_so()
        else:
            _lib = _build()
        return _lib


class NativeCsv:
    """Parsed CSV: column-major floats + factorized categorical columns."""

    def __init__(self, columns, data, categorical, boolean, labels):
        self.columns: list[str] = columns
        self.data: np.ndarray = data  # (n_rows, n_cols) float64
        self.categorical: set[str] = categorical
        self.boolean: set[str] = boolean
        self.labels: dict[str, list[str]] = labels  # col -> code->label

    def column(self, name: str) -> np.ndarray:
        return self.data[:, self.columns.index(name)]

    def decode(self, name: str) -> np.ndarray:
        """Categorical codes back to their original string labels."""
        codes = self.column(name).astype(np.int64)
        table = np.asarray(self.labels[name], dtype=object)
        return table[codes]


def read_csv(path: str) -> Optional[NativeCsv]:
    """Parse with the native library; None if it isn't available."""
    lib = get_lib()
    if lib is None:
        return None
    h = lib.fastcsv_parse(str(path).encode())
    try:
        err = lib.fastcsv_error(h)
        if err:
            raise ValueError(f"fastcsv: {err.decode()} ({path})")
        n, c = lib.fastcsv_rows(h), lib.fastcsv_cols(h)
        cols = lib.fastcsv_header(h).decode().split("\n")[:-1]
        flat = np.ctypeslib.as_array(lib.fastcsv_data(h), shape=(c, n)).copy()
        flags = np.ctypeslib.as_array(lib.fastcsv_flags(h), shape=(c,)).copy()
        labels: dict[str, list[str]] = {}
        raw = lib.fastcsv_labels(h).decode()
        for line in raw.split("\n"):
            if not line:
                continue
            parts = line.split("\x01")
            labels[parts[0]] = parts[1:]
        categorical = {cols[i] for i in range(c) if flags[i] & 1}
        boolean = {cols[i] for i in range(c) if flags[i] & 2}
        return NativeCsv(cols, flat.T, categorical, boolean, labels)
    finally:
        lib.fastcsv_free(h)


def sigma_u_native(counts, eps: float, cov: float) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    counts = np.asarray(list(counts), dtype=np.int64)
    n = int(counts.sum())
    out = np.empty((n, n), dtype=np.float64)
    lib.fastcsv_sigma_u(
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(counts),
        float(eps),
        float(cov),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n,
    )
    return out
