"""Data ingest: CSV/DataFrame -> (SigmaU, obj, X, T, Y).

Parity target: ``prepareData`` (``/root/reference/src/data.jl:20-69``) with
identical column conventions: ``T`` (bool or float), ``Y`` (float), optional
``obj`` object labels (rows grouped into shared-confounder blocks), and every
remaining column treated as a covariate.

Ingest runs host-side (pandas/numpy); arrays move to device once at model
build time. When the optional C++ fast loader (``causalgpslc_tpu.native``) is
built, large CSVs are parsed natively.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Union

import numpy as np
import pandas as pd

from .utils.structure import generate_sigma_u, object_counts

__all__ = ["PreparedData", "prepare_data", "load_data"]


@dataclasses.dataclass(frozen=True)
class PreparedData:
    """Host-side dataset: the tuple ``prepareData`` returns (``src/data.jl:69``)."""

    sigma_u: Optional[np.ndarray]  # (n, n) block structure, or None (no obj column)
    obj: Optional[np.ndarray]  # sorted object labels, or None
    x: Optional[np.ndarray]  # (n, nX) covariates, or None
    t: np.ndarray  # (n,) float64; binary data kept as {0., 1.}
    y: np.ndarray  # (n,)
    binary_t: bool

    @property
    def n(self) -> int:
        return self.t.shape[0]

    @property
    def n_x(self) -> Optional[int]:
        return None if self.x is None else self.x.shape[1]


def load_data(csv_path: str) -> pd.DataFrame:
    """CSV -> DataFrame (``loadData``, ``src/data.jl:7-9``)."""
    return pd.read_csv(csv_path)


def prepare_data(
    data: Union[pd.DataFrame, str],
    confounder_eps: float = 1.0e-13,
    confounder_cov: float = 1.0,
    *,
    binary_treatment: Optional[bool] = None,
    verbose: bool = False,
    engine: str = "auto",
    build_sigma_u: bool = True,
) -> PreparedData:
    """Sort by ``obj``, build SigmaU from group sizes, split T/Y/X columns.

    Mirrors ``prepareData`` (``src/data.jl:20-69``): object labels become a
    block-ones covariance via group counts; with no ``obj`` column the model
    falls back to the no-latent-confounder variants.

    ``engine``: "auto" uses the native C++ parser for CSV paths when built
    (falling back to pandas), "native" requires it, "pandas" skips it.
    ``build_sigma_u=False`` skips materializing the dense (n, n) SigmaU —
    required at large N (50k rows would be a 20 GB matrix); the large-N
    engine recovers the block structure from ``obj`` via ``object_counts``
    and uses the O(N) Sherman-Morrison forms instead.
    """
    if isinstance(data, str) and engine in ("auto", "native"):
        out = _prepare_native(
            data, confounder_eps, confounder_cov, binary_treatment, verbose, build_sigma_u
        )
        if out is not None:
            return out
        if engine == "native":
            raise RuntimeError("native CSV engine requested but unavailable")
    df = load_data(data) if isinstance(data, str) else data.copy()

    if "obj" in df.columns:
        df = df.sort_values("obj", kind="stable").reset_index(drop=True)
        counts = object_counts(df["obj"].tolist())
        sigma_u = (
            generate_sigma_u(counts, confounder_eps, confounder_cov)
            if build_sigma_u
            else None
        )
        obj = df["obj"].to_numpy()
    else:
        if verbose:
            print("No object labels found (column `obj`); assuming no latent confounding")
        sigma_u = None
        obj = None

    t_col = df["T"]
    if binary_treatment is not None:
        binary_t = binary_treatment
    else:
        # Julia distinguishes Vector{Bool} from Vector{Float64} by type; in CSV
        # land a treatment is binary iff it parses as bool (true/false) or its
        # values are exactly {0, 1}.
        binary_t = bool(t_col.dtype == bool or set(np.unique(t_col.to_numpy()).tolist()) <= {0, 1})
    t = t_col.to_numpy().astype(np.float64)
    y = df["Y"].to_numpy().astype(np.float64)

    x_cols = [c for c in df.columns if c not in ("T", "Y", "obj")]
    if x_cols:
        x = df[x_cols].to_numpy().astype(np.float64)
    else:
        if verbose:
            print("No observed covariates found in data")
        x = None

    return PreparedData(sigma_u=sigma_u, obj=obj, x=x, t=t, y=y, binary_t=binary_t)


def _prepare_native(
    path: str,
    confounder_eps: float,
    confounder_cov: float,
    binary_treatment: Optional[bool],
    verbose: bool,
    build_sigma_u: bool = True,
) -> Optional[PreparedData]:
    """CSV -> PreparedData through the C++ fast parser (pandas-free path)."""
    from . import native

    nc = native.read_csv(path)
    if nc is None:
        return None

    if "obj" in nc.columns:
        labels = nc.decode("obj") if "obj" in nc.categorical else nc.column("obj")
        order = np.argsort(labels, kind="stable")
        labels = labels[order]
        counts = object_counts(labels.tolist())
        if build_sigma_u:
            sigma_u = native.sigma_u_native(counts, confounder_eps, confounder_cov)
            if sigma_u is None:
                sigma_u = generate_sigma_u(counts, confounder_eps, confounder_cov)
        else:
            sigma_u = None
        obj = labels
    else:
        if verbose:
            print("No object labels found (column `obj`); assuming no latent confounding")
        order = np.arange(nc.data.shape[0])
        sigma_u = None
        obj = None

    t = nc.column("T")[order]
    y = nc.column("Y")[order]
    if binary_treatment is not None:
        binary_t = binary_treatment
    else:
        binary_t = "T" in nc.boolean or set(np.unique(t).tolist()) <= {0.0, 1.0}

    x_cols = [c for c in nc.columns if c not in ("T", "Y", "obj")]
    x = np.stack([nc.column(c)[order] for c in x_cols], axis=1) if x_cols else None
    if x is None and verbose:
        print("No observed covariates found in data")
    return PreparedData(sigma_u=sigma_u, obj=obj, x=x, t=t, y=y, binary_t=binary_t)
