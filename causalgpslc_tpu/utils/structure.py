"""Latent-confounder structure utilities.

Parity targets: ``generateSigmaU`` (``/root/reference/src/utils.jl:17-33``)
and ``removeAdjacent`` (``src/utils.jl:39-52``). Built host-side in numpy —
SigmaU is static per dataset and is transferred to device once.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

__all__ = ["generate_sigma_u", "object_counts", "remove_adjacent"]


def generate_sigma_u(
    n_individuals: Sequence[int],
    eps: float = 1e-13,
    cov: float = 1.0,
) -> np.ndarray:
    """Block covariance over latent confounders U.

    Individuals within the same object share a block of ``cov``; the diagonal
    is ``1 + eps``. Matches ``generateSigmaU`` (``src/utils.jl:17-33``).
    """
    counts = np.asarray(list(n_individuals), dtype=np.int64)
    n = int(counts.sum())
    sigma_u = np.eye(n, dtype=np.float64)
    i = 0
    for c in counts:
        sigma_u[i : i + c, i : i + c] = cov
        i += c
    np.fill_diagonal(sigma_u, 1.0 + eps)
    return sigma_u


def remove_adjacent(values: Sequence) -> list:
    """Drop consecutive duplicates, keeping first occurrences (``src/utils.jl:39-52``)."""
    out: list = []
    for v in values:
        if not out or v != out[-1]:
            out.append(v)
    return out


def object_counts(labels: Sequence) -> list[int]:
    """Group sizes of a *sorted-by-object* label sequence.

    The reference's two-arg ``gpslc(obj, X, T, Y)`` passes raw labels where
    counts are expected (``src/driver.jl:39`` — a latent bug). Here labels are
    always reduced to counts first, per SURVEY.md §7 item 6.
    """
    counts: list[int] = []
    prev = object()
    for v in labels:
        if counts and v == prev:
            counts[-1] += 1
        else:
            counts.append(1)
        prev = v
    return counts
