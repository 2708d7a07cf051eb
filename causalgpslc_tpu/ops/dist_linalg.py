"""Distributed (N-sharded) dense linear algebra for large-N GP densities.

The reference caps at N of a few hundred: every density evaluation is a
dense ``n x n`` Cholesky on one CPU (``Distributions.mvnormal`` →
LAPACK, e.g. ``/root/reference/src/likelihood.jl:42-49``), and its largest
shipped dataset is IHDP with n=272.  This module is the scaling axis the
reference does not have (SURVEY.md §5 "long-context" analog; BASELINE
config #4, N=5k-50k): the N x N covariance is **row-block sharded** over a
device mesh axis, and factorization/solve/log-density run as SPMD programs
under ``shard_map`` with explicit ICI collectives.

Layout.  For a mesh axis of size D, device d holds the row block
``A[d*Nl:(d+1)*Nl, :]`` of shape (Nl, N), Nl = N/D.  All functions here are
*per-shard* bodies: they take local shards plus the mesh-axis name and must
be called inside ``shard_map`` (the wrappers in
``causalgpslc_tpu/parallel/large_n.py`` do this for you).

Algorithm.  Right-looking blocked Cholesky over column panels of width B
(B | Nl, so each panel's rows live on exactly one device):

  per panel k at offset ofs = k*B:
    1. the owner device contributes the (B, B) diagonal block; a ``psum``
       replicates it; every device factorizes it redundantly (B is small —
       cheaper than a broadcast round-trip);
    2. each device triangular-solves its local (Nl, B) panel slice —
       pure local MXU work;
    3. one ``all_gather`` assembles the solved (N, B) panel — the only
       O(N) collective per panel, riding ICI;
    4. each device applies the rank-B trailing update to its row block
       with a column mask (static shapes; no dynamic-width slices).

  Rows above the diagonal carry the symmetric mirror of the Schur
  complement throughout (updates preserve symmetry), so the panel solve is
  applied uniformly to all local rows and the upper triangle is masked once
  at the end — no per-row branching inside the loop.

Per-panel cost: one (B,B) psum + one (N,B) all_gather + one (Nl,B)x(B,N)
matmul; N/B panels total.  At N=50k, B=512, D=8 that is ~100 MB gathered
per panel and ~42 TFLOP of MXU work overall — bandwidth- and
compute-balanced for a v5p slice.

The forward solve / logpdf reuse the same panel loop: the quadratic form
``||L^{-1} y||^2`` accumulates panel-by-panel with only (B,) psums.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular

__all__ = [
    "dist_cholesky",
    "dist_forward_solve_quad",
    "dist_mvn_logpdf",
    "dist_rbf_cov_rows",
    "local_rows",
]


def local_rows(axis: str, n_local: int) -> jax.Array:
    """Global row indices of this device's shard (call inside shard_map)."""
    d = lax.axis_index(axis)
    return d * n_local + jnp.arange(n_local)


def _i32(x):
    return jnp.asarray(x, dtype=jnp.int32)


def _diag_block(a_loc: jax.Array, ofs, block: int, axis: str) -> jax.Array:
    """Replicate the (B, B) diagonal block at global offset ``ofs``.

    ``ofs`` may be traced.  Requires ``block | n_local`` so the block's rows
    live on exactly one device; the owner contributes, a psum replicates.
    """
    n_local = a_loc.shape[-2]
    d = lax.axis_index(axis)
    owner = ofs // n_local
    lofs = jnp.where(d == owner, ofs - owner * n_local, 0)
    blk = lax.dynamic_slice(a_loc, (_i32(lofs), _i32(ofs)), (block, block))
    return lax.psum(jnp.where(d == owner, blk, jnp.zeros_like(blk)), axis)


def dist_cholesky(a_loc: jax.Array, *, axis: str, block: int = 256, unroll: int = 1) -> jax.Array:
    """Cholesky of a row-block-sharded SPD matrix; returns the local L shard.

    Args:
      a_loc: (Nl, N) local row block of the full symmetric matrix (both
        triangles populated — symmetry is what lets the panel solve run
        uniformly over all local rows).
      axis: mesh axis name over which rows are sharded.
      block: panel width B; must divide Nl.
      unroll: loop unroll factor (raise on TPU to amortize While quanta —
        see BASELINE.md dispatch-cost model).

    Returns the (Nl, N) local row block of lower-triangular L.
    """
    n_local, n = a_loc.shape[-2], a_loc.shape[-1]
    if n % n_local != 0:
        raise ValueError(f"rows {n_local} must evenly divide n={n}")
    if n_local % block != 0:
        raise ValueError(f"block={block} must divide local rows {n_local}")
    n_panels = n // block
    cols = jnp.arange(n)

    def body(k, a):
        ofs = k * block
        lkk = jnp.linalg.cholesky(_diag_block(a, ofs, block, axis))
        panel = lax.dynamic_slice(a, (_i32(0), _i32(ofs)), (n_local, block))
        # panel @ inv(lkk).T — local triangular solve on every row.
        lp = solve_triangular(lkk, panel.T, lower=True).T
        full = lax.all_gather(lp, axis, tiled=True)  # (N, B)
        colmask = (cols >= ofs + block).astype(a.dtype)
        # HIGHEST precision: bf16 Schur updates accumulate enough error over
        # the panels to push the trailing matrix indefinite (NaN sqrt) in f32
        a = a - jnp.matmul(lp, full.T, precision=jax.lax.Precision.HIGHEST) * colmask[None, :]
        return lax.dynamic_update_slice(a, lp, (_i32(0), _i32(ofs)))

    a_loc = lax.fori_loop(0, n_panels, body, a_loc, unroll=unroll)
    rows = local_rows(axis, n_local)
    return a_loc * (cols[None, :] <= rows[:, None]).astype(a_loc.dtype)


def dist_forward_solve_quad(
    l_loc: jax.Array, y_loc: jax.Array, *, axis: str, block: int = 256, unroll: int = 1
):
    """``(quad, logdet)`` of a sharded MVN from the sharded Cholesky factor.

    Computes ``quad = ||L^{-1} y||^2`` and ``logdet = 2 sum log diag(L)``
    without materializing the solution: the forward substitution advances
    one (B,)-panel at a time — the owner solves its small triangular system,
    a psum replicates the panel of z, and every device folds it into its
    local running combination ``L[rows, panel] @ z_panel``.  Both outputs
    are replicated across the axis.
    """
    n_local, n = l_loc.shape[-2], l_loc.shape[-1]
    if n_local % block != 0:
        raise ValueError(f"block={block} must divide local rows {n_local}")
    n_panels = n // block
    d = lax.axis_index(axis)

    def body(k, carry):
        part, quad = carry
        ofs = k * block
        lkk = _diag_block(l_loc, ofs, block, axis)
        owner = ofs // n_local
        lofs = jnp.where(d == owner, ofs - owner * n_local, 0)
        rhs = lax.dynamic_slice(y_loc - part, (_i32(lofs),), (block,))
        zk = solve_triangular(lkk, rhs, lower=True)
        zk = lax.psum(jnp.where(d == owner, zk, jnp.zeros_like(zk)), axis)
        lpanel = lax.dynamic_slice(l_loc, (_i32(0), _i32(ofs)), (n_local, block))
        # Rows above the panel have L == 0 there, so this is a no-op for them.
        part = part + jnp.matmul(lpanel, zk, precision=jax.lax.Precision.HIGHEST)
        return part, quad + jnp.sum(zk * zk)

    zero = jnp.zeros_like(y_loc)
    _, quad = lax.fori_loop(
        0, n_panels, body, (zero, jnp.zeros((), l_loc.dtype)), unroll=unroll
    )
    rows = local_rows(axis, n_local)
    diag = jnp.take_along_axis(l_loc, rows[:, None], axis=-1)[:, 0]
    logdet = 2.0 * lax.psum(jnp.sum(jnp.log(diag)), axis)
    return quad, logdet


def dist_mvn_logpdf(
    cov_loc: jax.Array, y_loc: jax.Array, *, axis: str, block: int = 256, unroll: int = 1
) -> jax.Array:
    """``log N(y; 0, Cov)`` for a row-sharded covariance; replicated scalar.

    The sharded analog of :func:`causalgpslc_tpu.ops.linalg.mvn_logpdf` —
    what the reference computes via ``Distributions.mvnormal`` on one CPU
    for every density evaluation.
    """
    n = cov_loc.shape[-1]
    l_loc = dist_cholesky(cov_loc, axis=axis, block=block, unroll=unroll)
    quad, logdet = dist_forward_solve_quad(
        l_loc, y_loc, axis=axis, block=block, unroll=unroll
    )
    cst = n * jnp.log(jnp.asarray(2.0 * jnp.pi, dtype=cov_loc.dtype))
    return -0.5 * (quad + logdet + cst)


def dist_rbf_cov_rows(
    x_full,
    ls_list,
    scale,
    noise,
    *,
    axis: str,
    n_local: int,
    extra_diag=None,
) -> jax.Array:
    """Build this device's (Nl, N) row block of a GPSLC covariance.

    ``sum_k logRBF(x_k)`` over feature groups → ``exp(.) * scale + noise I``
    (the reference's additive log-kernel composition,
    ``src/model_likelihood.jl:83-91`` + ``processCov`` ``src/kernel.jl:53``),
    built directly in sharded form: each device computes only its rows
    against the full (replicated) point set — the O(N^2 d) work and the
    O(N^2) memory are both divided by the mesh size.

    Args:
      x_full: list of (N,) or (N, d_k) replicated feature arrays.
      ls_list: matching lengthscales (scalar or (d_k,)).
      scale, noise: processCov parameters.
      extra_diag: optional replicated (N,) additional diagonal.
    """
    from .kernels import rbf_kernel_log

    rows = local_rows(axis, n_local)
    log_k = None
    for x, ls in zip(x_full, ls_list):
        x = jnp.asarray(x)
        x2d = x[:, None] if x.ndim == 1 else x
        part = rbf_kernel_log(x2d[rows], x2d, ls, method="dot")
        log_k = part if log_k is None else log_k + part
    n = log_k.shape[-1]
    # A SUM of log-RBF blocks is <= 0 exactly; the clamp re-asserts the
    # invariant after float rounding across blocks (each block is already
    # clamped in rbf_kernel_log, whose dot path also forces f32 matmul
    # precision — essential for the sentinel pads, see ops/kernels.py).
    log_k = jnp.minimum(log_k, 0.0)
    cov = jnp.exp(log_k) * scale
    diag = jnp.full((n,), noise, dtype=cov.dtype)
    if extra_diag is not None:
        diag = diag + extra_diag
    onehot = (jnp.arange(n)[None, :] == rows[:, None]).astype(cov.dtype)
    return cov + onehot * diag[None, :]
