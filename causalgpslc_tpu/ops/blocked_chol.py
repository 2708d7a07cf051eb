"""Quantum-free batched Cholesky, triangular solves, and MVN log-density.

Why this exists: on the axon TPU backend every iteration of an XLA While
loop costs a fixed dispatch quantum (~0.2-0.8 ms measured; BASELINE.md),
while straight-line op chains are essentially free. XLA's ``cholesky`` and
``triangular_solve`` are internally *blocked While loops* (one iteration per
128-column panel), so a single n=512 factorize-and-solve pays ~8 quanta
(~6 ms) regardless of batch size — this is the dominant cost of the whole
MCMC (the reference's equivalent layer is LAPACK via ``Distributions``;
``src/likelihood.jl:42-49``).

This module rebuilds the same linear algebra with ZERO data-dependent
control flow in XLA:

- ``blocked_cholesky``: a statically unrolled right-looking blocked
  factorization. Panel updates and triangular panel solves are straight-line
  batched MXU matmuls. The only sequential part — the 128x128 diagonal-block
  factorization — runs in ONE small Pallas kernel (`_chol_base_call`), whose
  internal column loop is a Mosaic ``fori_loop`` (no XLA quanta), vectorized
  across the whole batch.
- Diagonal-block inverses come from an EXACT Newton-Schulz iteration: for
  unit-lower-triangular ``A = I + N`` the residual of
  ``X <- X (2I - A X)`` squares each step and ``N`` is nilpotent, so
  ``ceil(log2(128)) = 7`` iterations of pure matmuls give the exact inverse.
- ``tri_solve_lower`` / ``chol_solve_b`` / ``mvn_logpdf_b``: forward and
  backward substitution expressed as K-stage straight-line matmuls against
  the stored block inverses — no ``triangular_solve`` While loops.

All entry points accept arbitrary leading batch dims and carry a
``jax.custom_batching.custom_vmap`` rule that FLATTENS mapped axes into the
kernel batch, so chain-vmapped samplers share one Pallas launch instead of
one per chain.

The factor layout is ``CholFactors(l, linv)`` where ``l`` is the dense lower
factor (padded region = identity) and ``linv`` holds the K diagonal-block
inverses. Numerics: bitwise-equivalent algorithm to textbook Cholesky up to
matmul reassociation; validated against ``jnp.linalg.cholesky`` in tests.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pragma: no cover - the TPU plugin may be absent (CPU-only envs)
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

__all__ = [
    "NB",
    "CholFactors",
    "chol_base",
    "blocked_cholesky",
    "tri_solve_lower",
    "tri_solve_upper",
    "chol_solve_b",
    "mvn_logpdf_b",
]

NB = 128  # panel width: MXU tile edge
# matrices per Pallas program in the base-case kernel; the working set is
# ~5x tile x 64 KB (input + output + panel/trailing copies) and must stay
# under the 16 MB scoped-vmem limit (tile 64 OOMs at 19.9 MB; tile 32
# measured 17.11 MB on the 2026-08 compiler — tile 16 keeps ~8.6 MB).
_BASE_TILE = 16


# ---------------------------------------------------------------------------
# Pallas base case: batched 128x128 Cholesky
# ---------------------------------------------------------------------------


_SP = 32  # sub-panel width inside the base-case kernel


# Masked column steps per Mosaic loop iteration. Round-4 micro-profiling
# (benchmarks/fused_micro.json) showed the base kernel IS the block-eval
# bottleneck (1.34 of 2.4 ms at the bench shape: 4 grid programs x 32 loop
# iterations at ~10 us each), so the sweep runs fewer, wider iterations.
# Env override CAUSALGPSLC_CHOL_UNROLL for experiments; values beyond ~16
# risk the remote Mosaic compiler (CLAUDE.md).
import os as _os

_UNROLL = int(_os.environ.get("CAUSALGPSLC_CHOL_UNROLL", 4))


def _chol_base_kernel(dg_ref, outg_ref, *, bc: int, nb: int):
    """Batched in-VMEM Cholesky of (Bc, nb, nb).

    Right-looking over ``_SP``-wide sub-panels: the sequential rank-1 column
    sweep touches only the (Bc, nb, _SP) panel, and each finished panel hits
    the trailing matrix as one rank-_SP MXU matmul. The column sweep is a
    Mosaic ``fori_loop`` (iteration overhead ~5 us measured) with
    ``_UNROLL`` masked steps per iteration to amortize that overhead.
    (A fully unrolled static-index variant generates code the remote Mosaic
    compiler chokes on — >40 min compiles; see CLAUDE.md.)

    Finalized columns are naturally immune to later rank-1 updates: step j'
    masks its lcol to rows >= j', so the update coefficient at any finished
    column j < j' is zero."""
    d = dg_ref[0]
    dtype = d.dtype
    acc_t = jnp.promote_types(dtype, jnp.float32)
    rows1 = jax.lax.broadcasted_iota(jnp.int32, (bc, nb), 1)
    pcols = jax.lax.broadcasted_iota(jnp.int32, (bc, nb, _SP), 2)

    panels = []
    trailing = d  # (Bc, nb, nb - p*_SP): narrows per finished panel
    for p in range(nb // _SP):
        ps = p * _SP
        panel = trailing[:, :, :_SP]  # (Bc, nb, _SP)
        trailing = trailing[:, :, _SP:]

        def body(i, panel, ps=ps):
            for k in range(_UNROLL):
                j = i * _UNROLL + k  # traced panel-local column index
                gj = ps + j
                col = jnp.sum(jnp.where(pcols == j, panel, 0.0), axis=2)  # (Bc, nb)
                piv = jnp.sum(jnp.where(rows1 == gj, col, 0.0), axis=1)
                lcol = jnp.where(rows1 >= gj, col * jax.lax.rsqrt(piv)[:, None], 0.0)
                lrow = lcol[:, ps : ps + _SP]  # (Bc, _SP) in-panel coefficients
                panel = jnp.where(
                    pcols == j, lcol[:, :, None], panel - lcol[:, :, None] * lrow[:, None, :]
                )
            return panel

        panel = jax.lax.fori_loop(0, _SP // _UNROLL, body, panel)
        panels.append(panel)

        if trailing.shape[2] > 0:
            # one rank-_SP MXU update of everything right of this panel
            lp_rows = panel[:, ps + _SP :, :]  # (Bc, nb-ps-_SP, _SP)
            upd = jax.lax.dot_general(
                panel,
                lp_rows,
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=acc_t,
            ).astype(dtype)  # (Bc, nb, nb-ps-_SP)
            trailing = trailing - upd

    outg_ref[0] = jnp.concatenate(panels, axis=2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _chol_base_call(d: jax.Array, interpret: bool = False) -> jax.Array:
    """Batched Cholesky of (B, nb, nb) SPD blocks in one Pallas launch."""
    b_tot, nb, _ = d.shape
    bc = min(_BASE_TILE, max(1, b_tot))
    b_pad = -(-b_tot // bc) * bc
    if b_pad > b_tot:
        eye = jnp.eye(nb, dtype=d.dtype)
        d = jnp.concatenate(
            [d, jnp.broadcast_to(eye, (b_pad - b_tot, nb, nb))], axis=0
        )
    dg = d.reshape(b_pad // bc, bc, nb, nb)
    vspec = lambda *a, **k: pl.BlockSpec(*a, memory_space=pltpu.VMEM, **k)  # noqa: E731
    out = pl.pallas_call(
        functools.partial(_chol_base_kernel, bc=bc, nb=nb),
        out_shape=jax.ShapeDtypeStruct(dg.shape, d.dtype),
        grid=(b_pad // bc,),
        in_specs=[vspec((1, bc, nb, nb), lambda g: (g, 0, 0, 0))],
        out_specs=vspec((1, bc, nb, nb), lambda g: (g, 0, 0, 0)),
        interpret=interpret,
    )(dg)
    return out.reshape(b_pad, nb, nb)[:b_tot]


def _chol_base_xla(d: jax.Array) -> jax.Array:
    """CPU/f64 fallback for the base case (XLA's native cholesky)."""
    return jnp.linalg.cholesky(d)


def _chol_base_unrolled_xla(d: jax.Array) -> jax.Array:
    """Control-flow-free base-case Cholesky in pure XLA (no Pallas, no While).

    Round-4 micro-profiling (benchmarks/fused_micro.json + grid-scaling
    probe) measured the axon runtime's cost law: every sequential
    control-flow step — an XLA While iteration or a Pallas GRID STEP — costs
    ~0.33 ms, while fused straight-line XLA chains are nearly free (the ~30
    matmuls of the Newton-Schulz inverse measure 0.04 ms). The Pallas base
    kernel's grid steps were therefore the block-evaluation bottleneck
    (1.34 of 2.4 ms at the bench shape). This variant is the same
    right-looking sub-panel algorithm as the Pallas kernel — _SP-wide
    panels, masked column sweep, rank-_SP MXU trailing updates — expressed
    as a fully unrolled straight-line XLA graph. Bit-comparable numerics
    (same operation order up to fusion reassociation).
    """
    b, nb, _ = d.shape
    dtype = d.dtype
    acc_t = jnp.promote_types(dtype, jnp.float32)
    rows1 = jax.lax.broadcasted_iota(jnp.int32, (b, nb), 1)
    pcols = jax.lax.broadcasted_iota(jnp.int32, (b, nb, _SP), 2)

    panels = []
    trailing = d
    for p in range(nb // _SP):
        ps = p * _SP
        panel = trailing[:, :, :_SP]
        trailing = trailing[:, :, _SP:]
        for j in range(_SP):
            gj = ps + j
            col = jnp.sum(jnp.where(pcols == j, panel, 0.0), axis=2)
            piv = jnp.sum(jnp.where(rows1 == gj, col, 0.0), axis=1)
            lcol = jnp.where(rows1 >= gj, col * jax.lax.rsqrt(piv)[:, None], 0.0)
            lrow = lcol[:, ps : ps + _SP]
            panel = jnp.where(
                pcols == j, lcol[:, :, None], panel - lcol[:, :, None] * lrow[:, None, :]
            )
        panels.append(panel)
        if trailing.shape[2] > 0:
            lp_rows = panel[:, ps + _SP :, :]
            upd = jax.lax.dot_general(
                panel, lp_rows, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=acc_t,
            ).astype(dtype)
            trailing = trailing - upd
    return jnp.concatenate(panels, axis=2)


# TPU base-case implementation. "pallas" (default): the grid-1 kernel —
# 4 compact calls per 512-eval at ~0.33 ms each (the axon per-call/grid-step
# quantum). "unrolled": the same algorithm as straight-line XLA — 3.4x
# faster in an isolated scan-replay micro (0.40 vs 1.37 ms,
# benchmarks/fused_micro.json) but 2.6x SLOWER in the full bench program
# (84 s vs 32 s, identical samples): its ~700-op body exceeds the runtime's
# replay cache, so every outer iteration re-streams it at ~25 us/op.
# Compact ops replay; big straight-line bodies re-stream — the round-4
# cost law (BASELINE.md).
_BASE_MODE = _os.environ.get("CAUSALGPSLC_CHOL_BASE", "pallas")


def chol_base(d: jax.Array, *, use_pallas: bool, interpret: bool = False) -> jax.Array:
    if use_pallas:
        if _BASE_MODE == "unrolled":
            return _chol_base_unrolled_xla(d)
        return _chol_base_call(d, interpret=interpret)
    return _chol_base_xla(d)


# ---------------------------------------------------------------------------
# Exact Newton-Schulz triangular inverse (straight-line matmuls)
# ---------------------------------------------------------------------------


def _inv_lower_newton(l: jax.Array) -> jax.Array:
    """Exact inverse of batched lower-triangular (..., s, s) via Newton-Schulz
    on the unit-triangular part: E_{k+1} = E_k^2 with E_0 strictly lower
    (nilpotent), so ceil(log2(s)) matmul rounds terminate exactly."""
    s = l.shape[-1]
    dtype = l.dtype
    acc_t = jnp.promote_types(dtype, jnp.float32)
    eye = jnp.eye(s, dtype=dtype)
    diag = jnp.diagonal(l, axis1=-2, axis2=-1)
    dinv = 1.0 / diag
    l_unit = l * dinv[..., None, :]  # column-scale: L D^{-1}
    x = jnp.broadcast_to(eye, l.shape)
    for _ in range(max(1, (s - 1).bit_length())):
        ax = jnp.matmul(l_unit, x, preferred_element_type=acc_t).astype(dtype)
        x = jnp.matmul(x, 2.0 * eye - ax, preferred_element_type=acc_t).astype(dtype)
    return dinv[..., :, None] * x  # row-scale: L^{-1} = D^{-1} L_unit^{-1}


_INV_SUB = 32  # sub-block size for the NB x NB triangular inverse


def _inv_lower(l: jax.Array) -> jax.Array:
    """Exact inverse of batched lower-triangular (B, NB, NB) blocks.

    Newton-Schulz directly at NB=128 costs ~7 full (B,128,128) matmul rounds
    (~30 GFLOP at B=128 — it dominated the factorization). Instead: exact
    Newton inverses of the 32x32 diagonal sub-blocks (log2(32)=5 tiny
    rounds), then assemble the full inverse by block forward substitution —
    X[i][j] = -inv_i (sum_m L[i,m] X[m][j]) — in small matmuls."""
    nb = l.shape[-1]
    if nb <= _INV_SUB:
        return _inv_lower_newton(l)
    dtype = l.dtype
    acc_t = jnp.promote_types(dtype, jnp.float32)
    s = _INV_SUB
    nsub = nb // s
    # (B, nsub, s, s) diagonal sub-blocks, inverted exactly in one shot
    dblocks = jnp.stack(
        [l[..., i * s : (i + 1) * s, i * s : (i + 1) * s] for i in range(nsub)], axis=-3
    )
    dinv = _inv_lower_newton(dblocks)
    inv = [dinv[..., i, :, :] for i in range(nsub)]

    x: dict = {}
    for j in range(nsub):
        x[(j, j)] = inv[j]
        for i in range(j + 1, nsub):
            acc = None
            for m in range(j, i):
                term = jnp.matmul(
                    l[..., i * s : (i + 1) * s, m * s : (m + 1) * s],
                    x[(m, j)],
                    preferred_element_type=acc_t,
                )
                acc = term if acc is None else acc + term
            x[(i, j)] = -jnp.matmul(inv[i], acc.astype(dtype), preferred_element_type=acc_t).astype(dtype)
    zero = jnp.zeros(l.shape[:-2] + (s, s), dtype=dtype)
    rows = [
        jnp.concatenate([x.get((i, j), zero) for j in range(nsub)], axis=-1)
        for i in range(nsub)
    ]
    return jnp.concatenate(rows, axis=-2)


# ---------------------------------------------------------------------------
# Blocked factorization driver (statically unrolled)
# ---------------------------------------------------------------------------


class CholFactors(NamedTuple):
    """Lower factor + per-panel diagonal-block inverses.

    l: (..., n_pad, n_pad) lower Cholesky factor; rows/cols beyond the true n
       are identity (harmless for solves with zero-padded rhs, logdet += 0).
    linv: (..., K, NB, NB) inverses of the K diagonal blocks of ``l``.
    n: true (unpadded) dimension.
    """

    l: jax.Array
    linv: jax.Array
    n: int


def _pad_spd(cov: jax.Array, n_pad: int) -> jax.Array:
    """Zero-pad an SPD matrix to (n_pad, n_pad) with an identity tail."""
    n = cov.shape[-1]
    if n == n_pad:
        return cov
    batch = cov.shape[:-2]
    out = jnp.zeros(batch + (n_pad, n_pad), dtype=cov.dtype)
    out = out.at[..., :n, :n].set(cov)
    tail = jnp.concatenate(
        [jnp.zeros((n,), dtype=cov.dtype), jnp.ones((n_pad - n,), dtype=cov.dtype)]
    )
    return out + jnp.diag(tail)


def _mm(a, b, acc_t):
    return jnp.matmul(a, b, preferred_element_type=acc_t)


@functools.lru_cache(maxsize=None)
def _make_blocked_cholesky_flat(use_pallas: bool, interpret: bool):
    """Build the (B, n_pad, n_pad) -> (l, linv) factorizer with a custom vmap
    rule that flattens mapped axes into the kernel batch (so chain-vmapped
    samplers share one Pallas launch instead of one per chain)."""

    @jax.custom_batching.custom_vmap
    def flat_chol(cov: jax.Array):
        # (A panel-concat restructure of this driver — avoiding the .at[].set
        # full-buffer updates — measured performance-neutral on-chip in round
        # 4 and was reverted to keep the compiled program, and therefore the
        # committed compile cache, byte-stable.)
        dtype = cov.dtype
        acc_t = jnp.promote_types(dtype, jnp.float32)
        n_pad = cov.shape[-1]
        k_blocks = n_pad // NB

        l = jnp.zeros_like(cov)
        linvs = []
        for k in range(k_blocks):
            ks, ke = k * NB, (k + 1) * NB
            d = cov[:, ks:ke, ks:ke]
            if k > 0:
                panel = l[:, ks:ke, 0:ks]
                d = d - _mm(panel, jnp.swapaxes(panel, -1, -2), acc_t).astype(dtype)
            d = chol_base(d, use_pallas=use_pallas, interpret=interpret)
            linv = _inv_lower(d)
            l = l.at[:, ks:ke, ks:ke].set(d)
            linvs.append(linv)
            if k + 1 < k_blocks:
                m = cov[:, ke:, ks:ke]
                if k > 0:
                    m = m - _mm(
                        l[:, ke:, 0:ks], jnp.swapaxes(l[:, ks:ke, 0:ks], -1, -2), acc_t
                    ).astype(dtype)
                l = l.at[:, ke:, ks:ke].set(
                    _mm(m, jnp.swapaxes(linv, -1, -2), acc_t).astype(dtype)
                )
        return l, jnp.stack(linvs, axis=1)

    @flat_chol.def_vmap
    def _rule(axis_size, in_batched, cov):
        (cov_b,) = in_batched
        if not cov_b:
            cov = jnp.broadcast_to(cov[None], (axis_size,) + cov.shape)
        b = cov.shape[1]
        flat = cov.reshape((axis_size * b,) + cov.shape[2:])
        l, linv = flat_chol(flat)
        l = l.reshape((axis_size, b) + l.shape[1:])
        linv = linv.reshape((axis_size, b) + linv.shape[1:])
        return (l, linv), (True, True)

    return flat_chol


def blocked_cholesky(
    cov: jax.Array, *, use_pallas: bool = True, interpret: bool = False
) -> CholFactors:
    """Quantum-free Cholesky of (..., n, n) SPD matrices (padding to 128k)."""
    n = cov.shape[-1]
    n_pad = -(-n // NB) * NB
    batch = cov.shape[:-2]
    flat = _pad_spd(cov, n_pad).reshape((-1, n_pad, n_pad))
    l, linv = _make_blocked_cholesky_flat(use_pallas, interpret)(flat)
    return CholFactors(
        l=l.reshape(batch + (n_pad, n_pad)),
        linv=linv.reshape(batch + linv.shape[1:]),
        n=n,
    )


# ---------------------------------------------------------------------------
# Straight-line solves and log-density
# ---------------------------------------------------------------------------


def _pad_rhs(b_vec: jax.Array, n_pad: int) -> jax.Array:
    n = b_vec.shape[-1]
    if n == n_pad:
        return b_vec
    pad = [(0, 0)] * (b_vec.ndim - 1) + [(0, n_pad - n)]
    return jnp.pad(b_vec, pad)


def tri_solve_lower(f: CholFactors, b_vec: jax.Array) -> jax.Array:
    """``L^{-1} b`` for (..., n) rhs via K-stage block forward substitution —
    every stage is a batched matmul against stored block inverses."""
    dtype = b_vec.dtype
    acc_t = jnp.promote_types(dtype, jnp.float32)
    n_pad = f.l.shape[-1]
    k_blocks = n_pad // NB
    y = _pad_rhs(b_vec, n_pad)[..., None]  # (..., n_pad, 1)
    outs = []
    for k in range(k_blocks):
        ks, ke = k * NB, (k + 1) * NB
        rhs = y[..., ks:ke, :]
        for m in range(k):
            ms, me = m * NB, (m + 1) * NB
            rhs = rhs - _mm(f.l[..., ks:ke, ms:me], outs[m], acc_t).astype(dtype)
        outs.append(_mm(f.linv[..., k, :, :], rhs, acc_t).astype(dtype))
    alpha = jnp.concatenate(outs, axis=-2)[..., 0]
    return alpha[..., : f.n] if f.n != n_pad else alpha


def tri_solve_upper(f: CholFactors, b_vec: jax.Array) -> jax.Array:
    """``L^{-T} b`` via K-stage block backward substitution."""
    dtype = b_vec.dtype
    acc_t = jnp.promote_types(dtype, jnp.float32)
    n_pad = f.l.shape[-1]
    k_blocks = n_pad // NB
    y = _pad_rhs(b_vec, n_pad)[..., None]
    outs: dict[int, jax.Array] = {}
    for k in reversed(range(k_blocks)):
        ks, ke = k * NB, (k + 1) * NB
        rhs = y[..., ks:ke, :]
        for m in range(k + 1, k_blocks):
            ms, me = m * NB, (m + 1) * NB
            # (L^T)[k, m] = L[m, k]^T
            rhs = rhs - _mm(
                jnp.swapaxes(f.l[..., ms:me, ks:ke], -1, -2), outs[m], acc_t
            ).astype(dtype)
        outs[k] = _mm(
            jnp.swapaxes(f.linv[..., k, :, :], -1, -2), rhs, acc_t
        ).astype(dtype)
    alpha = jnp.concatenate([outs[k] for k in range(k_blocks)], axis=-2)[..., 0]
    return alpha[..., : f.n] if f.n != n_pad else alpha


def chol_solve_b(f: CholFactors, b_vec: jax.Array) -> jax.Array:
    """``A^{-1} b`` from the blocked factors (A = L L^T)."""
    return tri_solve_upper(f, tri_solve_lower(f, b_vec))


def chol_logdet_b(f: CholFactors) -> jax.Array:
    diag = jnp.diagonal(f.l, axis1=-2, axis2=-1)
    # padded diagonal entries are exactly 1 -> log contribution 0
    return 2.0 * jnp.sum(jnp.log(diag), axis=-1)


def mvn_logpdf_b(x: jax.Array, f: CholFactors, mean=None) -> jax.Array:
    """N(x; mean, L L^T) log-density — no While loops anywhere."""
    dev = x if mean is None else x - mean
    alpha = tri_solve_lower(f, dev)
    quad = jnp.sum(alpha * alpha, axis=-1)
    cst = f.n * jnp.log(jnp.asarray(2.0 * jnp.pi, dtype=x.dtype))
    return -0.5 * (quad + chol_logdet_b(f) + cst)
