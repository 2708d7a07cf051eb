"""Single-launch fused covariance-build + Cholesky + MVN log-density.

This is the hot op of the whole framework: every MH proposal and every
elliptical-slice iteration scores one or more GP blocks, and each score is
"build an n x n RBF covariance, factorize it, evaluate a Gaussian
log-density" (the reference bottoms out in ``Distributions.mvnormal`` logpdf
-> LAPACK Cholesky for the same math, e.g. ``src/model_likelihood.jl:83-91``).
Measured on the axon TPU backend, XLA's batched Cholesky has a ~4 ms latency
floor per op regardless of shape (BASELINE.md "Measured"), so the unfused
path pays that floor 2-4x per score (build ops + cholesky + triangular solve
+ reductions). This kernel does the entire score in ONE Pallas launch:

  cov_b = scale_b * exp(-cdist^2(z_b)) + base_coeff_b * BASE + noise_b * I
  L_b   = chol(cov_b)                      (blocked, in VMEM)
  out_b = log N(y_b; 0, cov_b)

Batched over B stacked GP blocks (and, via vmap, over chains). The blocked
Cholesky's unblocked 128-column base case is *vectorized across the batch
chunk* — the sequential column loop runs once per block-column for the whole
chunk, not once per matrix — and the panel triangular solves use explicitly
inverted 128x128 diagonal blocks so everything above the base case is MXU
matmuls. No dynamic slicing: base cases use iota-mask extraction, which
Mosaic lowers to plain VPU selects/reductions.

Capacity: the working set is Bc * n_pad^2 * 4 bytes of VMEM; with the default
``batch_tile=4`` and 16 MB VMEM this supports n up to ~1024. Larger n should
use the XLA path (one big factorization is FLOP-bound, not latency-bound, at
that size — BASELINE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only import; CPU tests run in interpret mode
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
    _SMEM = pltpu.SMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None
    _SMEM = None

__all__ = ["fused_mvn_loglik"]

_NB = 128  # Cholesky block edge (MXU tile)


def _row_idx(bc, nb, dtype=jnp.int32):
    return jax.lax.broadcasted_iota(dtype, (bc, nb, nb), 1)


def _col_idx(bc, nb, dtype=jnp.int32):
    return jax.lax.broadcasted_iota(dtype, (bc, nb, nb), 2)


def _chol_base(d):
    """In-register Cholesky of a (Bc, nb, nb) batch, lower triangular output
    (upper triangle zeroed). Right-looking rank-1 column sweep, vectorized
    over the batch: nb sequential iterations total for the whole chunk."""
    bc, nb, _ = d.shape
    rows = _row_idx(bc, nb)
    cols = _col_idx(bc, nb)
    rows1 = jax.lax.broadcasted_iota(jnp.int32, (bc, nb), 1)

    def body(j, d):
        col = jnp.sum(jnp.where(cols == j, d, 0.0), axis=2)  # (Bc, nb): column j
        piv = jnp.sum(jnp.where(rows1 == j, col, 0.0), axis=1)  # (Bc,): d[b, j, j]
        inv = jax.lax.rsqrt(piv)[:, None]
        lcol = jnp.where(rows1 >= j, col * inv, 0.0)  # (Bc, nb): L[:, j]
        lc = lcol[:, :, None]
        # one pass: rank-1 trailing update, then column j := lcol
        d = jnp.where(cols == j, lc, d - lc * lcol[:, None, :])
        # zero the (garbage) upper triangle of column j's row contributions
        return d

    d = jax.lax.fori_loop(0, nb, body, d)
    return jnp.where(rows >= cols, d, 0.0)


def _inv_lower_base(l, acc_t):
    """Inverse of a (Bc, nb, nb) lower-triangular batch via Newton-Schulz.

    Write ``L = (I + N) D`` with ``D = diag(L)`` and ``N`` strictly lower.
    For ``X_{k+1} = X_k (2I - L_unit X_k)`` the residual squares each step:
    ``E_{k+1} = E_k^2`` with ``E_0 = -N`` nilpotent, so after
    ``ceil(log2(nb))`` steps the inverse is EXACT (not approximate) — and the
    whole computation is MXU matmuls instead of an nb-iteration sequential
    substitution loop."""
    bc, nb, _ = l.shape
    rows = _row_idx(bc, nb)
    cols = _col_idx(bc, nb)
    eye = (rows == cols).astype(l.dtype)
    diag = jnp.sum(jnp.where(rows == cols, l, 0.0), axis=2)  # (Bc, nb)
    dinv = 1.0 / diag
    l_unit = l * dinv[:, None, :]  # scale columns: L D^{-1}
    steps = max(1, (nb - 1).bit_length())
    x = eye
    for _ in range(steps):
        ax = _bdot(l_unit, x, acc_t).astype(l.dtype)
        x = _bdot(x, 2.0 * eye - ax, acc_t).astype(l.dtype)
    return dinv[:, :, None] * x  # row-scale: L^{-1} = D^{-1} L_unit^{-1}


def _dot(a, b, acc_t):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())), preferred_element_type=acc_t)


def _dot_t(a, b, acc_t):
    """a @ b.T"""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())), preferred_element_type=acc_t)


def _bdot(a, b, acc_t):
    """Batched a @ b over a shared leading dim."""
    return jax.lax.dot_general(
        a, b, (((2,), (1,)), ((0,), (0,))), preferred_element_type=acc_t
    )


def _kernel(
    scal_ref,  # (1, Bc, 3) SMEM: [scale, noise, base_coeff]
    zg_ref,  # (1, Bc, n_pad, d_pad) VMEM
    base_ref,  # (n_pad, n_pad) VMEM (shared)
    yg_ref,  # (1, Bc, n_pad) VMEM
    outg_ref,  # (1, Bc, 128) VMEM
    a_ref,  # scratch (Bc, n_pad, n_pad)
    *,
    bc: int,
    n_pad: int,
    n_true: int,
    nblk: int,
):
    z_ref = zg_ref.at[0]
    y_ref = yg_ref.at[0]
    out_ref = outg_ref.at[0]
    dtype = z_ref.dtype
    acc_t = jnp.promote_types(dtype, jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    eye = (rows == cols).astype(dtype)
    valid = (rows < n_true) & (cols < n_true)

    # ---- 1. build the covariances (padding rows/cols -> identity) ---------
    base = base_ref[:]
    for b in range(bc):
        z = z_ref[b]
        sq = jnp.sum(z * z, axis=1)
        gram = _dot_t(z, z, acc_t).astype(dtype)
        d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * gram, 0.0)
        cov = (
            scal_ref[0, b, 0] * jnp.exp(-d2)
            + scal_ref[0, b, 2] * base
            + scal_ref[0, b, 1] * eye
        )
        a_ref[b] = jnp.where(valid, cov, eye)

    # ---- 2. blocked in-place Cholesky + 3. forward solve ------------------
    # Per block-column k: batch-vectorized unblocked factorization of the
    # diagonal block, explicit inverse, MXU panel solve; the forward solve
    # for alpha = L^{-1} y rides the same loop (alpha_k only needs panels
    # 0..k, which are final by then).
    logdet = jnp.zeros((bc,), dtype=dtype)
    quad = jnp.zeros((bc,), dtype=dtype)
    alphas = [[None] * nblk for _ in range(bc)]  # alphas[b][m]: (nb, 1)
    rows1 = jax.lax.broadcasted_iota(jnp.int32, (bc, _NB), 1)

    for k in range(nblk):
        ks, ke = k * _NB, (k + 1) * _NB
        # diagonal block, minus contributions of finished panels
        d_blocks = []
        for b in range(bc):
            d_b = a_ref[b, ks:ke, ks:ke]
            if k > 0:
                panel = a_ref[b, ks:ke, 0:ks]
                d_b = d_b - _dot_t(panel, panel, acc_t).astype(dtype)
            d_blocks.append(d_b)
        d = _chol_base(jnp.stack(d_blocks))
        linv = _inv_lower_base(d, acc_t)

        diag = jnp.sum(jnp.where(rows1[:, :, None] == _col_idx(bc, _NB), d, 0.0), axis=2)
        logdet = logdet + 2.0 * jnp.sum(jnp.log(diag), axis=1)

        for b in range(bc):
            a_ref[b, ks:ke, ks:ke] = d[b]
            # forward-solve block k: alpha_k = Linv_kk (y_k - sum_m L_km alpha_m)
            rhs = y_ref[b, ks:ke][:, None]
            for m in range(k):
                ms, me = m * _NB, (m + 1) * _NB
                rhs = rhs - _dot(a_ref[b, ks:ke, ms:me], alphas[b][m], acc_t).astype(dtype)
            alphas[b][k] = _dot(linv[b], rhs, acc_t).astype(dtype)
        quad = quad + jnp.stack([jnp.sum(alphas[b][k] * alphas[b][k]) for b in range(bc)])

        if k + 1 < nblk:
            for b in range(bc):
                m_b = a_ref[b, ke:, ks:ke]
                if k > 0:
                    m_b = m_b - _dot_t(a_ref[b, ke:, 0:ks], a_ref[b, ks:ke, 0:ks], acc_t).astype(dtype)
                a_ref[b, ke:, ks:ke] = _dot_t(m_b, linv[b], acc_t).astype(dtype)

    # ---- 4. epilogue -------------------------------------------------------
    cst = n_true * jnp.log(jnp.asarray(2.0 * jnp.pi, dtype=dtype))
    ll = -0.5 * (quad + logdet + cst)
    out_ref[:] = jnp.broadcast_to(ll[:, None], (bc, 128)).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("n_true", "batch_tile", "interpret")
)
def fused_mvn_loglik(
    z: jax.Array,
    scale: jax.Array,
    noise: jax.Array,
    base_coeff: jax.Array,
    base: jax.Array,
    y: jax.Array,
    *,
    n_true: int,
    batch_tile: int = 4,
    interpret: bool = False,
) -> jax.Array:
    """log N(y_b; 0, scale_b exp(-cdist^2(z_b)) + base_coeff_b BASE + noise_b I).

    Args:
      z: (B, n, d) lengthscale-scaled features per stacked GP block.
      scale, noise, base_coeff: (B,) per-block scalars. ``noise`` must already
        include any stabilization jitter (callers own the dtype policy).
      base: (n, n) shared base matrix (SigmaU for the U block; zeros otherwise).
      y: (B, n) density evaluation points.
      n_true: logical n (rows beyond it are padding).
      batch_tile: matrices factorized per Pallas program (VMEM budget:
        ~``batch_tile * ceil(n/128)^2 * 64 KB``).

    Returns: (B,) log-densities.
    """
    b_tot, n, d = z.shape
    dtype = z.dtype
    n_pad = -(-n // _NB) * _NB
    d_pad = max(-(-d // 128) * 128, 128)
    bc = batch_tile
    b_pad = -(-b_tot // bc) * bc

    n_grid = b_pad // bc
    zp = jnp.zeros((b_pad, n_pad, d_pad), dtype=dtype).at[:b_tot, :n, :d].set(z)
    yp = jnp.zeros((b_pad, n_pad), dtype=dtype).at[:b_tot, :n].set(y)
    basep = jnp.zeros((n_pad, n_pad), dtype=dtype).at[:n, :n].set(base)
    scal = jnp.zeros((b_pad, 3), dtype=dtype)
    scal = scal.at[:b_tot, 0].set(scale.astype(dtype))
    scal = scal.at[:b_tot, 1].set(noise.astype(dtype))
    scal = scal.at[:b_tot, 2].set(base_coeff.astype(dtype))
    # padding batch elements: identity covariance (scale=0, noise=1)
    if b_pad > b_tot:
        scal = scal.at[b_tot:, 1].set(jnp.ones((), dtype=dtype))
    # grid-chunked layouts so every block shape matches its array suffix
    zp = zp.reshape(n_grid, bc, n_pad, d_pad)
    yp = yp.reshape(n_grid, bc, n_pad)
    scal = scal.reshape(n_grid, bc, 3)

    nblk = n_pad // _NB
    if pltpu is None:  # pragma: no cover - interpreter without the TPU plugin
        raise NotImplementedError("fused_mvn_loglik requires the TPU Pallas plugin")
    vspec = lambda *a, **k: pl.BlockSpec(*a, memory_space=_VMEM, **k)  # noqa: E731
    sspec = lambda *a, **k: pl.BlockSpec(*a, memory_space=_SMEM, **k)  # noqa: E731
    scratch = [pltpu.VMEM((bc, n_pad, n_pad), dtype)]

    out = pl.pallas_call(
        functools.partial(
            _kernel, bc=bc, n_pad=n_pad, n_true=n_true, nblk=nblk
        ),
        out_shape=jax.ShapeDtypeStruct((n_grid, bc, 128), dtype),
        grid=(n_grid,),
        in_specs=[
            sspec((1, bc, 3), lambda g: (g, 0, 0)),
            vspec((1, bc, n_pad, d_pad), lambda g: (g, 0, 0, 0)),
            vspec((n_pad, n_pad), lambda g: (0, 0)),
            vspec((1, bc, n_pad), lambda g: (g, 0, 0)),
        ],
        out_specs=vspec((1, bc, 128), lambda g: (g, 0, 0)),
        scratch_shapes=scratch,
        interpret=interpret,
    )(scal, zp, basep, yp)
    return out.reshape(b_pad, 128)[:b_tot, 0]
