"""Fused RBF covariance construction as a Pallas TPU kernel.

Builds ``cov[i, j] = exp(-|z_i - z_j|^2) * scale (+ noise * [i == j])`` from
lengthscale-scaled features ``z`` in one tiled pass: per-tile Gram matmul on
the MXU, row/column squared norms on the VPU, and the exp/scale/diagonal
epilogue fused in-register — the intermediate log-kernel matrix that the
unfused path (``rbf_kernel_log`` + ``process_cov``) materializes in HBM never
exists. This is the hot construction op of every GP block (SURVEY.md §2 "Hot
kernel #1", replacing the reference's scalar double loop at
``src/kernel.jl:24-42``).

The feature dim is zero-padded to the 128-lane width (zeros do not change
pairwise distances); n is padded to the tile size and sliced back.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only import; CPU tests run in interpret mode
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

__all__ = ["fused_rbf_cov"]


def _kernel(z1_ref, z2_ref, scale_ref, noise_ref, out_ref, *, tile: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    z1 = z1_ref[:]
    z2 = z2_ref[:]
    sq1 = jnp.sum(z1 * z1, axis=1)
    sq2 = jnp.sum(z2 * z2, axis=1)
    # accumulate at least in f32; keep f64 when the inputs are f64
    acc_t = jnp.promote_types(z1.dtype, jnp.float32)
    cross = jax.lax.dot_general(
        z1,
        z2,
        (((1,), (1,)), ((), ())),
        preferred_element_type=acc_t,
    )
    sq = jnp.maximum(sq1[:, None] + sq2[None, :] - 2.0 * cross, 0.0)
    cov = jnp.exp(-sq) * scale_ref[0, 0]
    rows = i * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
    cols = j * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
    cov = jnp.where(rows == cols, cov + noise_ref[0, 0], cov)
    out_ref[:] = cov.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_rbf_cov(
    z: jax.Array,
    scale: jax.Array,
    noise: jax.Array,
    *,
    tile: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """``exp(-cdist^2(z)) * scale + noise * I`` without HBM intermediates.

    Args:
      z: (n, d) scaled features (``x / lengthscale`` per block, concatenated).
      scale / noise: scalars.
      tile: square output tile edge (multiple of 128 recommended).
      interpret: run in the Pallas interpreter (CPU testing).
    """
    n, d = z.shape
    dtype = z.dtype
    n_pad = -(-n // tile) * tile
    d_pad = max(-(-d // 128) * 128, 128)
    zp = jnp.zeros((n_pad, d_pad), dtype=dtype).at[:n, :d].set(z)
    scale2 = jnp.reshape(scale, (1, 1)).astype(dtype)
    noise2 = jnp.reshape(noise, (1, 1)).astype(dtype)

    grid = (n_pad // tile, n_pad // tile)
    kwargs = {}
    if _VMEM is not None:
        vspec = lambda *a, **k: pl.BlockSpec(*a, memory_space=_VMEM, **k)  # noqa: E731
    else:  # interpreter without the TPU plugin
        vspec = pl.BlockSpec

    out = pl.pallas_call(
        functools.partial(_kernel, tile=tile),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad), dtype),
        grid=grid,
        in_specs=[
            vspec((tile, d_pad), lambda i, j: (i, 0)),
            vspec((tile, d_pad), lambda i, j: (j, 0)),
            vspec((1, 1), lambda i, j: (0, 0)),
            vspec((1, 1), lambda i, j: (0, 0)),
        ],
        out_specs=vspec((tile, tile), lambda i, j: (i, j)),
        interpret=interpret,
        **kwargs,
    )(zp, zp, scale2, noise2)
    return out[:n, :n]
