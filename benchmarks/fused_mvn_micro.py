"""Microbenchmark: fused Pallas build+chol+logpdf vs the unfused XLA chain.

Measures the per-call latency of K data-dependent sequential GP-block scores
(the shape of the ESS inner loop) under both implementations, on the real
TPU. Timing uses host transfers as barriers (jax.block_until_ready does not
synchronize on the axon backend — CLAUDE.md).

Usage: python benchmarks/fused_mvn_micro.py [N] [B] [K]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from causalgpslc_tpu.ops.linalg import mvn_logpdf_chol, safe_cholesky  # noqa: E402
from causalgpslc_tpu.ops.pallas.mvn import fused_mvn_loglik  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500
B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10
D = 8

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

rng = np.random.default_rng(0)
z = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
scale = jnp.asarray(rng.uniform(0.5, 2.0, B), jnp.float32)
noise = jnp.asarray(rng.uniform(0.1, 0.5, B), jnp.float32)
bcoef = jnp.zeros((B,), jnp.float32)
base = jnp.zeros((N, N), jnp.float32)
y = jnp.asarray(rng.normal(size=(B, N)), jnp.float32)


def xla_score(z, y, scale, noise):
    sq = jnp.sum(z * z, axis=-1)
    gram = jnp.einsum("bnd,bmd->bnm", z, z)
    d2 = jnp.maximum(sq[:, :, None] + sq[:, None, :] - 2 * gram, 0.0)
    cov = scale[:, None, None] * jnp.exp(-d2) + noise[:, None, None] * jnp.eye(N, dtype=z.dtype)
    chols = safe_cholesky(cov, jitter=0.0)
    return jax.vmap(mvn_logpdf_chol)(y, chols)


@jax.jit
def chain_xla(z, y, scale, noise):
    def body(carry, _):
        ll = xla_score(z + carry * 1e-6, y, scale, noise)
        return jnp.mean(ll), ll
    return jax.lax.scan(body, jnp.zeros((), z.dtype), None, length=K)


@jax.jit
def chain_fused(z, y, scale, noise):
    def body(carry, _):
        ll = fused_mvn_loglik(
            z + carry * 1e-6, scale, noise, bcoef, base, y, n_true=N, batch_tile=8
        )
        return jnp.mean(ll), ll
    return jax.lax.scan(body, jnp.zeros((), z.dtype), None, length=K)


def timeit(fn, *args, reps=5):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # barrier
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts), out


print(f"platform={jax.devices()[0].platform} N={N} B={B} K={K}", flush=True)

t_fused, out_f = timeit(chain_fused, z, y, scale, noise)
print(f"fused : {t_fused*1e3:.2f} ms total, {t_fused/K*1e3:.3f} ms per score", flush=True)

t_xla, out_x = timeit(chain_xla, z, y, scale, noise)
print(f"xla   : {t_xla*1e3:.2f} ms total, {t_xla/K*1e3:.3f} ms per score", flush=True)

err = np.abs(np.asarray(out_f[1]) - np.asarray(out_x[1])).max()
rel = err / np.abs(np.asarray(out_x[1])).max()
print(f"agreement: max abs {err:.4g} (rel {rel:.2e})")
print(f"speedup: {t_xla / t_fused:.2f}x")
