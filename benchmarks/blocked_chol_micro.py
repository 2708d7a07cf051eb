"""Microbenchmark: quantum-free blocked Cholesky + logpdf vs XLA chol+solve.

Shapes mimic one GP-block score inside the Gibbs sweep: a batch of (n, n)
covariances (chains x blocks) factorized and scored sequentially K times
(data-dependent chaining, as in the MH inner loop / ESS iterations).

Usage: python benchmarks/blocked_chol_micro.py [N] [B] [K]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from causalgpslc_tpu.ops.blocked_chol import blocked_cholesky, mvn_logpdf_b  # noqa: E402
from causalgpslc_tpu.ops.linalg import mvn_logpdf_chol, safe_cholesky  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500
B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

rng = np.random.default_rng(0)
a = rng.normal(size=(B, N, 8)).astype(np.float32)
cov0 = jnp.asarray(np.exp(-((a[:, :, None, :] - a[:, None, :, :]) ** 2).sum(-1)) + 0.5 * np.eye(N, dtype=np.float32))
y = jnp.asarray(rng.normal(size=(B, N)), jnp.float32)


@jax.jit
def chain_xla(cov0, y):
    def body(c, _):
        chols = safe_cholesky(cov0 + c * 1e-6, jitter=0.0)
        ll = jax.vmap(mvn_logpdf_chol)(y, chols)
        return jnp.mean(ll), ll
    return jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=K)


@jax.jit
def chain_blocked(cov0, y):
    def body(c, _):
        f = blocked_cholesky(cov0 + c * 1e-6)
        ll = mvn_logpdf_b(y, f)
        return jnp.mean(ll), ll
    return jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=K)


def timeit(fn, *args, reps=5):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts), out


print(f"platform={jax.devices()[0].platform} N={N} B={B} K={K}", flush=True)
t_b, out_b = timeit(chain_blocked, cov0, y)
print(f"blocked: {t_b*1e3:.2f} ms total, {t_b/K*1e3:.3f} ms per score", flush=True)
t_x, out_x = timeit(chain_xla, cov0, y)
print(f"xla    : {t_x*1e3:.2f} ms total, {t_x/K*1e3:.3f} ms per score", flush=True)
err = np.abs(np.asarray(out_b[1]) - np.asarray(out_x[1])).max()
print(f"agreement: max abs {err:.4g}")
print(f"speedup: {t_x/t_b:.2f}x")
