"""Micro-decomposition of one GP block evaluation in the scan-replay regime.

The round-4 probes located the bench wall on ~130 block evaluations per
outer iteration at ~2.5 ms each inside While-loop replay. This measures
each stage of an evaluation — covariance build, blocked (QFC) Cholesky,
Pallas base case, Newton-Schulz inverse, solve+logpdf — as the body of a
64-iteration lax.scan over iteration-varying inputs (the execution regime
the sampler actually runs in), so per-stage replay costs are measured, not
estimated from op counts.

Writes benchmarks/fused_micro.json. Shapes: batch 16 x (512, 512) f32 (the
bench shape: 16 chains, N=500 padded to 512).
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(ROOT))

B = int(os.environ.get("MICRO_B", 16))
N = int(os.environ.get("MICRO_N", 500))
T = int(os.environ.get("MICRO_T", 64))


def log(msg):
    print(f"[micro {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from causalgpslc_tpu.models.blocks import build_cov
    from causalgpslc_tpu.ops.blocked_chol import (
        _chol_base_call,
        _inv_lower,
        blocked_cholesky,
        mvn_logpdf_b,
        CholFactors,
    )
    from causalgpslc_tpu.ops.linalg import mvn_logpdf_chol, stabilize_cov

    platform = jax.devices()[0].platform
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    feats0 = jnp.asarray(rng.normal(size=(B, N, 2)), dtype)
    target = jnp.asarray(rng.normal(size=(B, N)), dtype)
    base_cov = jnp.asarray(
        np.einsum("bnf,bmf->bnm", np.asarray(feats0), np.asarray(feats0))
        + 3.0 * np.eye(N)[None],
        dtype,
    )
    l0 = np.linalg.cholesky(np.asarray(base_cov, np.float64)).astype(np.float32)
    l0 = jnp.asarray(l0)

    results = {"config": {"B": B, "N": N, "T": T, "platform": platform}}

    def timed(name, body, init_carry):
        from functools import partial

        @jax.jit
        def run(carry, keys):
            return jax.lax.scan(lambda c, k: body(c, k), carry, keys)

        keys = jnp.arange(T, dtype=dtype) * 1e-6
        log(f"{name}: compile ...")
        t0 = time.perf_counter()
        out = run(init_carry, keys)
        np.asarray(jax.tree.leaves(out)[0])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = run(init_carry, keys)
        np.asarray(jax.tree.leaves(out)[0])
        wall = time.perf_counter() - t0
        results[name] = {
            "ms_per_iter": round(wall / T * 1000, 3),
            "wall_s": round(wall, 3),
            "compile_s": round(compile_s, 1),
        }
        log(f"{name}: {results[name]}")

    # 0. empty scan floor
    timed("empty", lambda c, k: (c + k, c), jnp.zeros((), dtype))

    # 1. full QFC eval (cov build + blocked chol + logpdf)
    def eval_qfc(c, k):
        f = feats0 + (c * 0 + k)  # iteration-varying, prevents hoisting
        cov = stabilize_cov(jax.vmap(lambda ff: build_cov(ff, 1.3, 0.4))(f))
        facs = blocked_cholesky(cov, use_pallas=True)
        ll = mvn_logpdf_b(target, facs)
        return c + jnp.sum(ll) * 1e-20, ll[0]

    timed("eval_qfc", eval_qfc, jnp.zeros((), dtype))

    # 2. full XLA eval (native cholesky path)
    def eval_xla(c, k):
        f = feats0 + (c * 0 + k)
        cov = stabilize_cov(jax.vmap(lambda ff: build_cov(ff, 1.3, 0.4))(f))
        chols = jnp.linalg.cholesky(cov)
        ll = jax.vmap(mvn_logpdf_chol)(target, chols)
        return c + jnp.sum(ll) * 1e-20, ll[0]

    timed("eval_xla", eval_xla, jnp.zeros((), dtype))

    # 3. covariance build only
    def cov_only(c, k):
        f = feats0 + (c * 0 + k)
        cov = jax.vmap(lambda ff: build_cov(ff, 1.3, 0.4))(f)
        return c + jnp.sum(cov) * 1e-20, cov[0, 0, 0]

    timed("cov_only", cov_only, jnp.zeros((), dtype))

    # 4. blocked (QFC) cholesky only
    def chol_qfc(c, k):
        cov = base_cov + (c * 0 + k) * jnp.eye(N, dtype=dtype)
        facs = blocked_cholesky(cov, use_pallas=True)
        return c + jnp.sum(facs.l) * 1e-20, facs.l[0, 0, 0]

    timed("chol_qfc_only", chol_qfc, jnp.zeros((), dtype))

    # 5. XLA cholesky only
    def chol_xla(c, k):
        cov = base_cov + (c * 0 + k) * jnp.eye(N, dtype=dtype)
        l = jnp.linalg.cholesky(cov)
        return c + jnp.sum(l) * 1e-20, l[0, 0, 0]

    timed("chol_xla_only", chol_xla, jnp.zeros((), dtype))

    # 6. pallas base case only (the 64 = B*4 diagonal tiles of the bench shape)
    tiles0 = jnp.asarray(
        np.broadcast_to(np.eye(128, dtype=np.float32) * 2.0, (4 * B, 128, 128)).copy()
    )

    def base_only(c, k):
        d = tiles0 + (c * 0 + k) * jnp.eye(128, dtype=dtype)
        l = _chol_base_call(d)
        return c + jnp.sum(l) * 1e-20, l[0, 0, 0]

    timed("pallas_base_only", base_only, jnp.zeros((), dtype))

    # 7. Newton-Schulz triangular inverse only (B*4 tiles of 128)
    ltiles0 = jnp.asarray(
        np.broadcast_to(
            np.linalg.cholesky(np.eye(128) * 2.0 + 0.1).astype(np.float32),
            (4 * B, 128, 128),
        ).copy()
    )

    def inv_only(c, k):
        l = ltiles0 + (c * 0 + k) * jnp.eye(128, dtype=dtype)
        inv = _inv_lower(l)
        return c + jnp.sum(inv) * 1e-20, inv[0, 0, 0]

    timed("ns_inverse_only", inv_only, jnp.zeros((), dtype))

    # 8. solve + logpdf from prebuilt factors
    facs0 = blocked_cholesky(base_cov, use_pallas=platform == "tpu")

    def solve_only(c, k):
        f2 = CholFactors(l=facs0.l + (c * 0 + k) * 1e-9, linv=facs0.linv, n=N)
        ll = mvn_logpdf_b(target, f2)
        return c + jnp.sum(ll) * 1e-20, ll[0]

    timed("solve_logpdf_only", solve_only, jnp.zeros((), dtype))

    out = ROOT / "benchmarks" / ("fused_micro.json" if platform != "cpu" else "fused_micro_cpu.json")
    out.write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
