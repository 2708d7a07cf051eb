"""Large-N single-chip benchmark (BASELINE.json config #4, first stage).

The reference's dense kernels + Cholesky cap it at N of a few hundred
(largest shipped dataset: IHDP, n=272; SURVEY.md §5). This measures the
chain-batched sampler at N=5000 in float32 on one chip — the single-chip
stage of the N=5k-50k roadmap (distributed kernel construction + blocked
Cholesky over the mesh is the multi-chip stage).

Usage: python benchmarks/large_n.py [N] [n_chains] [n_outer]
Prints one JSON line with seconds/outer-iteration and draws/s.
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
    n_chains = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_outer = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import jax

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import pandas as pd

    import causalgpslc_tpu as cg
    from causalgpslc_tpu.inference.gibbs import run_mcmc_jit
    from causalgpslc_tpu.models.spec import make_model_data

    rng = np.random.default_rng(0)
    obj = np.repeat(np.arange((n + 3) // 4), 4)[:n]
    df = pd.DataFrame({"T": rng.normal(size=n), "Y": rng.normal(size=n), "obj": obj})
    prepared = cg.prepare_data(df)
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    hp = cg.default_hyperparameters(
        n_u=1, n_outer=n_outer, n_mh_inner=10, n_es_inner=5, n_burn_in=1,
        n_chains=n_chains, mh_block_sweep=True,
    )
    pp = cg.default_prior_parameters()
    spec, data = make_model_data(prepared, n_u=hp.n_u, dtype=dtype)

    samples, _, _ = run_mcmc_jit(jax.random.PRNGKey(0), spec, pp, data, hp)
    np.asarray(samples.ty_ls)  # sync (block_until_ready is a no-op on axon)

    t0 = time.perf_counter()
    samples, _, _ = run_mcmc_jit(jax.random.PRNGKey(1), spec, pp, data, hp)
    host = np.asarray(samples.ty_ls)
    wall = time.perf_counter() - t0

    assert np.isfinite(host).all(), "non-finite samples at large N"
    print(
        json.dumps(
            {
                "metric": f"large_n_secs_per_outer (N={n}, chains={n_chains}, {jax.devices()[0].platform})",
                "secs_per_outer": round(wall / n_outer, 3),
                "draws_per_sec": round(n_chains * n_outer / wall, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
