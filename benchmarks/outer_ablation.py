"""Component-level ablation of the bench-config outer iteration on TPU.

Times (with host-transfer barriers — block_until_ready does not synchronize
on the axon backend):
  1. stacked blocked Cholesky at the sweep's batch shape, pallas vs xla paths
  2. one MH blocked sweep (jitted alone)
  3. outer step with {n_mh_inner, n_es_inner} ablated
so the per-outer wall budget (BASELINE.md: ~0.47 s at N=500, 16 chains)
can be attributed to MH sweeps / ESS / factorization / overhead.

Usage: python benchmarks/outer_ablation.py   (TPU; serialize with other jobs)
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
N = int(os.environ.get("ABL_N", 500))
CHAINS = int(os.environ.get("ABL_CHAINS", 16))
REPS = int(os.environ.get("ABL_REPS", 5))
# "chol,sweep,outer" — outer-step variants each pay a multi-minute remote
# compile on the axon backend; select parts to keep runs cheap.
PARTS = set(os.environ.get("ABL_PARTS", "chol,sweep").split(","))


def timeit(fn, *args, reps=REPS):
    out = fn(*args)
    np.asarray(jax_leaf(out))  # warm + barrier
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax_leaf(out))
    return (time.perf_counter() - t0) / reps


def jax_leaf(tree):
    import jax

    leaves = [l for l in jax.tree.leaves(tree) if hasattr(l, "dtype")]
    return leaves[0]


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    import causalgpslc_tpu as cg
    from causalgpslc_tpu.inference.gibbs import make_outer_step
    from causalgpslc_tpu.inference.mh import block_sites, mh_blocked_sweep
    from causalgpslc_tpu.models.blocks import compute_block_lps
    from causalgpslc_tpu.models.spec import make_model_data
    from causalgpslc_tpu.models.state import init_from_prior
    from causalgpslc_tpu.ops import blocked_chol as bc
    from causalgpslc_tpu.ops.linalg import stacked_mvn_logliks

    import pandas as pd

    rng = np.random.default_rng(0)
    obj = np.repeat(np.arange((N + 3) // 4), 4)[:N]
    df = pd.DataFrame({"T": rng.normal(size=N), "Y": rng.normal(size=N), "obj": obj})
    prepared = cg.prepare_data(df)
    pp = cg.default_prior_parameters()
    dtype = jnp.float32
    spec, data = make_model_data(prepared, n_u=1, dtype=dtype)
    results = {}

    # --- 1. stacked Cholesky at sweep batch shape ------------------------
    b = (1 + 1 + 1) * CHAINS  # u, t, y covs x chains (NoCov variant)
    if "chol" in PARTS:
        a = rng.normal(size=(b, N, 8)).astype(np.float32)
        cov_np = np.einsum("bik,bjk->bij", a, a) / 8 + 3.0 * np.eye(N, dtype=np.float32)
        cov = jnp.asarray(cov_np)

        f_pallas = jax.jit(lambda c: bc.blocked_cholesky(c, use_pallas=True).l)
        f_xbase = jax.jit(lambda c: bc.blocked_cholesky(c, use_pallas=False).l)
        f_xla = jax.jit(jnp.linalg.cholesky)
        results[f"chol_pallas_({b},{N})"] = timeit(f_pallas, cov)
        results[f"chol_xlabase_({b},{N})"] = timeit(f_xbase, cov)
        results[f"chol_xla_({b},{N})"] = timeit(f_xla, cov)

        ys = jnp.asarray(rng.normal(size=(b, N)).astype(np.float32))
        f_loglik = jax.jit(stacked_mvn_logliks)
        results[f"stacked_logliks_({b},{N})"] = timeit(f_loglik, cov, ys)

    # --- 2. one blocked MH sweep (vmapped over chains) -------------------
    keys = jax.random.split(jax.random.PRNGKey(0), CHAINS)
    params0 = jax.vmap(
        lambda k: init_from_prior(k, spec, pp, data, dtype=dtype)
    )(keys)
    lps0 = jax.vmap(lambda p: compute_block_lps(spec, data, p))(params0)

    if "sweep" in PARTS:
        def one_sweep(key, params, lps):
            return mh_blocked_sweep(key, spec, pp, data, params, lps)

        f_sweep = jax.jit(jax.vmap(one_sweep))
        results["mh_blocked_sweep_x1"] = timeit(f_sweep, keys, params0, lps0)

        f_lps = jax.jit(jax.vmap(lambda p: compute_block_lps(spec, data, p)))
        results["compute_block_lps"] = timeit(f_lps, params0)

    # --- 3. outer step ablations -----------------------------------------
    if "outer" in PARTS:
        for label, mh, es in [
            ("outer_mh10_es5", 10, 5),
            ("outer_mh10_es0", 10, 0),
            ("outer_mh1_es0", 1, 0),
        ]:
            hp = cg.default_hyperparameters(
                n_u=1,
                n_outer=1,
                n_mh_inner=mh,
                n_es_inner=es,
                n_burn_in=1,
                n_chains=CHAINS,
                mh_block_sweep=True,
            )
            step = make_outer_step(spec, pp, hp)
            f_step = jax.jit(jax.vmap(lambda p, k: step(p, data, k)))
            ks = jax.random.split(jax.random.PRNGKey(1), CHAINS)
            results[label] = timeit(f_step, params0, ks)

    for k, v in results.items():
        print(f"{k:36s} {v * 1e3:9.2f} ms")
    print(json.dumps({k: round(v * 1e3, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
