"""Pod scaling benchmark: ESS/s of the chain-sharded sampler vs host count.

The north star (BASELINE.json) includes ">=0.9 linear ESS/s scaling 1->4
hosts". This container has one chip, so the curve cannot be measured here —
this script is the POD-READY artifact (VERDICT r3 item 5): it initializes
``jax.distributed``, shards a fixed per-device chain count over the global
chain mesh via the chunked sharded runner (pooled cross-host adaptation
rides the same path), and prints ONE JSON line with ess/s for THIS job size.
Run it at 1, 2, 4 hosts and divide: the ratio against the 1-host value is
the scaling curve. Chains are independent, data is replicated, and the only
cross-host traffic is the per-chunk pooled-statistics all-reduce — the
expected curve is flat-per-chip (linear total) until the DCN all-reduce
matters.

Process-group wiring (all optional — on a real TPU pod slice everything
auto-detects and the script is just ``python bench_pod.py`` per host):
  BENCH_POD_COORD  coordinator host:port
  BENCH_POD_NPROCS world size
  BENCH_POD_RANK   this process's rank
Workload knobs: BENCH_N (500), BENCH_CHAINS_PER_DEV (16), BENCH_OUTER (48),
BENCH_CHUNK (8), BENCH_ADAPT (0), BENCH_FLAT (1).

Known-runnable without a pod: ``tests/test_multihost.py::
test_bench_pod_two_process_smoke`` runs this script as 2 coordinated CPU
processes (2 virtual devices each) and checks both ranks print consistent
results.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).parent


def main():
    import jax

    coord = os.environ.get("BENCH_POD_COORD")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["BENCH_POD_NPROCS"]),
            process_id=int(os.environ["BENCH_POD_RANK"]),
        )
    elif os.environ.get("BENCH_POD_AUTO"):
        jax.distributed.initialize()  # TPU pod auto-detection

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    import causalgpslc_tpu as cg
    from causalgpslc_tpu.diagnostics import effective_sample_size
    from causalgpslc_tpu.models.spec import make_model_data
    from causalgpslc_tpu.parallel.checkpoint import run_mcmc_checkpointed
    from causalgpslc_tpu.parallel.multihost import global_chain_mesh

    from bench import make_synthetic, _wide_drift_from_env

    n = int(os.environ.get("BENCH_N", 500))
    chains_per_dev = int(os.environ.get("BENCH_CHAINS_PER_DEV", 16))
    n_outer = int(os.environ.get("BENCH_OUTER", 48))
    chunk = int(os.environ.get("BENCH_CHUNK", 8))

    n_hosts = jax.process_count()
    n_dev = len(jax.devices())
    n_chains = chains_per_dev * n_dev
    mesh = global_chain_mesh()
    platform = jax.devices()[0].platform
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    rng = np.random.default_rng(0)  # same dataset on every host
    prepared = cg.prepare_data(make_synthetic(n, rng))
    hp = cg.default_hyperparameters(
        n_u=1,
        n_outer=n_outer,
        n_mh_inner=int(os.environ.get("BENCH_MH_INNER", 10)),
        n_es_inner=int(os.environ.get("BENCH_ES_INNER", 5)),
        n_burn_in=max(1, n_outer // 6),
        n_chains=n_chains,
        adapt_proposals=os.environ.get("BENCH_ADAPT", "0") == "1",
        inner_unroll=False,
        mh_wide_drift=_wide_drift_from_env(),
        mh_wide_prob=float(os.environ.get("BENCH_WIDE_PROB", 0.3)),
        flat_execution=os.environ.get("BENCH_FLAT", "1") == "1",
    )
    pp = cg.default_prior_parameters()
    spec, data = make_model_data(prepared, n_u=hp.n_u, dtype=dtype)

    def run(seed):
        samples, _, _ = run_mcmc_checkpointed(
            jax.random.PRNGKey(seed), spec, pp, data, hp,
            checkpoint_path=None, checkpoint_every=chunk, mesh=mesh,
        )
        return samples  # local chain rows under multi-process execution

    run(0)  # compile + warmup
    t0 = time.perf_counter()
    samples = run(1)
    wall = time.perf_counter() - t0

    # global min-ESS: gather every host's (local_chains, n_outer) site traces
    retained = np.asarray(hp.retained_indices())

    def global_trace(leaf):
        local = np.asarray(leaf)[:, retained]
        if jax.process_count() == 1:
            return local
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(local)).reshape(
            (-1, len(retained))
        )

    ess_vals = [
        effective_sample_size(global_trace(getattr(samples, f)))
        for f in ("ty_ls", "y_noise", "y_scale")
    ]
    min_ess = float(np.min(ess_vals))
    result = {
        "metric": f"pod_ess_per_s (GPSLC MCMC, N={n}, {platform})",
        "value": round(min_ess / wall, 4),
        "unit": "ess/s",
        "hosts": n_hosts,
        "devices": n_dev,
        "chains": n_chains,
        "wall_s": round(wall, 3),
        "min_ess": round(min_ess, 2),
        "ess_per_s_per_device": round(min_ess / wall / n_dev, 4),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
