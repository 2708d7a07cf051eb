"""Round-4 probe set 3: why did the full flat program not beat the rolled one?

bench (BENCH_FLAT=1) measured 36.9 s vs 31.9 s rolled — bit-identical ESS
(63.04) but slower — while the pure-MH flat probe (profile_outer2.py
``flat_mh``) ran sweeps at the cheap replay rate (0.0245 s/sweep). The full
flat program differs in three ways: lax.switch dispatch, the nested ESS
angle while_loop inside the ES branch, and a bigger carry (frozen factors).

Probes (bench config shapes, 48 outer, chunks of 8):
  flat_mh10_es0     hp(10, 0) flat     — switch + big carry, NO nested while.
                    ~0.27 s/outer -> switch/carry fine, the ESS while is the
                    poison; ~0.55+ -> switch or carry poisons replay.
  rolled_spec16     hp(10, 5) rolled, ess_spec_batch=16 — 16 candidate
                    angles per ESS round in one batched likelihood call:
                    while trip counts collapse (lane-max ~37 -> ~3), bodies
                    get 16x wider. Bit-identical samples (round-3 exactness
                    property of the speculative scheduler).
  flat_spec16       hp(10, 5) flat, ess_spec_batch=16 — the candidate fix:
                    flat MH replay + ESS with almost no while iterations.

Writes benchmarks/profile3_r04.json.
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

N = int(os.environ.get("BENCH_N", 500))
N_CHAINS = int(os.environ.get("BENCH_CHAINS", 16))
N_OUTER = int(os.environ.get("BENCH_OUTER", 48))
CHUNK = int(os.environ.get("BENCH_CHUNK", 8))


def log(msg):
    print(f"[probe3 {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    import causalgpslc_tpu as cg
    from causalgpslc_tpu.models.spec import make_model_data
    from causalgpslc_tpu.parallel.checkpoint import run_mcmc_checkpointed

    from bench import make_synthetic

    platform = jax.devices()[0].platform
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    rng = np.random.default_rng(0)
    prepared = cg.prepare_data(make_synthetic(N, rng))
    pp = cg.default_prior_parameters()
    priors = dict(pp)

    def make_hp(n_mh, n_es, flat=False, spec_batch=1):
        return cg.default_hyperparameters(
            n_u=1, n_outer=N_OUTER, n_mh_inner=n_mh, n_es_inner=n_es,
            n_burn_in=max(1, N_OUTER // 6), n_chains=N_CHAINS,
            inner_unroll=False, mh_wide_drift=100.0, mh_wide_prob=0.3,
            flat_execution=flat, ess_spec_batch=spec_batch,
        )

    spec, data = make_model_data(prepared, n_u=1, dtype=dtype)
    results = {"config": {"N": N, "chains": N_CHAINS, "outer": N_OUTER, "chunk": CHUNK, "platform": platform}}

    def time_variant(name, hp, record_ess=False):
        def run(seed):
            samples, stats, _ = run_mcmc_checkpointed(
                jax.random.PRNGKey(seed), spec, priors, data, hp,
                checkpoint_path=None, checkpoint_every=CHUNK,
            )
            return samples, stats
        log(f"{name}: warmup ...")
        t0 = time.perf_counter(); run(0)
        log(f"{name}: warmup {time.perf_counter()-t0:.1f}s; timing ...")
        t0 = time.perf_counter(); samples, stats = run(1)
        wall = time.perf_counter() - t0
        results[name] = {"wall_s": round(wall, 3), "s_per_outer": round(wall / N_OUTER, 4)}
        if record_ess:
            from causalgpslc_tpu.diagnostics import effective_sample_size

            retained = np.asarray(hp.retained_indices())
            ess_vals = [
                effective_sample_size(np.asarray(getattr(samples, f))[:, retained])
                for f in ("ty_ls", "y_noise", "y_scale")
            ]
            results[name]["min_ess"] = round(float(np.min(ess_vals)), 2)
            results[name]["ess_per_s"] = round(float(np.min(ess_vals)) / wall, 3)
            it = np.asarray(stats.ess_iters)
            results[name]["ess_iters_lane_max_mean"] = round(float(it.max(axis=0).mean()), 2)
        log(f"{name}: {json.dumps(results[name])}")
        return wall

    time_variant("flat_mh10_es0", make_hp(10, 0, flat=True))
    time_variant("rolled_spec16", make_hp(10, 5, flat=False, spec_batch=16), record_ess=True)
    time_variant("flat_spec16", make_hp(10, 5, flat=True, spec_batch=16), record_ess=True)

    out = ROOT / "benchmarks" / ("profile3_r04.json" if platform != "cpu" else "profile3_r04_cpu.json")
    out.write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
