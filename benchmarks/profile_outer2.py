"""Round-4 follow-up probes: resolve the per-outer While-entry premium.

profile_outer.py measured (on-chip, N=500, 16 chains, bench config):
  - marginal MH sweep inside the rolled fori: 0.0199 s/outer
  - but ONE sweep (mh1_es0, minus setup/floor): ~0.167 s/outer — 8.4x the
    marginal rate. The premium recurs EVERY outer iteration.

Competing mechanisms this script separates:
  H-entry   every entry into a (sizeable-body) While loop pays a fixed
            staging cost (~0.16 s); iterations after the first replay
            cheaply. Entries recur per enclosing-scan iteration.
  H-unroll  XLA unrolls trip-count-1 While loops, and straight-line code
            dispatches at a much worse rate than While-body replay
            (consistent with the round-3 scan_unroll=8 slowdown).

Probes:
  mh2_es0 / mh4_es0   fori linearity: wall/outer vs trip count. H-entry
                      predicts  floor+setup + E + m*0.02.
  mh1u_es0            n_mh_inner=1 with inner_unroll=True (explicit
                      straight-line sweep, no fori). == mh1_es0 under
                      H-unroll (XLA already unrolled it); cheaper under
                      H-entry (no loop entered at all -> no premium)...
                      unless straight-line pays the same streaming rate.
  mh3u_es0            3 straight-line sweeps: slope of the straight-line
                      dispatch rate per sweep.
  flat_mh             THE ATTACK PROBE: one scan over n_outer*10 steps whose
                      body is exactly one MH sweep (no inner fori). Same
                      total sweep count as mh10_es0 but ONE loop structure
                      per chunk. If the premium is per-entry (or per
                      outer-scan iteration), this runs at the marginal rate
                      and predicts the flattened-outer-step speedup.
  mh1_es2             first-vs-later ES sweep split refinement.

Writes benchmarks/profile2_r04.json.
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
    print(f"[probe2 {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    import causalgpslc_tpu as cg
    from causalgpslc_tpu.inference.mh import mh_sweep
    from causalgpslc_tpu.models.blocks import compute_block_lps
    from causalgpslc_tpu.models.spec import make_model_data
    from causalgpslc_tpu.models.state import init_from_prior
    from causalgpslc_tpu.parallel.checkpoint import run_mcmc_checkpointed

    from bench import make_synthetic

    platform = jax.devices()[0].platform
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    rng = np.random.default_rng(0)
    prepared = cg.prepare_data(make_synthetic(N, rng))
    pp = cg.default_prior_parameters()
    priors = dict(pp)

    def make_hp(n_mh, n_es, unroll=False):
        return cg.default_hyperparameters(
            n_u=1, n_outer=N_OUTER, n_mh_inner=n_mh, n_es_inner=n_es,
            n_burn_in=max(1, N_OUTER // 6), n_chains=N_CHAINS,
            inner_unroll=unroll, mh_wide_drift=100.0, mh_wide_prob=0.3,
        )

    spec, data = make_model_data(prepared, n_u=make_hp(10, 5).n_u, dtype=dtype)
    results = {"config": {"N": N, "chains": N_CHAINS, "outer": N_OUTER, "chunk": CHUNK, "platform": platform}}

    def time_variant(name, hp):
        def run(seed):
            samples, stats, _ = run_mcmc_checkpointed(
                jax.random.PRNGKey(seed), spec, priors, data, hp,
                checkpoint_path=None, checkpoint_every=CHUNK,
            )
            return stats
        log(f"{name}: warmup ...")
        t0 = time.perf_counter(); run(0)
        log(f"{name}: warmup {time.perf_counter()-t0:.1f}s; timing ...")
        t0 = time.perf_counter(); run(1)
        wall = time.perf_counter() - t0
        results[name] = {"wall_s": round(wall, 3), "s_per_outer": round(wall / N_OUTER, 4)}
        log(f"{name}: {json.dumps(results[name])}")
        return wall

    # ---- flat_mh: one scan of n_steps*10 single-sweep bodies per chunk -----
    wide = (100.0, 0.3)

    def flat_mh_probe():
        from functools import partial

        @partial(jax.jit, static_argnames=("n_steps",))
        def run_chunk(params, lps, chunk_key, n_steps):
            def body(carry, k):
                params, lps = carry
                params, lps, acc = mh_sweep(k, spec, priors, data, params, lps, None, wide)
                return (params, lps), params.ty_ls
            keys = jax.random.split(chunk_key, n_steps * 10)
            (params, lps), tys = jax.lax.scan(body, (params, lps), keys)
            return params, lps, tys

        run_chunks = jax.jit(
            jax.vmap(run_chunk, in_axes=(0, 0, 0, None)), static_argnames=("n_steps",)
        )

        def run(seed):
            key = jax.random.PRNGKey(seed)
            chain_keys = jax.random.split(jax.random.fold_in(key, 0), N_CHAINS)
            params = jax.vmap(lambda k: init_from_prior(k, spec, priors, data, dtype=dtype))(chain_keys)
            lps = jax.vmap(lambda p: compute_block_lps(spec, data, p))(params)
            done, out = 0, None
            while done < N_OUTER:
                n = min(CHUNK, N_OUTER - done)
                key, sub = jax.random.split(key)
                cks = jax.random.split(sub, N_CHAINS)
                params, lps, tys = run_chunks(params, lps, cks, n)
                out = np.asarray(tys)
                done += n
            return out

        log("flat_mh: warmup ...")
        t0 = time.perf_counter(); run(0)
        log(f"flat_mh: warmup {time.perf_counter()-t0:.1f}s; timing ...")
        t0 = time.perf_counter(); run(1)
        wall = time.perf_counter() - t0
        results["flat_mh"] = {
            "wall_s": round(wall, 3),
            "s_per_outer": round(wall / N_OUTER, 4),
            "s_per_sweep": round(wall / (N_OUTER * 10), 4),
            "note": "same 480 sweeps as mh10_es0, ONE scan per chunk (no inner fori)",
        }
        log(f"flat_mh: {json.dumps(results['flat_mh'])}")
        return wall

    time_variant("mh2_es0", make_hp(2, 0))
    time_variant("mh4_es0", make_hp(4, 0))
    time_variant("mh1u_es0", make_hp(1, 0, unroll=True))
    time_variant("mh3u_es0", make_hp(3, 0, unroll=True))
    flat_mh_probe()
    time_variant("mh1_es2", make_hp(1, 2))

    out = ROOT / "benchmarks" / ("profile2_r04.json" if platform != "cpu" else "profile2_r04_cpu.json")
    out.write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
