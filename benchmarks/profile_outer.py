"""Direct on-chip decomposition of the bench outer-iteration wall (round 4).

VERDICT.md (round 3) flagged the wall decomposition as "unprofiled and
internally inconsistent": BASELINE.md attributed the ~0.36 s/outer floor to
"elliptical-slice While iterations plus fixed per-program overhead" while also
recording that cutting ES sweeps 5->1 left wall unchanged — those can't both
hold. This script replaces inference-from-budget-scaling with DIRECT
measurement: each phase of the outer step runs in isolation under the exact
bench execution harness (16 vmapped chains, 48 outer iterations in 6 jitted
chunks of 8, host transfer per chunk), so per-phase wall attributions are
measured, not derived.

Probes (all N=500, 16 chains, f32, wide mixture (100, 0.3), rolled inner
loops — the bench default config):

  empty      scan body = one trivial key-dependent param update
             -> chunked-scan + dispatch floor
  setup      scan body = compute_block_lps + ESS prior cov + blocked Cholesky
             (the per-outer fixed work every variant pays before any move)
  mh1_es0    hp(n_mh_inner=1, n_es_inner=0)   -> setup + 1 MH sweep
  mh10_es0   hp(n_mh_inner=10, n_es_inner=0)  -> + 9 more MH sweeps
  mh1_es1    hp(n_mh_inner=1, n_es_inner=1)   -> + ESS setup + 1 ES sweep
  mh1_es5    hp(n_mh_inner=1, n_es_inner=5)   -> + 4 more ES sweeps
  full       hp(n_mh_inner=10, n_es_inner=5)  -> the bench program itself

Derived attributions (printed and saved to benchmarks/profile_r04.json):
  scan/dispatch floor  = empty
  per-outer setup      = setup - empty
  per-MH-sweep         = (mh10_es0 - mh1_es0) / 9
  ESS overhead+1 sweep = mh1_es1 - mh1_es0
  per-extra-ES-sweep   = (mh1_es5 - mh1_es1) / 4
  additivity check     = mh1_es0 + 9*per-MH + (mh1_es1-mh1_es0)
                         + 4*per-ES  vs the measured full wall

Also records stats.ess_iters (mean + per-outer max across the 16 vmapped
lanes — the executed While iteration count is the lane max) and, if the
backend supports it, a jax.profiler device trace of one full chunk.

Run on the TPU:  python benchmarks/profile_outer.py
(CPU smoke:      JAX_PLATFORMS=cpu python benchmarks/profile_outer.py  — the
walls are meaningless off-chip but the harness is exercised.)
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
TRACE_DIR = os.environ.get("PROFILE_TRACE_DIR", "/tmp/gpslc-trace-r04")


def log(msg):
    print(f"[profile {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    import causalgpslc_tpu as cg
    from causalgpslc_tpu.models.blocks import compute_block_lps, u_cov
    from causalgpslc_tpu.models.spec import make_model_data
    from causalgpslc_tpu.models.state import init_from_prior
    from causalgpslc_tpu.ops.blocked_chol import blocked_cholesky
    from causalgpslc_tpu.ops.linalg import quantum_free_mode, stabilize_cov
    from causalgpslc_tpu.parallel.checkpoint import run_mcmc_checkpointed

    from bench import make_synthetic  # same synthetic dataset as the bench

    platform = jax.devices()[0].platform
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    log(f"platform={platform} dtype={dtype.__name__}")

    rng = np.random.default_rng(0)
    prepared = cg.prepare_data(make_synthetic(N, rng))
    pp = cg.default_prior_parameters()

    def make_hp(n_mh, n_es):
        return cg.default_hyperparameters(
            n_u=1,
            n_outer=N_OUTER,
            n_mh_inner=n_mh,
            n_es_inner=n_es,
            n_burn_in=max(1, N_OUTER // 6),
            n_chains=N_CHAINS,
            inner_unroll=False,
            mh_wide_drift=100.0,
            mh_wide_prob=0.3,
        )

    hp_full = make_hp(10, 5)
    spec, data = make_model_data(prepared, n_u=hp_full.n_u, dtype=dtype)
    priors = dict(pp)

    results: dict = {"config": {"N": N, "chains": N_CHAINS, "outer": N_OUTER, "chunk": CHUNK, "platform": platform}}

    # ---- hp-variant probes via the real chunked runner ---------------------
    def run_variant(hp, seed):
        samples, stats, _ = run_mcmc_checkpointed(
            jax.random.PRNGKey(seed), spec, priors, data, hp,
            checkpoint_path=None, checkpoint_every=CHUNK,
        )
        return samples, stats

    def time_variant(name, hp):
        log(f"probe {name}: warmup/compile ...")
        t0 = time.perf_counter()
        run_variant(hp, 0)
        log(f"probe {name}: warmup done in {time.perf_counter()-t0:.1f}s; timing ...")
        t0 = time.perf_counter()
        _, stats = run_variant(hp, 1)
        wall = time.perf_counter() - t0
        results[name] = {"wall_s": round(wall, 3), "s_per_outer": round(wall / N_OUTER, 4)}
        if stats is not None and getattr(stats, "ess_iters", None) is not None:
            it = np.asarray(stats.ess_iters)  # (chains, outer)
            results[name]["ess_iters_mean"] = round(float(it.mean()), 2)
            results[name]["ess_iters_lane_max_mean"] = round(float(it.max(axis=0).mean()), 2)
        log(f"probe {name}: wall={wall:.2f}s  {json.dumps(results[name])}")
        return wall

    # ---- hand-written probes (empty scan / setup-only) ---------------------
    qf = quantum_free_mode(dtype)

    def make_hand_step(kind):
        def step(params, key):
            if kind == "empty":
                bump = jax.random.uniform(key, dtype=dtype) * 1e-6
                return params._replace(y_noise=params.y_noise + bump)
            # setup: the per-outer fixed work before any MH/ES move — full
            # block lps + the ESS prior covariance factorization.
            lps = compute_block_lps(spec, data, params)
            covs = stabilize_cov(u_cov(data, params)[None])
            if qf is not None:
                facs = blocked_cholesky(covs, use_pallas=qf == "pallas")
                s = jnp.sum(facs.l[0, : spec.n, : spec.n])
            else:
                s = jnp.sum(jnp.linalg.cholesky(covs)[0])
            total = lps.t + lps.y + (lps.u if lps.u is not None else 0.0) + s
            # fold the result into the carried state with a tiny but nonzero
            # weight: keeps every op live AND iteration-dependent (defeats
            # both DCE and loop-invariant hoisting) without perturbing the
            # parameter scale.
            return params._replace(y_noise=params.y_noise + total * jnp.asarray(1e-12, dtype))
        return step

    def time_hand(name, kind):
        step = make_hand_step(kind)

        from functools import partial

        @partial(jax.jit, static_argnames=("n_steps",))
        def run_chunk(params, chunk_key, n_steps):
            def body(p, k):
                p2 = step(p, k)
                return p2, p2.y_noise
            return jax.lax.scan(body, params, jax.random.split(chunk_key, n_steps))

        run_chunk_chains = jax.jit(
            jax.vmap(run_chunk, in_axes=(0, 0, None)), static_argnames=("n_steps",)
        )

        def run(seed):
            key = jax.random.PRNGKey(seed)
            chain_keys = jax.random.split(jax.random.fold_in(key, 0), N_CHAINS)
            params = jax.vmap(lambda k: init_from_prior(k, spec, priors, data, dtype=dtype))(chain_keys)
            done = 0
            last = None
            while done < N_OUTER:
                n = min(CHUNK, N_OUTER - done)
                key, sub = jax.random.split(key)
                cks = jax.random.split(sub, N_CHAINS)
                params, ys = run_chunk_chains(params, cks, n)
                last = np.asarray(ys)  # host transfer = the only true barrier
                done += n
            return last

        log(f"probe {name}: warmup/compile ...")
        t0 = time.perf_counter()
        run(0)
        log(f"probe {name}: warmup done in {time.perf_counter()-t0:.1f}s; timing ...")
        t0 = time.perf_counter()
        run(1)
        wall = time.perf_counter() - t0
        results[name] = {"wall_s": round(wall, 3), "s_per_outer": round(wall / N_OUTER, 4)}
        log(f"probe {name}: wall={wall:.2f}s")
        return wall

    w_empty = time_hand("empty", "empty")
    w_setup = time_hand("setup", "setup")
    w_mh1_es0 = time_variant("mh1_es0", make_hp(1, 0))
    w_mh10_es0 = time_variant("mh10_es0", make_hp(10, 0))
    w_mh1_es1 = time_variant("mh1_es1", make_hp(1, 1))
    w_mh1_es5 = time_variant("mh1_es5", make_hp(1, 5))
    w_full = time_variant("full", hp_full)

    per_mh = (w_mh10_es0 - w_mh1_es0) / 9.0
    ess_first = w_mh1_es1 - w_mh1_es0
    per_es = (w_mh1_es5 - w_mh1_es1) / 4.0
    predicted_full = w_mh1_es0 + 9 * per_mh + ess_first + 4 * per_es
    results["derived"] = {
        "scan_dispatch_floor_s_per_outer": round(w_empty / N_OUTER, 4),
        "setup_s_per_outer": round((w_setup - w_empty) / N_OUTER, 4),
        "per_mh_sweep_s_per_outer": round(per_mh / N_OUTER, 4),
        "per_mh_site_move_ms": round(per_mh / N_OUTER / 8 * 1000, 3),
        "ess_setup_plus_first_sweep_s_per_outer": round(ess_first / N_OUTER, 4),
        "per_extra_es_sweep_s_per_outer": round(per_es / N_OUTER, 4),
        "additivity_predicted_full_s": round(predicted_full, 2),
        "additivity_measured_full_s": round(w_full, 2),
        "additivity_gap_s": round(w_full - predicted_full, 2),
    }

    # ---- optional device trace of one full chunk ---------------------------
    trace_info = {"supported": False}
    try:
        from causalgpslc_tpu.diagnostics import profile_trace

        hp8 = make_hp(10, 5).replace(n_outer=CHUNK, n_burn_in=1)
        with profile_trace(TRACE_DIR):
            run_variant(hp8, 2)
        files = [str(p.relative_to(TRACE_DIR)) for p in pathlib.Path(TRACE_DIR).rglob("*") if p.is_file()]
        sizes = {f: (pathlib.Path(TRACE_DIR) / f).stat().st_size for f in files}
        trace_info = {"supported": bool(files), "dir": TRACE_DIR, "files": sizes}
    except Exception as e:  # pragma: no cover - backend dependent
        trace_info = {"supported": False, "error": repr(e)}
    results["profiler"] = trace_info

    out = ROOT / "benchmarks" / ("profile_r04.json" if platform != "cpu" else "profile_r04_cpu.json")
    out.write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
