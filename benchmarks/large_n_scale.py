"""Large-N engine at TRUE scale (VERDICT r3 item 2): N >= 20k on one chip.

The sharded engine's reason to exist is the regime the dense engine cannot
enter (N ~ 50k); until round 4 it had only been executed at N=5000 on-chip.
This script runs the row-sharded machinery at N=20k (f32, 1-device n-mesh,
block=512 -> 40 panels, ~1.6 GB per (N, N) covariance) and records:

  - sharded GP block log-density (cov rows + distributed Cholesky + panel
    forward solve): wall per evaluation, finiteness
  - counterfactual conditioning (conditional_ite_large_n): s/sample
  - one full MCMC outer iteration at minimal budgets: s/outer (each jit
    call must stay under the axon service's ~20 s kill window, so budgets
    are nMHInner=1 / nESInner=1 and failures are recorded, not fatal)
  - device peak memory (memory_stats) after each stage

Usage: python benchmarks/large_n_scale.py [N] ; writes
benchmarks/large_n_scale_N{N}.json and prints it.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time
import traceback

import numpy as np

ROOT = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(ROOT))


def log(msg):
    print(f"[scale {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def peak_mb():
    import jax

    try:
        st = jax.local_devices()[0].memory_stats()
        return round(st.get("peak_bytes_in_use", 0) / 1e6)
    except Exception:
        return None


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    import jax

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from causalgpslc_tpu.hyperparameters import default_hyperparameters, default_prior_parameters
    from causalgpslc_tpu.models.spec import GPSLCParams
    from causalgpslc_tpu.parallel.large_n import (
        conditional_ite_large_n,
        n_mesh,
        run_mcmc_large_n,
        sharded_gp_logpdf,
    )

    platform = jax.devices()[0].platform
    mesh = n_mesh(1)
    dtype = jnp.float32
    results = {
        "config": {
            "N": n, "block": block, "platform": platform,
            "devices": mesh.devices.size, "dtype": "float32",
            "padded": -(-n // block) * block,
        }
    }

    rng = np.random.default_rng(0)
    group = 4
    counts = [group] * (n // group)
    t = rng.normal(size=n).astype(np.float32)
    y = (0.5 * t + rng.normal(size=n) * 0.4).astype(np.float32)
    u = rng.normal(size=(n, 1)).astype(np.float32)

    # ---- stage 1: one sharded GP block log-density -------------------------
    try:
        feats = np.concatenate([t[:, None] / 2.0, u / 1.5], axis=1)

        def eval_lp():
            v = sharded_gp_logpdf(feats, y, 1.3, 0.4, mesh=mesh, block=block)
            return float(np.asarray(v))  # host transfer = barrier

        log("stage 1: sharded_gp_logpdf compile ...")
        t0 = time.perf_counter()
        v = eval_lp()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        v = eval_lp()
        wall = time.perf_counter() - t0
        results["gp_logpdf"] = {
            "value": v, "finite": bool(np.isfinite(v)),
            "wall_s": round(wall, 3), "compile_s": round(compile_s, 1),
            "peak_mb": peak_mb(),
        }
        log(f"stage 1: {results['gp_logpdf']}")
    except Exception as e:
        results["gp_logpdf"] = {"error": repr(e)}
        log(f"stage 1 FAILED: {e}\n{traceback.format_exc()}")

    # ---- stage 2: counterfactual conditioning, one posterior sample --------
    try:
        params = GPSLCParams(
            u_noise=jnp.asarray(1.0, dtype), t_noise=jnp.asarray(0.5, dtype),
            y_noise=jnp.asarray(0.4, dtype), ut_ls=jnp.asarray([2.0], dtype),
            uy_ls=jnp.asarray([1.5], dtype), ty_ls=jnp.asarray(2.0, dtype),
            t_scale=jnp.asarray(1.0, dtype), y_scale=jnp.asarray(1.3, dtype),
            u=jnp.asarray(u, dtype),
            x_noise=None, x_scale=None, ux_ls=None, xt_ls=None, xy_ls=None,
            logit_t=None,
        )

        def ite_once():
            m, v, sm, sv = conditional_ite_large_n(
                params, t, y, 0.6, mesh=mesh, block=block, dtype=dtype
            )
            return np.asarray(m), float(sm), float(sv)

        log("stage 2: conditional_ite_large_n compile ...")
        t0 = time.perf_counter()
        m, sm, sv = ite_once()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        m, sm, sv = ite_once()
        wall = time.perf_counter() - t0
        results["conditional_ite"] = {
            "s_per_sample": round(wall, 3), "compile_s": round(compile_s, 1),
            "finite": bool(np.isfinite(m).all()),
            "sate_mean": sm, "sate_var": sv, "peak_mb": peak_mb(),
        }
        log(f"stage 2: {results['conditional_ite']}")
    except Exception as e:
        results["conditional_ite"] = {"error": repr(e)}
        log(f"stage 2 FAILED: {e}\n{traceback.format_exc()}")

    # ---- stage 3: one full MCMC outer iteration (minimal budgets) ----------
    try:
        hp = default_hyperparameters().replace(
            n_outer=1, n_mh_inner=1, n_es_inner=1, n_burn_in=1
        )

        def outer_once(seed):
            samples, stats, _ = run_mcmc_large_n(
                jax.random.key(seed), t, y, counts, hp=hp, mesh=mesh,
                block=block, dtype=dtype,
            )
            return float(np.asarray(stats.log_joint)[-1])

        log("stage 3: run_mcmc_large_n compile ...")
        t0 = time.perf_counter()
        lj = outer_once(0)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        lj = outer_once(1)
        wall = time.perf_counter() - t0
        results["mcmc_outer"] = {
            "s_per_outer": round(wall, 3), "compile_s": round(compile_s, 1),
            "log_joint": lj, "finite": bool(np.isfinite(lj)),
            "budgets": "nMHInner=1, nESInner=1", "peak_mb": peak_mb(),
        }
        log(f"stage 3: {results['mcmc_outer']}")
    except Exception as e:
        results["mcmc_outer"] = {"error": repr(e)}
        log(f"stage 3 FAILED: {e}\n{traceback.format_exc()}")

    out = ROOT / "benchmarks" / f"large_n_scale_N{n}.json"
    out.write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
