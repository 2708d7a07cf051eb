"""doT-grid batching measurement (VERDICT r4 item 5, measured half).

Compares the batched (grid x sample)-paired sharded conditioning program
(``ite_distributions_grid_large_n``) against the former per-grid-point host
loop (``ite_distributions_large_n`` called once per point) at the VERDICT
configuration: N=5000, S=15 posterior samples, 101 grid points, one chip.

Dispatch counts are exact (both paths are deterministic host loops around
one compiled program): batched = ceil(G*S/B), loop = G * ceil(S/B).
Equivalence of the two paths is tested on the CPU mesh
(tests/test_large_n.py::test_grid_batched_conditioning_matches_per_point_loop);
this script records the on-chip WALL for both.

Usage: python benchmarks/grid_batch_bench.py [N] [S] [fidelity] [batch]
Writes benchmarks/grid_batch_bench.json.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(ROOT))


def log(msg):
    print(f"[grid {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    n_s = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    fidelity = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    batch = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    import jax

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from causalgpslc_tpu.models.spec import GPSLCParams
    from causalgpslc_tpu.parallel.large_n import (
        ite_distributions_grid_large_n,
        ite_distributions_large_n,
        n_mesh,
    )

    block = 512
    mesh = n_mesh(1)
    dtype = jnp.float32
    n_g = fidelity + 1

    rng = np.random.default_rng(0)
    t = rng.normal(size=n).astype(np.float32)
    y = (0.5 * t + rng.normal(size=n) * 0.4).astype(np.float32)
    u = rng.normal(size=(n, n_s, 1)).astype(np.float32)  # per-sample U columns

    def stack(v):
        return jnp.asarray(np.asarray(v), dtype)

    samples = GPSLCParams(
        u_noise=stack(np.full(n_s, 1.0)), t_noise=stack(np.full(n_s, 0.5)),
        y_noise=stack(rng.uniform(0.3, 0.5, n_s)),
        ut_ls=stack(np.full((n_s, 1), 2.0)),
        uy_ls=stack(rng.uniform(1.2, 1.8, (n_s, 1))),
        ty_ls=stack(rng.uniform(1.5, 2.5, n_s)),
        t_scale=stack(np.full(n_s, 1.0)), y_scale=stack(rng.uniform(1.0, 1.5, n_s)),
        u=stack(np.transpose(u, (1, 0, 2))),
    )
    grid = np.linspace(float(t.min()), float(t.max()), n_g)

    results = {
        "config": {
            "N": n, "S": n_s, "grid_points": n_g, "pair_batch": batch,
            "block": block, "platform": jax.devices()[0].platform,
            "dispatches_batched": -(-n_g * n_s // batch),
            "dispatches_loop": n_g * -(-n_s // batch),
        }
    }

    # ---- batched (grid x sample) program -----------------------------------
    def run_batched():
        m, v, sm, sv = ite_distributions_grid_large_n(
            samples, t, y, grid, mesh=mesh, block=block, pair_batch=batch,
            dtype=dtype, col_chunk=None,
        )
        return np.asarray(m)

    log("batched: compile ...")
    t0 = time.perf_counter()
    m_b = run_batched()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    m_b = run_batched()
    wall_b = time.perf_counter() - t0
    results["batched"] = {
        "wall_s": round(wall_b, 2), "compile_s": round(compile_s, 1),
        "finite": bool(np.isfinite(m_b).all()),
    }
    log(f"batched: {results['batched']}")

    # ---- former per-grid-point host loop -----------------------------------
    def run_loop():
        out = []
        for g in grid:
            m, v, sm, sv = ite_distributions_large_n(
                samples, t, y, float(g), mesh=mesh, block=block,
                sample_batch=batch, dtype=dtype, col_chunk=None,
            )
            out.append(np.asarray(m))
        return np.stack(out)

    log("loop: compile ...")
    t0 = time.perf_counter()
    m_l = run_loop()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    m_l = run_loop()
    wall_l = time.perf_counter() - t0
    results["per_point_loop"] = {
        "wall_s": round(wall_l, 2), "compile_s": round(compile_s, 1),
        "finite": bool(np.isfinite(m_l).all()),
    }
    results["speedup"] = round(wall_l / wall_b, 2)
    results["max_abs_diff"] = float(np.max(np.abs(m_b - m_l)))
    log(f"loop: {results['per_point_loop']}  speedup={results['speedup']}x")

    out_path = ROOT / "benchmarks" / f"grid_batch_bench_S{n_s}.json"
    out_path.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
