"""Matched-horizon kernel search for statistical efficiency (round 5).

The round-4 wall decomposition proved the bench program sits at the axon
runtime's dispatch floor, so ess/s can only improve through ESS-per-draw —
the Markov kernel, not the runtime (VERDICT r4 item 1). Mixing is a property
of the KERNEL, not the backend, so the broad search over exact-kernel
variants runs on CPU at the bench shape (N=500, 16 chains, 48 outer,
float32, chunked runner — the identical program structure bench.py times on
the chip), and only the winners go to the TPU for wall measurement
(benchmarks/ess_study.py -> BASELINE.md matrix).

Each config also gets a PREDICTED TPU wall from the round-4 phase-cost
model (BASELINE.md "Phase table", all terms measured on-chip):
    mh segment  ~ 0.165 s entry + 0.0199 s x sweeps x (evals_per_sweep / 8)
    es segment  ~ 0.19 s first sweep + 0.017 s per further sweep
    per outer   = sum over gibbs rounds; x 48 outer, + ~0.5 s fixed
The model RANKS candidates; the finalists' walls are measured, never
modeled, before any headline claim.

Usage:
    python benchmarks/ess_search.py --list
    python benchmarks/ess_search.py --config 3            # one config
    python benchmarks/ess_search.py --all [--jobs 4]      # orchestrate
Results append to benchmarks/ess_search_results.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
OUT = pathlib.Path(__file__).resolve().parent / "ess_search_results.jsonl"

N = 500
N_CHAINS = 16
N_OUTER = 48
CHUNK = 8
SEEDS = (1, 2, 3)

# NoCov continuous-T model (the bench model): fields and their classes
LS_FIELDS = ("ty_ls", "ut_ls", "uy_ls")
NOISE_SCALE_FIELDS = ("u_noise", "t_noise", "y_noise", "t_scale", "y_scale")


def _site(fields, drift=0.5, wd=0.0, wp=0.0):
    return tuple((f, drift, wd, wp) for f in fields)


# Each entry: (name, hp_overrides). All are EXACT kernels for the same
# posterior (per-site mixtures/DR/interleaving preserve invariance; inner
# budget changes are plain schedule choices as in the reference config).
CONFIGS = [
    ("control_wide100_p03", {}),
    # -- per-site wide mixtures: jumps only where plateaus are --------------
    ("ls_only_wide", {"mh_site_proposals": _site(NOISE_SCALE_FIELDS)}),
    ("ls_wide_p05", {"mh_site_proposals": _site(NOISE_SCALE_FIELDS) + _site(LS_FIELDS, 0.5, 100.0, 0.5)}),
    ("ls_wide_p07", {"mh_site_proposals": _site(NOISE_SCALE_FIELDS) + _site(LS_FIELDS, 0.5, 100.0, 0.7)}),
    ("ls_wide300_p03", {"mh_site_proposals": _site(NOISE_SCALE_FIELDS) + _site(LS_FIELDS, 0.5, 300.0, 0.3)}),
    ("ls_wide300_p05", {"mh_site_proposals": _site(NOISE_SCALE_FIELDS) + _site(LS_FIELDS, 0.5, 300.0, 0.5)}),
    # -- narrow-drift retuning of the tight sites ---------------------------
    ("ns_drift1", {"mh_site_proposals": _site(NOISE_SCALE_FIELDS, 1.0)}),
    ("ns_drift025", {"mh_site_proposals": _site(NOISE_SCALE_FIELDS, 0.25)}),
    # -- delayed rejection on the slow lengthscales -------------------------
    ("dr_tyls", {"mh_dr_fields": ("ty_ls",)}),
    ("dr_ls_all", {"mh_dr_fields": LS_FIELDS}),
    # -- interleaved MH/ES rounds ------------------------------------------
    ("rounds2", {"gibbs_rounds": 2}),
    ("rounds2_ls_wide_p05", {"gibbs_rounds": 2, "mh_site_proposals": _site(NOISE_SCALE_FIELDS) + _site(LS_FIELDS, 0.5, 100.0, 0.5)}),
    # -- inner-budget schedule search at the same outer horizon -------------
    ("mh5_es5", {"n_mh_inner": 5}),
    ("mh15_es5", {"n_mh_inner": 15}),
    ("mh20_es5", {"n_mh_inner": 20}),
    ("mh10_es2", {"n_es_inner": 2}),
    ("mh10_es3", {"n_es_inner": 3}),
]


def predicted_tpu_wall(hp) -> float:
    """Round-4 phase-cost model, see module docstring. Returns seconds."""
    n_moves = 8  # NoCov site sweep
    dr_fields = hp.mh_dr_fields or ()
    evals_per_sweep = n_moves + len(dr_fields)  # DR moves cost 2 evals
    rounds = hp.gibbs_rounds
    mh_total, es_total = hp.n_mh_inner, hp.n_es_inner
    base, rem = divmod(mh_total, rounds)
    mh_counts = [base + (1 if r >= rounds - rem else 0) for r in range(rounds)]
    base, rem = divmod(es_total, rounds)
    es_counts = [base + (1 if r >= rounds - rem else 0) for r in range(rounds)]
    per_outer = 0.0
    for r in range(rounds):
        per_outer += 0.165 + 0.0199 * mh_counts[r] * (evals_per_sweep / n_moves)
        if es_counts[r] > 0:
            per_outer += 0.19 + 0.017 * (es_counts[r] - 1)
    return 48 * per_outer * 0.85 + 0.5  # 0.85: model-vs-measured calibration (31.7/37.2)


def run_config(idx: int) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import causalgpslc_tpu as cg
    from causalgpslc_tpu.diagnostics import effective_sample_size
    from causalgpslc_tpu.models.spec import make_model_data
    from causalgpslc_tpu.parallel.checkpoint import run_mcmc_checkpointed

    sys.path.insert(0, str(ROOT))
    from bench import make_synthetic

    name, overrides = CONFIGS[idx]
    rng = np.random.default_rng(0)
    prepared = cg.prepare_data(make_synthetic(N, rng))
    hp = cg.default_hyperparameters(
        n_u=1, n_outer=N_OUTER, n_mh_inner=10, n_es_inner=5,
        n_burn_in=max(1, N_OUTER // 6), n_chains=N_CHAINS,
        inner_unroll=False, mh_wide_drift=100.0, mh_wide_prob=0.3,
        ess_spec_batch=1,
        **overrides,
    )
    pp = cg.default_prior_parameters()
    import jax.numpy as jnp

    spec, data = make_model_data(prepared, n_u=hp.n_u, dtype=jnp.float32)

    retained = None
    per_seed = []
    t0 = time.perf_counter()
    for seed in SEEDS:
        samples, stats, _ = run_mcmc_checkpointed(
            jax.random.PRNGKey(seed), spec, pp, data, hp,
            checkpoint_path=None, checkpoint_every=CHUNK,
        )
        retained = np.asarray(hp.retained_indices())
        ess_vals = {
            f: float(effective_sample_size(np.asarray(getattr(samples, f))[:, retained]))
            for f in ("ty_ls", "y_noise", "y_scale")
        }
        per_seed.append(ess_vals)
    cpu_wall = time.perf_counter() - t0

    min_ess = [min(d.values()) for d in per_seed]
    pred_wall = predicted_tpu_wall(hp)
    rec = {
        "config": name,
        "idx": idx,
        "overrides": {k: str(v) for k, v in overrides.items()},
        "seeds": list(SEEDS),
        "ess_by_seed": per_seed,
        "min_ess_by_seed": min_ess,
        "min_ess_mean": float(np.mean(min_ess)),
        "min_ess_worst": float(np.min(min_ess)),
        "n_retained": len(retained),
        "pred_tpu_wall_s": round(pred_wall, 2),
        "pred_ess_per_s": round(float(np.mean(min_ess)) / pred_wall, 3),
        "cpu_wall_s_3seeds": round(cpu_wall, 1),
    }
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--jobs", type=int, default=4)
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()

    if args.list:
        for i, (name, ov) in enumerate(CONFIGS):
            print(f"{i:2d}  {name}  {ov}")
        return

    if args.config is not None:
        rec = run_config(args.config)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec))
        return

    if args.all:
        procs: dict[int, subprocess.Popen] = {}
        pending = list(range(len(CONFIGS)))
        failures = []
        while pending or procs:
            while pending and len(procs) < args.jobs:
                i = pending.pop(0)
                procs[i] = subprocess.Popen(
                    [sys.executable, __file__, "--config", str(i)],
                    stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
                )
            for i, p in list(procs.items()):
                if p.poll() is not None:
                    if p.returncode != 0:
                        err = p.stderr.read().decode()[-2000:]
                        failures.append((i, err))
                        print(f"[search] config {i} FAILED:\n{err}", file=sys.stderr)
                    else:
                        print(f"[search] config {i} ({CONFIGS[i][0]}) done")
                    del procs[i]
            time.sleep(5)
        print(f"[search] complete, {len(failures)} failures -> {OUT}")


if __name__ == "__main__":
    main()
