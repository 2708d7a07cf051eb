"""Round-5 matched-horizon kernel study on the real chip.

VERDICT r4 item 1: the runtime floor is proven (BASELINE.md r4), so ess/s
can only move through ESS-per-draw. This study measures EXACT-kernel
variants of the bench sampler at the bench's own honest configuration
(N=500, 16 chains, 48 outer chunked 6x8, ESS on the 41 retained draws,
min over ty_ls/y_noise/y_scale) — wall measured on-chip, never modeled.

Program economics: every distinct traced program costs ~15 min of remote
compile, so per-site proposal settings ride ONE compiled program via the
runtime ``ProposalParams`` input (``hp.dynamic_proposals``; inference/mh.py)
and only STRUCTURAL variants (DR fields, gibbs rounds, inner budgets)
compile separately.

Usage (serialize against everything else on the machine):
    python benchmarks/ess_study.py --compile   # build+warm all programs (~hrs, CPU free)
    python benchmarks/ess_study.py --measure   # timed runs, idle machine (~25 min)
    python benchmarks/ess_study.py --measure --only control,ls_wide_p05
Appends to benchmarks/ess_study_results.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
OUT = pathlib.Path(__file__).resolve().parent / "ess_study_results.jsonl"
sys.path.insert(0, str(ROOT))

N = 500
N_CHAINS = 16
N_OUTER = 48
CHUNK = 8
SEEDS = (1, 2)

LS_FIELDS = ("ty_ls", "ut_ls", "uy_ls")


def _pp_arrays(spec, priors, ls_wv=100.0, ls_wp=0.3, ns_wv=100.0, ns_wp=0.3,
               ls_drift=None, ns_drift=None):
    """ProposalParams with per-class settings (ls vs noise/scale moves)."""
    import jax.numpy as jnp

    from causalgpslc_tpu.inference.mh import ProposalParams, sweep_moves

    moves = sweep_moves(spec)
    narrow, wv, wp = [], [], []
    for field, _ in moves:
        is_ls = field.endswith("_ls")
        d = (ls_drift if is_ls else ns_drift)
        narrow.append(float(d) if d is not None else float(priors["drift"]))
        wv.append(float(ls_wv if is_ls else ns_wv) or 1.0)
        wp.append(float(ls_wp if is_ls else ns_wp))
    return ProposalParams(
        narrow=jnp.asarray(np.asarray(narrow), dtype=jnp.float32),
        wide_var=jnp.asarray(np.asarray(wv), dtype=jnp.float32),
        wide_prob=jnp.asarray(np.asarray(wp), dtype=jnp.float32),
    )


# Structural programs: name -> hp overrides (everything else = bench default)
PROGRAMS = {
    "base": {},
    "rounds2": {"gibbs_rounds": 2},
    "dr_ls": {"mh_dr_fields": LS_FIELDS},
    "dr_tyls": {"mh_dr_fields": ("ty_ls",)},
    "mh5": {"n_mh_inner": 5},
    "mh15": {"n_mh_inner": 15},
    "es2": {"n_es_inner": 2},
}

# Settings: name -> (program, proposal-array kwargs)
SETTINGS = {
    # the control = bench default restated through the dynamic program
    "control": ("base", {}),
    # per-site wide mixtures
    "ls_only_wide": ("base", {"ns_wp": 0.0}),
    "ls_wide_p05": ("base", {"ls_wp": 0.5, "ns_wp": 0.0}),
    "ls_wide_p07": ("base", {"ls_wp": 0.7, "ns_wp": 0.0}),
    "ls_wide300_p03": ("base", {"ls_wv": 300.0, "ns_wp": 0.0}),
    "ls_wide300_p05": ("base", {"ls_wv": 300.0, "ls_wp": 0.5, "ns_wp": 0.0}),
    "ns_drift1": ("base", {"ns_drift": 1.0}),
    "ns_drift025": ("base", {"ns_drift": 0.25}),
    # interleaved rounds
    "rounds2": ("rounds2", {}),
    "rounds2_ls_p05": ("rounds2", {"ls_wp": 0.5, "ns_wp": 0.0}),
    # delayed rejection (wide_var feeds DR stage 1; ls moves always-wide)
    "dr_ls_w100": ("dr_ls", {}),
    "dr_ls_w300": ("dr_ls", {"ls_wv": 300.0}),
    "dr_tyls_w100": ("dr_tyls", {}),
    # inner-budget schedule
    "mh5": ("mh5", {}),
    "mh15": ("mh15", {}),
    "es2": ("es2", {}),
    # second wave (informed by wave 1): ls-site boosts with the ns wide
    # component KEPT at the bench default — wave 1 showed ns_wp=0 is fragile
    # (y_noise occasionally sticks: min-ESS 17 and doubled wall on one seed)
    # while ls_wp=0.5 lifted ty_ls ESS 63 -> 98 on the seed where y_noise
    # stayed healthy.
    "ls_p05": ("base", {"ls_wp": 0.5}),
    "ls_p07": ("base", {"ls_wp": 0.7}),
    "ls_w300": ("base", {"ls_wv": 300.0}),
    "ls_w300_p05": ("base", {"ls_wv": 300.0, "ls_wp": 0.5}),
    "ns_p05": ("base", {"ns_wp": 0.5}),
    "all_p05": ("base", {"ls_wp": 0.5, "ns_wp": 0.5}),
    # finalist combo: the es2 schedule with the robust ls-wide tuning
    # (same compiled program as es2 — proposal arrays are runtime inputs)
    "es2_ls_w300_p05": ("es2", {"ls_wv": 300.0, "ls_wp": 0.5}),
}


def build(program: str):
    import jax

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    import causalgpslc_tpu as cg
    from causalgpslc_tpu.models.spec import make_model_data

    sys.path.insert(0, str(ROOT))
    from bench import make_synthetic

    rng = np.random.default_rng(0)
    prepared = cg.prepare_data(make_synthetic(N, rng))
    kw = dict(
        n_u=1, n_outer=N_OUTER, n_mh_inner=10, n_es_inner=5,
        n_burn_in=max(1, N_OUTER // 6), n_chains=N_CHAINS,
        inner_unroll=False, mh_wide_drift=100.0, mh_wide_prob=0.3,
        ess_spec_batch=1, dynamic_proposals=True,
    )
    kw.update(PROGRAMS[program])
    hp = cg.default_hyperparameters(**kw)
    pp = cg.default_prior_parameters()
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    spec, data = make_model_data(prepared, n_u=hp.n_u, dtype=dtype)
    return spec, pp, data, hp


def run_once(spec, pp, data, hp, seed, pprm):
    import jax

    from causalgpslc_tpu.parallel.checkpoint import run_mcmc_checkpointed

    return run_mcmc_checkpointed(
        jax.random.PRNGKey(seed), spec, pp, data, hp,
        checkpoint_path=None, checkpoint_every=CHUNK, proposal_params=pprm,
    )


def measure_setting(name, warm_only=False, seeds=SEEDS):
    from causalgpslc_tpu.diagnostics import effective_sample_size

    program, kw = SETTINGS[name]
    spec, pp, data, hp = build(program)
    pprm = _pp_arrays(spec, pp, **kw)

    run_once(spec, pp, data, hp, 0, pprm)  # compile + warm
    if warm_only:
        return None

    retained = np.asarray(hp.retained_indices())
    rows = []
    for seed in seeds:
        t0 = time.perf_counter()
        samples, _, _ = run_once(spec, pp, data, hp, seed, pprm)
        wall = time.perf_counter() - t0
        ess_vals = {
            f: float(effective_sample_size(np.asarray(getattr(samples, f))[:, retained]))
            for f in ("ty_ls", "y_noise", "y_scale")
        }
        min_ess = min(ess_vals.values())
        # Full-state mixing audit: a schedule change (e.g. fewer ES sweeps)
        # must not win the 3-field headline by letting the unmeasured sites
        # go stale (pseudo-mixing: hyperparameters exploring p(theta|U~fixed)).
        aux = {}
        for f in ("t_noise", "t_scale", "u_noise"):
            v = getattr(samples, f, None)
            if v is not None:
                aux[f] = float(effective_sample_size(np.asarray(v)[:, retained]))
        for f in ("uy_ls", "ut_ls"):
            v = getattr(samples, f, None)
            if v is not None:
                arr = np.asarray(v)[:, retained]  # (chains, draws, nU)
                aux[f] = float(min(
                    effective_sample_size(arr[..., k]) for k in range(arr.shape[-1])
                ))
        if getattr(samples, "u", None) is not None:
            u = np.asarray(samples.u)[:, retained]  # (chains, draws, n, nU)
            coords = range(0, u.shape[2], max(1, u.shape[2] // 16))
            aux["u"] = float(min(
                effective_sample_size(u[:, :, i, k])
                for i in coords for k in range(u.shape[-1])
            ))
        min_ess_all = min([min_ess, *aux.values()]) if aux else min_ess
        rows.append({
            "seed": seed, "wall_s": round(wall, 2), "ess": ess_vals,
            "ess_aux": {k: round(v, 2) for k, v in aux.items()},
            "min_ess": round(min_ess, 2),
            "min_ess_all": round(min_ess_all, 2),
            "ess_per_s": round(min_ess / wall, 3),
            "ess_all_per_s": round(min_ess_all / wall, 3),
        })
    rec = {
        "setting": name, "program": program, "pp_kwargs": kw,
        "n_outer": N_OUTER, "chains": N_CHAINS, "runs": rows,
        "ess_per_s_mean": round(float(np.mean([r["ess_per_s"] for r in rows])), 3),
        "ess_all_per_s_mean": round(
            float(np.mean([r["ess_all_per_s"] for r in rows])), 3),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--compile", action="store_true")
    ap.add_argument("--measure", action="store_true")
    ap.add_argument("--only", type=str, default=None)
    ap.add_argument("--seeds", type=str, default=None,
                    help="comma-separated seeds (finalist confirmation runs)")
    args = ap.parse_args()

    seeds = SEEDS if args.seeds is None else tuple(int(s) for s in args.seeds.split(","))
    names = list(SETTINGS) if args.only is None else args.only.split(",")
    if args.compile:
        # one setting per program suffices to compile+cache that program
        done_programs = set()
        for name in names:
            prog = SETTINGS[name][0]
            if prog in done_programs:
                continue
            t0 = time.perf_counter()
            print(f"[study] compiling program {prog} ...", flush=True)
            measure_setting(name, warm_only=True)
            print(f"[study] program {prog} ready in {time.perf_counter()-t0:.0f}s", flush=True)
            done_programs.add(prog)
        return
    if args.measure:
        for name in names:
            measure_setting(name, seeds=seeds)
        return
    ap.print_help()


if __name__ == "__main__":
    main()
