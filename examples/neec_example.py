"""New England Energy Consumption example.

Python analog of the reference's NEEC example
(``docs/example_data/NEEC_Example.jl`` / the Examples section of
``docs/src/index.md``): infer the GPSLC posterior on the NEEC data, sweep
counterfactual treatments (temperature) over the observed range, and report
the Massachusetts dose-response curve with 90% credible intervals —
Figure 3 of the GP-SLC paper (Witty et al., ICML 2020).

Run from the repo root:  python examples/neec_example.py
"""

import pathlib
import sys

# runnable from any cwd without an installed package: the repo root
# (one level up) holds causalgpslc_tpu/
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import causalgpslc_tpu as cg

DATA = pathlib.Path(__file__).parent.parent / "tests" / "data" / "NEEC_sampled.csv"


def main():
    hp = cg.default_hyperparameters(
        n_outer=25, n_u=2, n_mh_inner=3, n_es_inner=5, n_burn_in=10, n_chains=1
    )
    g = cg.gpslc(str(DATA), hyperparams=hp, seed=1234)
    cg.save_gpslc_object(g, "example_gpslc_object")

    # counterfactual outcomes across the treatment range
    ite, do_t = cg.predict_counterfactual_effects(g, 25, fidelity=20)

    ma_idx = np.asarray(g.prepared.obj) == "MA"
    ma_ite = ite[:, ma_idx, :]  # (d, n_MA, samples)

    # SATE over MA per intervention level, with credible intervals
    sate = ma_ite.mean(axis=1)  # (d, samples)
    interval = cg.summarize_estimates(sate)

    treatment_scale, outcome_scale = 100.0, 10.0
    mean_outcome = float(np.asarray(g.prepared.y)[ma_idx].mean())
    print("doT(F)  counterfactual outcome (GWh)  [90% credible interval]")
    for i in range(len(do_t)):
        t = do_t[i] * treatment_scale
        y = (mean_outcome + interval.Mean[i]) * outcome_scale
        lo = (mean_outcome + interval.LowerBound[i]) * outcome_scale
        hi = (mean_outcome + interval.UpperBound[i]) * outcome_scale
        print(f"{t:6.1f}  {y:8.2f}  [{lo:7.2f}, {hi:7.2f}]")


if __name__ == "__main__":
    main()
