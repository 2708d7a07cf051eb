"""IHDP binary-treatment example.

Python analog of the reference's IHDP usage (`test/test_data/IHDP_sampled.csv`,
goldens `test/test_results/IHDP_sampled_{true,false}.csv`): infer the GPSLC
posterior on the Infant Health and Development Program data (binary treatment,
6 covariates, no object grouping), then report the Average Treatment Effect as
the difference of counterfactual outcomes under do(T=1) and do(T=0).

Run from the repo root:  python examples/ihdp_example.py
(First compile of the full binary model is slow — ~70 s on CPU; pass a
smaller ``--rows`` to iterate.)
"""

import argparse
import pathlib
import sys

# runnable from any cwd without an installed package: the repo root
# (one level up) holds causalgpslc_tpu/
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd

import causalgpslc_tpu as cg

DATA = pathlib.Path(__file__).parent.parent / "tests" / "data" / "IHDP_sampled.csv"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=120, help="subsample size (272 = full)")
    ap.add_argument("--chains", type=int, default=4)
    args = ap.parse_args()

    df = pd.read_csv(DATA).head(args.rows)
    hp = cg.default_hyperparameters(
        n_outer=24, n_u=1, n_mh_inner=10, n_es_inner=5, n_burn_in=10,
        n_chains=args.chains,
    )
    g = cg.gpslc(df, hyperparams=hp, seed=7)

    # ITE samples under both arms; ATE = mean over individuals
    ite_treat = cg.sample_ite(g, 1.0, 10, seed=1)   # Y[do T=1] - Y
    ite_ctrl = cg.sample_ite(g, 0.0, 10, seed=2)    # Y[do T=0] - Y
    ate_samples = (ite_treat - ite_ctrl).mean(axis=0)

    lo, hi = np.quantile(ate_samples, [0.05, 0.95])
    print(f"n={len(df)}  chains={args.chains}  posterior draws={ate_samples.size}")
    print(f"ATE (do T=1 vs do T=0): {ate_samples.mean():.3f}  [90% CI {lo:.3f}, {hi:.3f}]")

    summary = cg.summarize_estimates(ite_treat - ite_ctrl)
    print("\nper-individual treatment effects (first 10):")
    print(summary.head(10).to_string(index=False))


if __name__ == "__main__":
    main()
