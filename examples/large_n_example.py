"""Large-N worked example: GP-SLC at thousands of individuals.

The reference caps at a few hundred rows (dense n x n kernels + LAPACK
Cholesky per density evaluation; its largest shipped dataset is IHDP,
n=272). This example runs the same causal workflow — posterior inference,
counterfactual ITE, SATE with credible intervals — on a synthetic dataset
of N individuals through the row-sharded engine: the N x N covariances are
distributed over the device mesh and the dense SigmaU never materializes.

Run from the repo root:  python examples/large_n_example.py [N]
(default N=2000; at N=50k use a pod slice so per-device memory divides).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd


def make_dataset(n: int, rng: np.random.Generator) -> pd.DataFrame:
    """Synthetic confounded dataset: objects share latent confounders that
    drive both treatment and outcome (the GP-SLC structure)."""
    n_obj = n // 5
    obj = np.repeat(np.arange(n_obj), 5)[:n]
    u_true = rng.normal(size=n_obj)[obj]  # shared within object
    x = (0.6 * u_true + 0.8 * rng.normal(size=n)).reshape(-1, 1)
    t = 0.9 * u_true + 0.4 * x[:, 0] + 0.5 * rng.normal(size=n)
    y = 1.5 * t + 1.2 * u_true + 0.3 * x[:, 0] + 0.3 * rng.normal(size=n)
    return pd.DataFrame({"obj": obj, "X1": x[:, 0], "T": t, "Y": y})


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000

    import causalgpslc_tpu as cg

    rng = np.random.default_rng(0)
    df = make_dataset(n, rng)

    hp = cg.default_hyperparameters(
        n_outer=12, n_mh_inner=3, n_es_inner=2, n_burn_in=6, n_u=1
    )
    print(f"[large_n] sharded MCMC: N={n}, devices={_n_devices()}")
    g = cg.gpslc_large_n(df, hyperparams=hp, seed=0)

    for do_t in (0.0, 1.0):
        ite = cg.sample_ite_large_n(g, do_t, samples_per_posterior=5)
        summary = cg.summarize_estimates(ite)
        sate = cg.sample_sate_large_n(g, do_t, samples_per_posterior=5)
        lo, hi = np.quantile(sate, [0.05, 0.95])
        print(
            f"doT={do_t}: mean ITE {summary.Mean.mean():+.3f}, "
            f"SATE {sate.mean():+.3f} [{lo:+.3f}, {hi:+.3f}]"
        )


def _n_devices() -> int:
    import jax

    return len(jax.devices())


if __name__ == "__main__":
    main()
