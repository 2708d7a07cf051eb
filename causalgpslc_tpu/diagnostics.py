"""MCMC diagnostics: effective sample size, R-hat, stuck-chain detection.

The reference's only run-visibility is a progress bar (SURVEY.md §5); its
only behavioral MCMC test is a stuck-chain detector (``test/inference.jl:9-28``:
every latent address must change across iterations). This module gives the
framework first-class diagnostics: split-chain ESS and R-hat (Stan manual /
Vehtari et al. 2021 formulation, Geyer initial-monotone truncation) and a
vectorized stuck-chain check. Host-side numpy — diagnostics are cheap
relative to sampling and run on retained samples.
"""

from __future__ import annotations

import numpy as np

__all__ = ["effective_sample_size", "split_rhat", "stuck_sites", "summarize_chain_stats", "site_addresses", "profile_trace"]


def _autocovariance_fft(x: np.ndarray) -> np.ndarray:
    """Per-chain autocovariance via FFT. x: (chains, draws) demeaned."""
    n = x.shape[1]
    m = int(2 ** np.ceil(np.log2(2 * n)))
    f = np.fft.rfft(x, m, axis=1)
    acov = np.fft.irfft(f * np.conj(f), m, axis=1)[:, :n].real
    return acov / n


def _split_chains(x: np.ndarray) -> np.ndarray:
    c, n = x.shape
    half = n // 2
    return np.concatenate([x[:, :half], x[:, n - half :]], axis=0)


def effective_sample_size(x: np.ndarray) -> float:
    """Split-chain ESS of a scalar trace ``x`` with shape (chains, draws).

    Standard multi-chain formulation: between/within variance combination and
    Geyer's initial-monotone positive-sequence truncation of the pairwise
    autocorrelation sums.
    """
    x = np.atleast_2d(np.asarray(x, dtype=np.float64))
    x = _split_chains(x)
    m, n = x.shape
    if n < 4:
        return float(m * n)

    chain_means = x.mean(axis=1)
    w = x.var(axis=1, ddof=1).mean()
    var_plus = w * (n - 1) / n
    if m > 1:
        b = n * chain_means.var(ddof=1)
        var_plus += b / n
    if var_plus == 0 or not np.isfinite(var_plus):
        return float(m * n)

    acov = _autocovariance_fft(x - chain_means[:, None]).mean(axis=0)
    rho = 1.0 - (w - acov) / var_plus
    rho[0] = 1.0

    # Geyer: sum consecutive pairs while positive and monotone decreasing
    tau = 0.0
    prev_pair = np.inf
    t = 1
    while t + 1 < n:
        pair = rho[t] + rho[t + 1]
        if pair < 0:
            break
        pair = min(pair, prev_pair)
        tau += pair
        prev_pair = pair
        t += 2
    ess = m * n / (1.0 + 2.0 * tau)
    return float(min(ess, m * n))


def split_rhat(x: np.ndarray) -> float:
    """Split-chain potential-scale-reduction of a (chains, draws) trace."""
    x = np.atleast_2d(np.asarray(x, dtype=np.float64))
    x = _split_chains(x)
    m, n = x.shape
    if m < 2 or n < 2:
        return float("nan")
    chain_means = x.mean(axis=1)
    w = x.var(axis=1, ddof=1).mean()
    b = n * chain_means.var(ddof=1)
    var_plus = w * (n - 1) / n + b / n
    if w == 0:
        return float("nan")
    return float(np.sqrt(var_plus / w))


def stuck_sites(samples, min_unique: int = 2) -> list[str]:
    """Names of sample fields that never change across the outer loop.

    The vectorized analog of the reference's per-address stuck-chain test
    (``test/inference.jl:9-28``): each present site must take at least
    ``min_unique`` distinct values along the draws axis in every chain.
    """
    stuck = []
    for field in samples._fields:
        leaf = getattr(samples, field)
        if leaf is None:
            continue
        arr = np.asarray(leaf)
        c = arr.shape[0]
        flat = arr.reshape(c, arr.shape[1], -1)
        # a site is stuck if some chain shows a single unique value across draws
        for chain in range(c):
            n_unique = np.array(
                [len(np.unique(flat[chain, :, j])) for j in range(flat.shape[2])]
            )
            if np.any(n_unique < min_unique):
                stuck.append(field)
                break
    return stuck


def summarize_chain_stats(stats) -> dict:
    """Host-side summary of per-iteration stats (dense ``StepStats`` or the
    large-N ``LargeNStats``, whose log-joint field is named ``log_joint``)."""
    lj = getattr(stats, "log_joint_blocks", None)
    if lj is None:
        lj = stats.log_joint
    return {
        "mh_accept_rate": float(np.mean(np.asarray(stats.mh_accept_rate))),
        "mean_ess_iters": float(np.mean(np.asarray(stats.ess_iters))),
        "final_log_joint": float(np.mean(np.asarray(lj)[..., -1])),
    }


def site_addresses(samples_or_params) -> list[str]:
    """Names of present latent sites (the ``getAddresses`` debugging tool,
    ``src/utils.jl:78-84``)."""
    return [
        f for f in samples_or_params._fields if getattr(samples_or_params, f) is not None
    ]


class profile_trace:
    """Context manager wrapping ``jax.profiler`` for kernel-level traces:

        with profile_trace("/tmp/gpslc-trace"):
            run_mcmc_jit(...)

    View with TensorBoard or xprof. No-op (with a warning) if the backend
    does not support profiling.
    """

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        self._active = False

    def __enter__(self):
        import jax

        try:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        except Exception as e:  # pragma: no cover - backend dependent
            print(f"[diagnostics] profiler unavailable: {e}")
        return self

    def __exit__(self, *exc):
        if self._active:
            import jax

            jax.profiler.stop_trace()
        return False
