"""Faithful single-chain numpy baseline of the reference algorithm.

The Julia reference (KDL-umass/CausalGPSLC.jl) cannot run in this image, so
this module re-creates its *algorithmic cost structure* for the benchmark
baseline, NoCov continuous variant (``src/inference.jl:62-109``):

- single chain, sequential single-site MH with the InvGamma drift proposal
  (``src/proposal.jl:32-41``),
- **full-joint re-scoring on every MH move** — Gen's dynamic DSL re-scores
  the entire trace per move, which is the reference's dominant cost
  (SURVEY.md §3.1 "HOT HOT"),
- unbounded elliptical slice sampling over U columns with full re-scoring
  per angle proposal (``src/inference.jl:50-54``),
- float64, LAPACK Cholesky via scipy (the same BLAS path Julia bottoms out
  in via ``Distributions.mvnormal``).

Kernel construction uses vectorized numpy (generous to the baseline: the
Julia reference builds kernels with an O(n^2 d) scalar loop,
``src/kernel.jl:24-32``).
"""

from __future__ import annotations

import numpy as np
from scipy.linalg import cholesky, solve_triangular
from scipy.special import gammaln


def rbf_log(x1, x2, ls):
    z1 = np.atleast_2d(x1.T).T / ls
    z2 = np.atleast_2d(x2.T).T / ls
    d = z1[:, None, :] - z2[None, :, :]
    return -np.sum(d * d, axis=-1)


def mvn_logpdf(x, cov):
    n = x.shape[0]
    L = cholesky(cov, lower=True)
    alpha = solve_triangular(L, x, lower=True)
    return -0.5 * (alpha @ alpha + 2.0 * np.sum(np.log(np.diag(L))) + n * np.log(2 * np.pi))


def invgamma_logpdf(x, shape, scale):
    if x <= 0:
        return -np.inf
    return shape * np.log(scale) - gammaln(shape) - (shape + 1) * np.log(x) - scale / x


def invgamma_sample(rng, shape, scale):
    return scale / rng.gamma(shape)


SCALAR_SITES = ["u_noise", "t_noise", "y_noise", "ty_ls", "t_scale", "y_scale"]


def full_log_joint(params, sigma_u, t, y, n_u):
    """Entire joint, recomputed from scratch — Gen's per-move behavior."""
    lp = 0.0
    for s in SCALAR_SITES:
        lp += invgamma_logpdf(params[s], 4.0, 4.0)
    for k in range(n_u):
        lp += invgamma_logpdf(params["ut_ls"][k], 4.0, 4.0)
        lp += invgamma_logpdf(params["uy_ls"][k], 4.0, 4.0)
    u_cov = sigma_u * params["u_noise"]
    for k in range(n_u):
        lp += mvn_logpdf(params["u"][:, k], u_cov)
    t_cov = np.exp(rbf_log(params["u"], params["u"], params["ut_ls"])) * params["t_scale"]
    t_cov += np.eye(t.shape[0]) * params["t_noise"]
    lp += mvn_logpdf(t, t_cov)
    y_log = rbf_log(params["u"], params["u"], params["uy_ls"]) + rbf_log(t, t, params["ty_ls"])
    y_cov = np.exp(y_log) * params["y_scale"] + np.eye(t.shape[0]) * params["y_noise"]
    lp += mvn_logpdf(y, y_cov)
    return lp


def run_reference_chain(n=500, n_u=1, n_outer=5, n_mh_inner=10, n_es_inner=5, seed=0):
    """Run the reference-shaped chain; returns (draws of tyLS, seconds/outer)."""
    import time

    rng = np.random.default_rng(seed)
    # synthetic NoCov dataset with object blocks of 4
    counts = [4] * (n // 4) + ([n % 4] if n % 4 else [])
    sigma_u = np.eye(n) * 1e-13
    i = 0
    for c in counts:
        sigma_u[i : i + c, i : i + c] += 1.0
        i += c
    np.fill_diagonal(sigma_u, 1.0 + 1e-13)
    t = rng.normal(size=n)
    y = rng.normal(size=n)

    params = {s: invgamma_sample(rng, 4.0, 4.0) for s in SCALAR_SITES}
    params["ut_ls"] = np.array([invgamma_sample(rng, 4.0, 4.0) for _ in range(n_u)])
    params["uy_ls"] = np.array([invgamma_sample(rng, 4.0, 4.0) for _ in range(n_u)])
    u_chol = cholesky(sigma_u * params["u_noise"], lower=True)
    params["u"] = u_chol @ rng.normal(size=(n, n_u))

    drift = 0.5
    draws = []
    t0 = time.perf_counter()
    for _outer in range(n_outer):
        for _ in range(n_mh_inner):
            for site, idx in (
                [("u_noise", None), ("t_noise", None), ("y_noise", None), ("ty_ls", None)]
                + [(s, k) for k in range(n_u) for s in ("ut_ls", "uy_ls")]
                + [("t_scale", None), ("y_scale", None)]
            ):
                cur = params[site] if idx is None else params[site][idx]
                shape = cur * cur / drift + 2.0
                scale = cur * (shape - 1.0)
                prop = invgamma_sample(rng, shape, scale)
                old_lp = full_log_joint(params, sigma_u, t, y, n_u)
                if idx is None:
                    old_val, params[site] = cur, prop
                else:
                    old_val = cur
                    params[site][idx] = prop
                new_lp = full_log_joint(params, sigma_u, t, y, n_u)
                shape_r = prop * prop / drift + 2.0
                scale_r = prop * (shape_r - 1.0)
                log_alpha = (
                    new_lp
                    - old_lp
                    + invgamma_logpdf(cur, shape_r, scale_r)
                    - invgamma_logpdf(prop, shape, scale)
                )
                if np.log(rng.uniform()) >= log_alpha:
                    if idx is None:
                        params[site] = old_val
                    else:
                        params[site][idx] = old_val

        # Algorithm 3: elliptical slice over U columns, full re-scoring
        u_cov = sigma_u * params["u_noise"]
        u_chol = cholesky(u_cov, lower=True)

        def u_loglik():
            t_cov = np.exp(rbf_log(params["u"], params["u"], params["ut_ls"])) * params["t_scale"]
            t_cov += np.eye(n) * params["t_noise"]
            y_log = rbf_log(params["u"], params["u"], params["uy_ls"]) + rbf_log(
                t, t, params["ty_ls"]
            )
            y_cov = np.exp(y_log) * params["y_scale"] + np.eye(n) * params["y_noise"]
            return mvn_logpdf(t, t_cov) + mvn_logpdf(y, y_cov)

        for _ in range(n_es_inner):
            for k in range(n_u):
                f = params["u"][:, k].copy()
                nu = u_chol @ rng.normal(size=n)
                log_y = u_loglik() + np.log(rng.uniform())
                theta = rng.uniform() * 2 * np.pi
                lo, hi = theta - 2 * np.pi, theta
                while True:
                    params["u"][:, k] = f * np.cos(theta) + nu * np.sin(theta)
                    if u_loglik() > log_y:
                        break
                    if theta < 0:
                        lo = theta
                    else:
                        hi = theta
                    theta = rng.uniform(lo, hi)

        draws.append(params["ty_ls"])
    secs_per_outer = (time.perf_counter() - t0) / n_outer
    return np.array(draws), secs_per_outer


if __name__ == "__main__":
    import json
    import sys

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    n_outer = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    draws, secs = run_reference_chain(n=n, n_outer=n_outer)
    print(json.dumps({"n": n, "secs_per_outer": secs, "draws_per_sec": 1.0 / secs}))
