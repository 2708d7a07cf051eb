"""Inference configuration and priors.

Parity targets: ``HyperParameters`` (``/root/reference/src/types.jl:22-30``),
``getHyperParameters`` (``src/hyperparameters.jl:85-102`` — the *code*
defaults, which differ from that file's docstring) and ``getPriorParameters``
(``src/hyperparameters.jl:38-70``).

TPU-native additions over the reference: ``n_chains`` (the reference runs a
single chain; chain data-parallelism is the primary scaling axis here) and an
explicit ``dtype`` policy (float64 for CPU parity, float32 for the TPU speed
path).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

__all__ = [
    "HyperParameters",
    "default_hyperparameters",
    "default_prior_parameters",
    "frozen_prior_items",
    "PriorParameters",
]

PriorParameters = dict


def frozen_prior_items(priors: dict) -> tuple:
    """Priors dict -> hashable sorted ``(name, float)`` tuple for jit statics.

    Python and numpy scalars (0-d) coerce via ``float``; a genuinely
    array-valued prior raises instead of being silently dropped (structure
    matrices like SigmaU belong in ``ModelData``, never in the priors dict).
    """
    items = []
    for k, v in sorted(priors.items()):
        if getattr(v, "ndim", 0) > 0 or getattr(v, "shape", ()) != ():
            raise ValueError(
                f"prior {k!r} is array-valued (shape {getattr(v, 'shape', None)}); "
                "priors must be scalars — pass structure matrices via the data, "
                "not the priors dict"
            )
        items.append((k, float(v)))
    return tuple(items)


@dataclasses.dataclass(frozen=True)
class HyperParameters:
    """High-level inference budget.

    - ``n_u``: latent confounder dimensionality (None = no-U model variants).
    - ``n_outer``: outer Gibbs iterations = posterior samples drawn.
    - ``n_mh_inner``: Metropolis-Hastings sweeps per outer iteration.
    - ``n_es_inner``: elliptical-slice sweeps per outer iteration.
    - ``n_burn_in`` / ``step_size``: retained samples are the 1-based indices
      ``n_burn_in : step_size : n_outer`` (``src/utils.jl:156-161``).
    - ``prediction_covariance_noise``: diagonal stabilizer for ITE covariances
      (``src/estimation.jl:82``).
    - ``n_chains``: independent MCMC chains, vmapped/sharded (new capability).
    """

    n_u: Optional[int] = 1
    n_outer: int = 24
    n_mh_inner: Optional[int] = 10
    n_es_inner: Optional[int] = 5
    n_burn_in: int = 10
    step_size: int = 1
    prediction_covariance_noise: float = 1e-10
    n_chains: int = 1
    # Adaptive per-site MH proposal variances (new capability; the reference
    # fixes drift=0.5). Robbins-Monro toward target_accept during burn-in,
    # frozen after, so retained samples come from a fixed Markov kernel.
    adapt_proposals: bool = False
    target_accept: float = 0.44
    # Joint per-GP-block MH proposals (one factorization per block instead of
    # one per site) — trades per-site acceptance for a ~10x smaller op count.
    # Valid MH for the same posterior; default False preserves the
    # reference's site-by-site sweep semantics. Measured (round 3,
    # BASELINE.md): mixes ~2.5x worse per draw at the 48-outer horizon and
    # loses to the site sweep on ess/s.
    mh_block_sweep: bool = False
    # Latency-compressed execution of the SITE sweep: consecutive moves on
    # disjoint GP blocks (u / t / y / each x column) are conditionally
    # independent, so each greedy round of distinct-block moves shares ONE
    # stacked factorization and accepts each move independently — the SAME
    # Markov chain as the sequential sweep, bit-for-bit (regression-tested),
    # at ~2-3.5x fewer sequential factorization rounds (8 moves -> 4 rounds
    # NoCov; 21 -> 6 for U+X nX=2). Ignored when mh_block_sweep=True.
    mh_grouped_sweep: bool = False
    # Inner-loop compilation strategy. True statically unrolls the nMHInner
    # MH sweeps and nESInner ES sweeps into straight-line XLA — fastest at
    # runtime on the axon backend (While iterations pay a fixed dispatch
    # quantum; BASELINE.md) but the program duplicates the blocked-Cholesky
    # graph ~(nMHInner + nESInner) times, making cold remote compiles take
    # 10-25 min. False rolls both inner loops into lax.fori_loop (body traced
    # once): ~4-5x faster compiles at a small per-iteration quantum cost.
    # Identical RNG streams and bit-identical samples either way (regression
    # tested), so None (default) resolves by platform at run time: unrolled
    # on TPU (runtime-bound), rolled elsewhere (compile-bound).
    inner_unroll: Optional[bool] = None
    # Speculative ESS batching: evaluate this many candidate angles per
    # elliptical-slice loop round in ONE batched likelihood call (the
    # angle-shrink recursion depends only on each rejected angle's sign, so
    # candidates pregenerate from the RNG chain — results are bit-identical
    # to the sequential loop; inference/ess.py). 1 = sequential. On the axon
    # backend each sequential round pays a ~10 ms op-latency floor while
    # batch is nearly free, so 8 collapses the ESS inner loop's wall time.
    ess_spec_batch: int = 1
    # Heavy-jump mixture proposal (new capability): with probability
    # ``mh_wide_prob`` a site's drift variance is ``mh_wide_drift`` instead of
    # the narrow drift. For wide variance >> cur^2 the moment-matched InvGamma
    # approaches shape 2 — a multiplicative ~0.3x-5x jump — which is what lets
    # lengthscale sites traverse their flat posterior plateaus (the frozen
    # tyLS failure mode; BASELINE.md). Exact mixture density on both sides of
    # the Hastings ratio, so the kernel stays exact. None = off (reference
    # single-component proposal).
    mh_wide_drift: Optional[float] = None
    mh_wide_prob: float = 0.2
    # --- Round-5 statistical-efficiency levers (all exact kernels) ---------
    # Per-site proposal overrides: tuple of (field, drift, wide_drift,
    # wide_prob) entries, e.g. (("ty_ls", 0.5, 300.0, 0.5),). Every MH move
    # on that field uses its own narrow drift variance and wide-jump mixture
    # (wide_drift <= 0 disables the wide component for that field); fields
    # not listed keep the global (priors["drift"], mh_wide_drift,
    # mh_wide_prob) configuration. The acceptance ratio always uses that
    # move's exact (possibly mixture) proposal density, so any setting is a
    # valid MH kernel for the same posterior. Motivation: lengthscale
    # posteriors have wide flat plateaus that need frequent wide jumps while
    # noise/scale posteriors are tight (BASELINE.md golden deep-dive) — one
    # global mixture under-serves both. Site-sweep and grouped-sweep
    # execution only (the blocked sweep rejects overrides).
    mh_site_proposals: Optional[tuple] = None
    # Delayed rejection (Tierney & Mira 1999) on the listed fields: stage 1
    # ALWAYS proposes the wide jump; when it rejects, stage 2 proposes the
    # narrow drift move from the CURRENT value and accepts with the exact
    # two-stage DR ratio (which includes the reversed-path stage-1 rejection
    # probability), so the kernel remains exactly invariant. Each DR move
    # costs one extra block evaluation; restrict to the slow-mixing
    # lengthscale sites. e.g. ("ty_ls",). Site-sweep execution only.
    mh_dr_fields: Optional[tuple] = None
    # Dynamic proposal parameters: the runner's per-move proposal state is a
    # runtime ``inference.mh.ProposalParams`` input (per-move narrow drift +
    # wide mixture arrays) instead of static trace constants — the SAME
    # compiled program serves every per-site tuning (used by the on-chip
    # kernel search, where each recompile costs ~15 min of remote service).
    # Pass the arrays via ``run_mcmc(..., proposal_params=...)`` or
    # ``run_mcmc_checkpointed(..., proposal_params=...)``. Mutually exclusive
    # with adapt_proposals (the drifts slot carries one or the other) and
    # with the blocked sweep (per-block, not per-move, drift semantics).
    dynamic_proposals: bool = False
    # Interleaved MH/ES schedule: split each outer iteration into this many
    # Gibbs rounds of (n_mh_inner/rounds MH sweeps + n_es_inner/rounds ES
    # sweeps), refreshing the frozen ESS prior covariances at each round's ES
    # phase (the reference freezes them once per outer iteration; more
    # frequent U/logitT refreshes between MH segments change mixing, not the
    # stationary distribution). 1 = reference schedule (bit-identical to the
    # round-4 program). Remainders go to the later rounds.
    gibbs_rounds: int = 1
    # Flattened chunk execution (round 4): run each chunk as ONE lax.scan
    # over phase steps ([refresh, mh*, freeze, es*, final] per outer
    # iteration, lax.switch-dispatched) instead of an outer scan with nested
    # inner fori loops. Same kernel, same RNG streams, bit-identical samples
    # (inference/flat.py; equivalence-tested). On the axon backend every
    # nested-loop ENTRY re-streams its body at ~7x the While replay rate
    # (measured: benchmarks/profile2_r04.json), so flattening removes a
    # ~0.2-0.3 s/outer re-staging tax. Supported by the chunked runner
    # (parallel/checkpoint.py), which bench.py uses.
    flat_execution: bool = False

    def __post_init__(self):
        if self.n_outer < 1:
            raise ValueError(f"n_outer must be >= 1, got {self.n_outer}")
        if self.n_burn_in > self.n_outer:
            raise ValueError(
                f"n_burn_in ({self.n_burn_in}) > n_outer ({self.n_outer}): "
                "no posterior samples would be retained"
            )
        if self.step_size < 1:
            raise ValueError(f"step_size must be >= 1, got {self.step_size}")
        if self.n_chains < 1:
            raise ValueError(f"n_chains must be >= 1, got {self.n_chains}")
        if self.gibbs_rounds < 1:
            raise ValueError(f"gibbs_rounds must be >= 1, got {self.gibbs_rounds}")
        if self.gibbs_rounds > 1:
            if self.flat_execution:
                raise ValueError("flat_execution does not support gibbs_rounds > 1")
            budget = max(self.n_mh_inner or 0, self.n_es_inner or 0)
            if self.gibbs_rounds > max(budget, 1):
                raise ValueError(
                    f"gibbs_rounds={self.gibbs_rounds} exceeds both inner budgets"
                )
        if self.mh_site_proposals is not None:
            for entry in self.mh_site_proposals:
                if len(entry) != 4:
                    raise ValueError(
                        "mh_site_proposals entries are (field, drift, "
                        f"wide_drift, wide_prob); got {entry!r}"
                    )
            if self.mh_block_sweep:
                raise ValueError(
                    "mh_site_proposals requires the site or grouped sweep "
                    "(mh_block_sweep proposes whole blocks jointly)"
                )
        if self.mh_dr_fields is not None:
            if self.mh_block_sweep or self.mh_grouped_sweep:
                raise ValueError(
                    "mh_dr_fields (delayed rejection) requires the plain "
                    "site sweep"
                )
        if self.dynamic_proposals:
            if self.adapt_proposals:
                raise ValueError(
                    "dynamic_proposals and adapt_proposals are mutually "
                    "exclusive (both occupy the runtime drifts slot)"
                )
            if self.mh_block_sweep:
                raise ValueError(
                    "dynamic_proposals requires the site or grouped sweep"
                )

    def replace(self, **kw) -> "HyperParameters":
        return dataclasses.replace(self, **kw)

    @property
    def n_posterior_samples(self) -> int:
        """Retained samples per chain: ``length(nBurnIn:stepSize:nOuter)``."""
        return len(range(self.n_burn_in, self.n_outer + 1, self.step_size))

    def retained_indices(self) -> list[int]:
        """0-based outer-iteration indices kept after burn-in/thinning."""
        return [i - 1 for i in range(self.n_burn_in, self.n_outer + 1, self.step_size)]


def default_hyperparameters(**overrides) -> HyperParameters:
    """Reference code defaults (``src/hyperparameters.jl:85-102``)."""
    return HyperParameters(**overrides)


def default_prior_parameters() -> PriorParameters:
    """Inverse-Gamma shape/scale table plus structure constants.

    Matches ``getPriorParameters`` (``src/hyperparameters.jl:38-70``): every
    InvGamma hyperprior is shape=4, scale=4; ``sigmaUNoise``/``sigmaUCov``
    parameterize SigmaU; ``drift`` is the MH proposal variance.
    """
    pp: PriorParameters = {}
    for name in [
        "uNoise", "xNoise", "tNoise", "yNoise",
        "xScale", "tScale", "yScale",
        "uxLS", "utLS", "xtLS", "uyLS", "xyLS", "tyLS",
    ]:
        pp[name + "Shape"] = 4.0
        pp[name + "Scale"] = 4.0
    pp["sigmaUNoise"] = 1.0e-13
    pp["sigmaUCov"] = 1.0
    pp["drift"] = 0.5
    return pp
