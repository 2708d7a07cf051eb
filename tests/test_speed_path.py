"""Statistical validation of the TPU speed configurations (slow suite).

The headline bench (bench.py) runs float32 + relative-jitter stabilize_cov +
the quantum-free blocked Cholesky with (round 3, measured best at the
honest 48-outer horizon) the reference-shaped site sweep plus the wide-jump
mixture proposal (drift 100, p=0.3); the blocked joint-proposal sweep with
burn-in adaptation remains a selectable alternate. Every other
golden/SBC/consistency gate runs in CPU float64 parity mode, so without
these tests the perf number and the correctness evidence would describe two
different samplers. Here the exact bench kernel combinations (with
CAUSALGPSLC_QFC=cpu — the blocked driver with an XLA base case, the
CPU-testable stand-in for the Pallas base kernel; same panel algorithm and
padding) passes the reference's own NEEC golden gate
(/root/reference/test/driver.jl:45-52) and SBC rank-uniformity (Talts et
al. 2018) for the bench variant and the full U+X variant.
"""

import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

import causalgpslc_tpu as cg
from causalgpslc_tpu.calibration import run_sbc
from causalgpslc_tpu.models.spec import ModelSpec

# the round-3 bench defaults, measured best at the honest 48-outer horizon:
# reference-shaped site sweep + wide-jump mixture, no adaptation
SPEED = dict(
    mh_block_sweep=False,
    mh_wide_drift=100.0,
    mh_wide_prob=0.3,
    adapt_proposals=False,
    inner_unroll=False,  # bit-identical to unrolled; CPU compiles ~4-5x faster
)
# the round-2 alternate (BENCH_BLOCKED=1 BENCH_ADAPT=1): blocked joint
# proposals + burn-in adaptation — still selectable via env, still validated
SPEED_BLOCKED = dict(SPEED, mh_block_sweep=True, adapt_proposals=True)
# the round-5 bench default: lengthscale sites take a (300, p=0.5) wide
# mixture (static per-site overrides = the same kernel bench.py builds as
# runtime ProposalParams), noise/scale sites keep (100, 0.3), and the outer
# iteration spends 2 ES sweeps (BASELINE.md "Round 5" matrix + audit)
_LS_FIELDS = ("ty_ls", "ut_ls", "uy_ls", "ux_ls", "xt_ls", "xy_ls")
SPEED_R5 = dict(
    SPEED,
    mh_site_proposals=tuple((f, None, 300.0, 0.5) for f in _LS_FIELDS),
    n_es_inner=2,
)


@pytest.fixture(autouse=True)
def _qfc_cpu(monkeypatch):
    """Route every factorization through the quantum-free blocked driver."""
    monkeypatch.setenv("CAUSALGPSLC_QFC", "cpu")


@pytest.mark.slow
@pytest.mark.parametrize(
    "config",
    [SPEED, SPEED_BLOCKED, SPEED_R5],
    ids=["site_wide", "blocked_adapt", "r5_per_site"],
)
def test_neec_golden_in_speed_config(data_dir, config):
    """NEEC golden gate (>=50% of per-individual ITE means inside the
    reference's 90% CIs) in the f32 speed configurations."""
    kw = dict(n_outer=25, n_u=2, n_mh_inner=3, n_es_inner=5, n_burn_in=10)
    kw.update(config)
    hp = cg.default_hyperparameters(**kw)
    g = cg.gpslc(
        str(data_dir / "NEEC_sampled.csv"), hyperparams=hp, seed=42, dtype=jnp.float32
    )
    assert g.posterior_samples.ty_ls.dtype == jnp.float32
    ite = cg.sample_ite(g, 0.6, samples_per_posterior=10)
    df = cg.summarize_estimates(ite)
    golden = pd.read_csv(data_dir / "golden" / "NEEC_sampled_0.6.csv")
    inside = ((df.Mean >= golden.LowerBound) & (df.Mean <= golden.UpperBound)).mean()
    assert inside >= 0.5, f"only {inside:.0%} inside golden CIs in speed config"


@pytest.mark.slow
@pytest.mark.parametrize(
    "n_u,n_x,binary_t",
    [
        (1, None, False),  # the bench variant (NoCov continuous)
        (1, 2, False),  # full U+X variant
        (1, None, True),  # binary treatment: logitT ESS in the f32 path
    ],
)
def test_sbc_in_speed_config(n_u, n_x, binary_t):
    """SBC rank-uniformity for the speed-path sampler: the f32 blocked-sweep
    wide-mixture adaptive kernel must still target the exact posterior
    (adaptation is frozen after burn-in, so retained draws come from a fixed
    valid MH kernel)."""
    spec = ModelSpec(n=12, n_u=n_u, n_x=n_x, binary_t=binary_t)
    hp = cg.default_hyperparameters(
        n_u=n_u, n_outer=60, n_mh_inner=5, n_es_inner=3, n_burn_in=10,
        step_size=5, n_chains=1, **SPEED
    )
    res = run_sbc(spec, hp, n_replications=30, seed=3, dtype=jnp.float32)
    assert res.passed, f"speed-config SBC rejected: {res.pvalues}"


@pytest.mark.slow
def test_sbc_round5_kernel():
    """SBC rank-uniformity for the round-5 bench kernel (per-site ls-wide
    mixture + es2 schedule) on the bench variant: the exact mixture density
    in the Hastings ratio makes every per-site setting a valid MH kernel,
    and fewer ES sweeps per outer leave the stationary distribution
    untouched — this gates both claims statistically in the f32 path."""
    spec = ModelSpec(n=12, n_u=1, n_x=None, binary_t=False)
    kw = dict(
        n_u=1, n_outer=60, n_mh_inner=5, n_es_inner=3, n_burn_in=10,
        step_size=5, n_chains=1,
    )
    kw.update(SPEED_R5)
    hp = cg.default_hyperparameters(**kw)
    res = run_sbc(spec, hp, n_replications=30, seed=3, dtype=jnp.float32)
    assert res.passed, f"round-5 kernel SBC rejected: {res.pvalues}"
