"""Posterior predictive checks across variants (mirrors `test/posterior.jl`).

>=50% of individuals must be consistent with treatment replicates drawn from
posterior parameter samples (percentClose at `test/posterior.jl:29`).
"""

import jax
import numpy as np
import pytest

import causalgpslc_tpu as cg
from causalgpslc_tpu.inference.gibbs import run_mcmc_jit
from causalgpslc_tpu.posterior_predictive import replicate_treatment, treatment_ppc_fraction

from test_models import make_case

ALL_VARIANTS = [
    (u, x, b) for u in (True, False) for x in (True, False) for b in (True, False)
]


@pytest.mark.slow
@pytest.mark.parametrize("has_u,has_x,binary_t", ALL_VARIANTS)
def test_treatment_ppc(has_u, has_x, binary_t):
    spec, data = make_case(has_u, has_x, binary_t, seed=9)
    pp = cg.default_prior_parameters()
    hp = cg.default_hyperparameters(
        n_u=spec.n_u, n_outer=10, n_mh_inner=10, n_es_inner=10, n_burn_in=1, n_chains=1
    )
    samples, _, _ = run_mcmc_jit(jax.random.PRNGKey(0), spec, pp, data, hp)
    flat = jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]), samples)
    reps = replicate_treatment(jax.random.PRNGKey(1), spec, data, flat)
    frac = treatment_ppc_fraction(data, spec, reps)
    if binary_t and not has_u and not has_x:
        # Degenerate variant: logitT is never updated (matching the reference,
        # src/inference.jl:370-377), so replicates are prior coin flips and
        # the match rate hovers at chance; only sanity-check it.
        assert frac >= 0.25, f"degenerate-variant PPC collapsed: {frac:.0%}"
    else:
        assert frac >= 0.5, f"PPC matched only {frac:.0%} of individuals"


def test_replicate_shapes_continuous():
    spec, data = make_case(True, False, False)
    pp = cg.default_prior_parameters()
    hp = cg.default_hyperparameters(n_u=spec.n_u, n_outer=3, n_mh_inner=1, n_es_inner=1, n_burn_in=1)
    samples, _, _ = run_mcmc_jit(jax.random.PRNGKey(0), spec, pp, data, hp)
    flat = jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]), samples)
    reps = replicate_treatment(jax.random.PRNGKey(1), spec, data, flat)
    assert reps.shape == (3, spec.n)
    assert np.isfinite(np.asarray(reps)).all()


def test_replicate_binary_values():
    spec, data = make_case(False, True, True)
    pp = cg.default_prior_parameters()
    hp = cg.default_hyperparameters(n_u=None, n_outer=3, n_mh_inner=1, n_es_inner=1, n_burn_in=1)
    samples, _, _ = run_mcmc_jit(jax.random.PRNGKey(0), spec, pp, data, hp)
    flat = jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]), samples)
    reps = np.asarray(replicate_treatment(jax.random.PRNGKey(1), spec, data, flat))
    assert set(np.unique(reps)) <= {0.0, 1.0}
