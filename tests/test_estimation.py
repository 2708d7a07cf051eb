"""Tier-3 analytic-identity estimation tests (mirrors `test/estimation.jl`).

With ``doT == T`` the counterfactual equals the factual, so conditionalITE
and conditionalSATE must be exactly 0 for every variant
(`test/estimation.jl:6-137`); the mixture distributions then center at 0
with covariance equal to predictionCovarianceNoise (`:139-247`), and sampled
variance matches it (`:251-393`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from causalgpslc_tpu import estimation
from causalgpslc_tpu.models.spec import GPSLCParams, ModelData, ModelSpec

DO_T = 0.6
PRED_NOISE = 1e-10


def make_case(has_u, has_x, n=4, seed=0):
    rng = np.random.default_rng(seed)
    spec = ModelSpec(n=n, n_u=2 if has_u else None, n_x=3 if has_x else None, binary_t=False)
    data = ModelData(
        t=jnp.full((n,), DO_T),
        y=jnp.asarray(rng.normal(size=n)),
        x=jnp.asarray(rng.normal(size=(n, 3))) if has_x else None,
        sigma_u=jnp.eye(n) * (1 + 1e-13) if has_u else None,
    )
    params = GPSLCParams(
        u=jnp.asarray(rng.normal(size=(n, 2))) if has_u else None,
        uy_ls=jnp.asarray([1.0, 2.0]) if has_u else None,
        xy_ls=jnp.asarray([1.0, 0.5, 2.0]) if has_x else None,
        ty_ls=jnp.asarray(1.0),
        y_noise=jnp.asarray(0.5),
        y_scale=jnp.asarray(1.3),
    )
    return spec, data, params


VARIANTS = [(u, x) for u in (True, False) for x in (True, False)]


@pytest.mark.parametrize("has_u,has_x", VARIANTS)
def test_conditional_ite_identity(has_u, has_x):
    spec, data, params = make_case(has_u, has_x)
    mean, cov = estimation.conditional_ite(spec, data, params, DO_T)
    np.testing.assert_allclose(mean, 0.0, atol=1e-10)
    np.testing.assert_allclose(cov, 0.0, atol=1e-10)


@pytest.mark.parametrize("has_u,has_x", VARIANTS)
def test_conditional_sate_identity(has_u, has_x):
    spec, data, params = make_case(has_u, has_x)
    mean, cov = estimation.conditional_ite(spec, data, params, DO_T)
    ms, vs = estimation.conditional_sate(mean, cov)
    assert float(ms) == pytest.approx(0.0, abs=1e-10)
    assert float(vs) == pytest.approx(0.0, abs=1e-10)


def _stack_params(params, s):
    return jax.tree.map(lambda a: jnp.broadcast_to(a, (s,) + a.shape), params)


@pytest.mark.parametrize("has_u,has_x", VARIANTS)
def test_ite_distributions_identity(has_u, has_x):
    spec, data, params = make_case(has_u, has_x)
    samples = _stack_params(params, 3)
    means, covs = estimation.ite_distributions(spec, data, samples, DO_T, PRED_NOISE)
    assert means.shape == (3, spec.n)
    np.testing.assert_allclose(means, 0.0, atol=1e-10)
    # covariance collapses to the stabilizing diagonal
    for s in range(3):
        np.testing.assert_allclose(covs[s], PRED_NOISE * np.eye(spec.n), atol=1e-12)


def test_ite_samples_variance_matches_prediction_noise():
    spec, data, params = make_case(True, True)
    samples = _stack_params(params, 2)
    means, covs = estimation.ite_distributions(spec, data, samples, DO_T, PRED_NOISE)
    draws = estimation.ite_samples(jax.random.PRNGKey(0), means, covs, 4000)
    assert draws.shape == (spec.n, 2 * 4000)
    assert np.asarray(draws).var() == pytest.approx(PRED_NOISE, rel=0.1)


def test_sate_samples_correct_vs_quirk():
    means = jnp.asarray([0.0, 0.0])
    var = jnp.asarray([4.0, 4.0])
    correct = estimation.sate_samples(jax.random.PRNGKey(0), means, var, 4000)
    assert float(np.std(np.asarray(correct))) == pytest.approx(2.0, rel=0.05)
    # reference quirk: variance used as the std (src/estimation.jl:159)
    quirk = estimation.sate_samples(jax.random.PRNGKey(0), means, var, 4000, reference_quirks=True)
    assert float(np.std(np.asarray(quirk))) == pytest.approx(4.0, rel=0.05)


def test_cross_covariance_not_symmetric_in_general():
    """K(W, W*) is not symmetric when T values differ (src/likelihood.jl:36)."""
    rng = np.random.default_rng(5)
    n = 4
    spec = ModelSpec(n=n, n_u=None, n_x=None, binary_t=False)
    data = ModelData(t=jnp.asarray(rng.normal(size=n)), y=jnp.asarray(rng.normal(size=n)))
    params = GPSLCParams(
        ty_ls=jnp.asarray(1.0), y_noise=jnp.asarray(0.3), y_scale=jnp.asarray(1.0)
    )
    mean, cov = estimation.conditional_ite(spec, data, params, 2.5)
    # nonzero counterfactual shift and finite covariance
    assert float(jnp.max(jnp.abs(mean))) > 0
    assert np.isfinite(np.asarray(cov)).all()
    # ITE covariance is symmetric by construction after symmetrize
    means, covs = estimation.ite_distributions(spec, data, _stack_params(params, 1), 2.5, PRED_NOISE)
    np.testing.assert_allclose(covs[0], np.asarray(covs[0]).T, atol=1e-12)


def test_vector_intervention():
    """Per-individual doT vectors are supported (Intervention union,
    src/types.jl:137-143); doT == T elementwise still gives exactly 0."""
    rng = np.random.default_rng(7)
    n = 5
    spec = ModelSpec(n=n, n_u=None, n_x=None, binary_t=False)
    t = jnp.asarray(rng.normal(size=n))
    data = ModelData(t=t, y=jnp.asarray(rng.normal(size=n)))
    params = GPSLCParams(
        ty_ls=jnp.asarray(1.0), y_noise=jnp.asarray(0.3), y_scale=jnp.asarray(1.0)
    )
    mean, cov = estimation.conditional_ite(spec, data, params, t)
    np.testing.assert_allclose(mean, 0.0, atol=1e-10)
    np.testing.assert_allclose(cov, 0.0, atol=1e-10)
    # heterogeneous intervention differs from any scalar one
    do_vec = jnp.asarray(rng.normal(size=n))
    mean_v, _ = estimation.conditional_ite(spec, data, params, do_vec)
    mean_s, _ = estimation.conditional_ite(spec, data, params, float(do_vec[0]))
    assert not np.allclose(np.asarray(mean_v), np.asarray(mean_s))


def test_counterfactual_outcome_identity():
    """With doT == T the counterfactual outcome posterior equals the factual
    GP posterior mean of f | Y (noise-shrunk toward Y), and ITE mean is its
    difference from the factual prediction — consistency check."""
    rng = np.random.default_rng(9)
    n = 6
    spec = ModelSpec(n=n, n_u=None, n_x=None, binary_t=False)
    t = jnp.asarray(rng.normal(size=n))
    y = jnp.asarray(rng.normal(size=n))
    data = ModelData(t=t, y=y)
    params = GPSLCParams(ty_ls=jnp.asarray(1.0), y_noise=jnp.asarray(0.3), y_scale=jnp.asarray(1.0))
    mean_cf, cov_cf = estimation.conditional_counterfactual_outcome(spec, data, params, t)
    mean_ite, _ = estimation.conditional_ite(spec, data, params, t)
    # factual f|Y mean = K(WW) (K+noise)^-1 y ; ITE = cf - factual = 0 here
    np.testing.assert_allclose(np.asarray(mean_ite), 0.0, atol=1e-10)
    assert np.all(np.diag(np.asarray(cov_cf)) >= -1e-10)
    # shrinkage: |mean_cf| <= |y| envelope roughly (noise-shrunk)
    assert np.all(np.abs(np.asarray(mean_cf)) <= np.abs(np.asarray(y)) + 1.0)


def test_sample_counterfactual_outcomes_api(tmp_path):
    import pathlib

    import causalgpslc_tpu as cg

    hp = cg.default_hyperparameters(n_outer=4, n_mh_inner=1, n_es_inner=1, n_burn_in=2, n_u=1)
    g = cg.gpslc(str(pathlib.Path(__file__).parent / "data" / "no_cov.csv"), hyperparams=hp)
    ycf = cg.sample_counterfactual_outcomes(g, 0.5, samples_per_posterior=3)
    assert ycf.shape == (g.n, g.num_posterior_samples * 3)
    assert np.isfinite(ycf).all()


@pytest.mark.parametrize("has_u,has_x", VARIANTS)
def test_likelihood_distribution_blocks(has_u, has_x):
    """likelihoodDistribution parity (src/likelihood.jl:8-52): block identities.

    With doT == T every block pair collapses (CovWWs == CovWW etc.), and the
    conditional blocks must equal the C - C (CovWWp \\ C) pattern computed
    independently with numpy.
    """
    spec, data, params = make_case(has_u, has_x)
    y, ww, wws, wwp, c11, c12, c21, c22 = estimation.likelihood_distribution(
        spec, data, params, DO_T
    )
    np.testing.assert_allclose(y, data.y)
    np.testing.assert_allclose(wws, ww, atol=1e-12)
    # slot 4 is CovWWp = CovWW + yNoise*I, matching the reference tuple
    np.testing.assert_allclose(
        wwp, np.asarray(ww) + float(params.y_noise) * np.eye(spec.n), atol=1e-12
    )
    # independent numpy check of one block
    wwp_np = np.asarray(ww) + float(params.y_noise) * np.eye(spec.n)
    expected_c11 = np.asarray(ww) - np.asarray(ww) @ np.linalg.solve(wwp_np, np.asarray(ww))
    np.testing.assert_allclose(c11, expected_c11, atol=1e-8)
    for blk in (c12, c21, c22):
        np.testing.assert_allclose(blk, expected_c11, atol=1e-8)


@pytest.mark.parametrize("has_u,has_x", VARIANTS)
def test_likelihood_distribution_blocks_heterogeneous(has_u, has_x):
    """Non-degenerate case (doT != T elementwise): every block checked against
    an independent numpy computation; catches c12/c21 swaps and cov_wws
    transposition bugs the doT == T case cannot see."""
    spec, data, params = make_case(has_u, has_x)
    rng = np.random.default_rng(11)
    t = jnp.asarray(rng.normal(size=spec.n))
    data = data._replace(t=t)
    do_t = 1.7

    y, ww, wws, wwp, c11, c12, c21, c22 = estimation.likelihood_distribution(
        spec, data, params, do_t
    )

    # independent numpy reconstruction of the kernel blocks
    def np_rbf_log(a, b, ls):
        a, b = np.atleast_2d(np.asarray(a).T).T.reshape(spec.n, -1), np.atleast_2d(
            np.asarray(b).T
        ).T.reshape(spec.n, -1)
        ls = np.broadcast_to(np.asarray(ls, dtype=float), (a.shape[1],))
        d = (a[:, None, :] - b[None, :, :]) / ls
        return -(d**2).sum(-1)

    base = np.zeros((spec.n, spec.n))
    if has_u:
        base = base + np_rbf_log(params.u, params.u, params.uy_ls)
    if has_x:
        base = base + np_rbf_log(data.x, data.x, params.xy_ls)
    tv, dv = np.asarray(t), np.full(spec.n, do_t)
    scale, noise = float(params.y_scale), float(params.y_noise)
    ww_np = np.exp(base + np_rbf_log(tv, tv, params.ty_ls)) * scale
    wws_np = np.exp(base + np_rbf_log(tv, dv, params.ty_ls)) * scale
    wsws_np = np.exp(base + np_rbf_log(dv, dv, params.ty_ls)) * scale
    wwp_np = ww_np + noise * np.eye(spec.n)

    np.testing.assert_allclose(ww, ww_np, atol=1e-10)
    np.testing.assert_allclose(wws, wws_np, atol=1e-10)
    np.testing.assert_allclose(wwp, wwp_np, atol=1e-10)

    solve = np.linalg.solve
    np.testing.assert_allclose(c11, ww_np - ww_np @ solve(wwp_np, ww_np), atol=1e-8)
    np.testing.assert_allclose(c12, wws_np - ww_np @ solve(wwp_np, wws_np), atol=1e-8)
    np.testing.assert_allclose(c21, wws_np.T - wws_np.T @ solve(wwp_np, ww_np), atol=1e-8)
    np.testing.assert_allclose(c22, wsws_np - wws_np.T @ solve(wwp_np, wws_np), atol=1e-8)
    # block structure: C12 == C21.T for a symmetric joint covariance
    np.testing.assert_allclose(np.asarray(c12), np.asarray(c21).T, atol=1e-8)
    # reference downstream recipe works off the returned tuple directly
    mean_ite_ref = (wws_np.T - ww_np) @ solve(wwp_np, np.asarray(y))
    mean_ite, _ = estimation.conditional_ite(spec, data, params, do_t)
    np.testing.assert_allclose(mean_ite, mean_ite_ref, atol=1e-8)


def test_extract_parameters_indexes_stacked_pytree():
    """extractParameters parity (src/utils.jl:92-124) on a stacked pytree."""
    spec, data, params = make_case(True, True)
    stacked = jax.tree.map(lambda leaf: jnp.stack([leaf, 2 * leaf]), params)
    p1 = estimation.extract_parameters(stacked, 1)
    np.testing.assert_allclose(p1.ty_ls, 2 * params.ty_ls)
    np.testing.assert_allclose(p1.u, 2 * params.u)
    mean_a, cov_a = estimation.conditional_ite(spec, data, p1, DO_T)
    mean_b, cov_b = estimation.conditional_ite(
        spec, data, jax.tree.map(lambda l: 2 * l, params), DO_T
    )
    np.testing.assert_allclose(mean_a, mean_b)
    np.testing.assert_allclose(cov_a, cov_b)


def test_ite_samples_finite_in_float32():
    """f32 regression: the C-block assembly's cancellation error is absolute
    (~eps * scale(CovWW)), so CovITE can carry eigenvalues ~-1e-5 against a
    ~1e-3 diagonal — Cholesky NaNs no matter the output-relative jitter.
    ite_samples must stay finite via the nearest-PSD eigen factor (this is
    the exact failure measured on NEEC at f32; examples/neec_example.py)."""
    import jax

    rng = np.random.RandomState(0)
    s, n = 4, 40
    # small PSD matrices polluted with absolute noise exceeding their scale
    a = rng.randn(s, n, 3).astype(np.float32) * 1e-2
    cov = np.einsum("sik,sjk->sij", a, a)
    noise = rng.randn(s, n, n).astype(np.float32) * 3e-5
    cov = cov + (noise + noise.transpose(0, 2, 1)) / 2
    assert min(np.linalg.eigvalsh(cov.astype(np.float64))[:, 0]) < 0
    means = jnp.asarray(rng.randn(s, n).astype(np.float32))
    draws = estimation.ite_samples(jax.random.PRNGKey(0), means, jnp.asarray(cov), 5)
    assert draws.shape == (n, s * 5)
    assert bool(jnp.isfinite(draws).all())


def test_ite_samples_float64_matches_cholesky_path():
    """f64 keeps the exact Cholesky parity path (bit-identical draws)."""
    import jax
    from causalgpslc_tpu.ops.linalg import safe_cholesky

    rng = np.random.RandomState(1)
    s, n = 3, 12
    a = rng.randn(s, n, n)
    cov = jnp.asarray(np.einsum("sik,sjk->sij", a, a) + np.eye(n))
    means = jnp.asarray(rng.randn(s, n))
    key = jax.random.PRNGKey(2)
    draws = estimation.ite_samples(key, means, cov, 4)
    chols = safe_cholesky(cov)
    z = jax.random.normal(key, (s, 4, n), dtype=means.dtype)
    expect = (means[:, None, :] + jnp.einsum("sij,smj->smi", chols, z)).reshape(s * 4, n).T
    np.testing.assert_array_equal(np.asarray(draws), np.asarray(expect))
