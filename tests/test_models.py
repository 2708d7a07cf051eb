"""Model-core tests: spec construction, prior init, finite log-joints.

Tier-2 analog of the reference's model smoke tests (`test/model.jl:1-64`):
every one of the 8 variants must initialize from its prior under observed
data and produce a finite log-joint.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from causalgpslc_tpu.hyperparameters import default_prior_parameters
from causalgpslc_tpu.models import blocks
from causalgpslc_tpu.models.spec import GPSLCParams, ModelData, ModelSpec
from causalgpslc_tpu.models.state import field_shape, hyper_fields, init_from_prior

N = 12


def make_case(has_u, has_x, binary_t, seed=0):
    rng = np.random.default_rng(seed)
    spec = ModelSpec(
        n=N, n_u=2 if has_u else None, n_x=3 if has_x else None, binary_t=binary_t
    )
    sigma_u = None
    if has_u:
        sigma_u = np.kron(np.eye(N // 4), np.ones((4, 4))) + 1e-13 * np.eye(N)
    t = rng.integers(0, 2, N).astype(float) if binary_t else rng.normal(size=N)
    data = ModelData(
        t=jnp.asarray(t),
        y=jnp.asarray(rng.normal(size=N)),
        x=jnp.asarray(rng.normal(size=(N, 3))) if has_x else None,
        sigma_u=jnp.asarray(sigma_u) if has_u else None,
    )
    return spec, data


ALL_VARIANTS = [
    (u, x, b) for u in (True, False) for x in (True, False) for b in (True, False)
]


@pytest.mark.parametrize("has_u,has_x,binary_t", ALL_VARIANTS)
def test_variant_names(has_u, has_x, binary_t):
    spec, _ = make_case(has_u, has_x, binary_t)
    name = spec.name
    assert name.startswith("CausalGPSLC")
    assert ("NoU" in name) == (not has_u)
    assert ("NoCov" in name) == (not has_x)
    assert name.endswith("BinaryT" if binary_t else "RealT")


@pytest.mark.parametrize("has_u,has_x,binary_t", ALL_VARIANTS)
def test_init_from_prior_and_log_joint(has_u, has_x, binary_t):
    spec, data = make_case(has_u, has_x, binary_t)
    pp = default_prior_parameters()
    params = init_from_prior(jax.random.PRNGKey(0), spec, pp, data)

    # field presence matches the variant
    for f in hyper_fields(spec):
        val = getattr(params, f)
        assert val is not None
        assert val.shape == field_shape(spec, f)
        assert bool(jnp.all(val > 0))
    assert (params.u is not None) == has_u
    if has_u:
        assert params.u.shape == (N, 2)
    assert (params.logit_t is not None) == binary_t

    lp = blocks.log_joint(spec, pp, data, params)
    assert np.isfinite(float(lp))


@pytest.mark.parametrize("has_u,has_x,binary_t", ALL_VARIANTS)
def test_block_lps_sum_consistent(has_u, has_x, binary_t):
    """compute_block_lps components must agree with direct block calls."""
    spec, data = make_case(has_u, has_x, binary_t, seed=1)
    pp = default_prior_parameters()
    params = init_from_prior(jax.random.PRNGKey(1), spec, pp, data)
    lps = blocks.compute_block_lps(spec, data, params)
    assert np.isfinite(float(lps.t)) and np.isfinite(float(lps.y))
    if has_u:
        assert float(lps.u) == pytest.approx(float(blocks.logp_u(spec, data, params)))
        if has_x:
            per_k = [float(blocks.logp_x_k(spec, data, params, k)) for k in range(3)]
            np.testing.assert_allclose(np.asarray(lps.x), per_k, rtol=1e-12)
    else:
        assert lps.u is None and lps.x is None


def test_additive_log_kernel_is_product_kernel():
    """Additive log-RBF over (U, X, T) equals the product of RBF kernels."""
    spec, data = make_case(True, True, False, seed=2)
    pp = default_prior_parameters()
    params = init_from_prior(jax.random.PRNGKey(2), spec, pp, data)
    from causalgpslc_tpu.ops.kernels import rbf_kernel_log

    log_y = blocks.y_kernel_log(spec, data, params)
    ku = np.exp(np.asarray(rbf_kernel_log(params.u, params.u, params.uy_ls)))
    kx = np.exp(np.asarray(rbf_kernel_log(data.x, data.x, params.xy_ls)))
    kt = np.exp(np.asarray(rbf_kernel_log(data.t, data.t, params.ty_ls)))
    np.testing.assert_allclose(np.exp(np.asarray(log_y)), ku * kx * kt, rtol=1e-10)


def test_binary_t_prior_logit_cov():
    """Binary init draws logitT from N(0, tCov) built at the sampled hypers."""
    spec, data = make_case(True, True, True, seed=3)
    pp = default_prior_parameters()
    keys = jax.random.split(jax.random.PRNGKey(3), 200)
    lts = np.stack(
        [np.asarray(init_from_prior(k, spec, pp, data).logit_t) for k in keys]
    )
    assert np.isfinite(lts).all()
    assert lts.std() > 0.1
