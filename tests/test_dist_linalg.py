"""Distributed (N-sharded) linalg vs dense references, on the 8-device CPU mesh.

SURVEY.md §4 ("add a multi-host tier the reference lacks"): these exercise
the large-N sharded path (BASELINE config #4) without TPU hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from causalgpslc_tpu.ops.dist_linalg import (
    dist_cholesky,
    dist_forward_solve_quad,
    dist_mvn_logpdf,
    dist_rbf_cov_rows,
)
from causalgpslc_tpu.ops.linalg import mvn_logpdf
from causalgpslc_tpu.parallel.large_n import n_mesh, sharded_gp_logpdf

D = 8


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, n))
    return a @ a.T + n * np.eye(n)


def _shmap(fn, mesh):
    # check_vma=False: test bodies return all_gather'd (device-identical but
    # vma-varying) values under replicated out_specs.
    return jax.jit(
        jax.shard_map(fn, mesh=mesh, in_specs=P(), out_specs=P(), check_vma=False)
    )


def _idx(d, n_local):
    return jnp.asarray(d * n_local, dtype=jnp.int32), jnp.asarray(0, dtype=jnp.int32)


@pytest.mark.parametrize("n,block", [(128, 16), (256, 32)])
def test_dist_cholesky_matches_dense(n, block):
    mesh = n_mesh(D)
    a = _spd(n)
    n_local = n // D

    def body(a_full):
        d = jax.lax.axis_index("n")
        i, z = _idx(d, n_local)
        a_loc = jax.lax.dynamic_slice(a_full, (i, z), (n_local, n))
        l_loc = dist_cholesky(a_loc, axis="n", block=block)
        return jax.lax.all_gather(l_loc, "n", tiled=True)

    l = np.asarray(_shmap(body, mesh)(jnp.asarray(a)))
    np.testing.assert_allclose(l, np.linalg.cholesky(a), rtol=1e-9, atol=1e-9)


def test_dist_mvn_logpdf_matches_dense():
    n, block = 256, 32
    mesh = n_mesh(D)
    a = _spd(n, seed=1)
    y = np.random.default_rng(2).normal(size=n)
    n_local = n // D

    def body(a_full, y_full):
        d = jax.lax.axis_index("n")
        i, z = _idx(d, n_local)
        a_loc = jax.lax.dynamic_slice(a_full, (i, z), (n_local, n))
        y_loc = jax.lax.dynamic_slice(y_full, (i,), (n_local,))
        return dist_mvn_logpdf(a_loc, y_loc, axis="n", block=block)

    got = float(_shmap(body, mesh)(jnp.asarray(a), jnp.asarray(y)))
    want = float(mvn_logpdf(jnp.asarray(y), jnp.asarray(a)))
    assert got == pytest.approx(want, rel=1e-10)


def test_dist_forward_solve_quad_logdet():
    n, block = 128, 16
    mesh = n_mesh(D)
    a = _spd(n, seed=3)
    y = np.random.default_rng(4).normal(size=n)
    l_dense = np.linalg.cholesky(a)
    n_local = n // D

    def body(l_full, y_full):
        d = jax.lax.axis_index("n")
        i, z = _idx(d, n_local)
        l_loc = jax.lax.dynamic_slice(l_full, (i, z), (n_local, n))
        y_loc = jax.lax.dynamic_slice(y_full, (i,), (n_local,))
        return dist_forward_solve_quad(l_loc, y_loc, axis="n", block=block)

    quad, logdet = _shmap(body, mesh)(jnp.asarray(l_dense), jnp.asarray(y))
    z = np.linalg.solve(l_dense, y)
    assert float(quad) == pytest.approx(float(z @ z), rel=1e-10)
    assert float(logdet) == pytest.approx(float(np.linalg.slogdet(a)[1]), rel=1e-10)


def test_dist_rbf_cov_rows_matches_dense():
    n, d_feat = 128, 3
    mesh = n_mesh(D)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(n, d_feat)))
    ls = jnp.asarray([0.7, 1.3, 2.0])
    scale, noise = 1.7, 0.3
    n_local = n // D

    def body(x_full):
        loc = dist_rbf_cov_rows(
            [x_full], [ls], scale, noise, axis="n", n_local=n_local
        )
        return jax.lax.all_gather(loc, "n", tiled=True)

    got = np.asarray(_shmap(body, mesh)(x))
    from causalgpslc_tpu.ops.kernels import process_cov, rbf_kernel_log

    want = np.asarray(process_cov(rbf_kernel_log(x, x, ls), scale, noise))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("n", [96, 100])  # 100 exercises sentinel padding
def test_sharded_gp_logpdf_matches_dense(n):
    rng = np.random.default_rng(6)
    feats = jnp.asarray(rng.normal(size=(n, 2)))
    y = jnp.asarray(rng.normal(size=n))
    scale, noise = 2.0, 0.5
    got = float(sharded_gp_logpdf(feats, y, scale, noise, mesh=n_mesh(D), block=16))

    from causalgpslc_tpu.ops.kernels import rbf_kernel_log

    cov = jnp.exp(rbf_kernel_log(feats, feats, jnp.ones(()))) * scale + noise * jnp.eye(n)
    want = float(mvn_logpdf(y, cov))
    assert got == pytest.approx(want, rel=1e-10)


def test_sharded_gp_logpdf_float32_with_padding():
    """float32 + sentinel padding regression: the dot-form log-RBF on the
    O(1e4) sentinel coordinates cancels catastrophically in f32 (error
    ~|a|^2 * eps ~ 1e5), and exp(+1e5) = inf NaN'd the distributed Cholesky
    before the <=0 clamp. N chosen to force pad rows."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from causalgpslc_tpu.ops.linalg import mvn_logpdf
    from causalgpslc_tpu.parallel.large_n import n_mesh, sharded_gp_logpdf

    n = 52  # pads to 64 on the 8-way mesh at block=8
    rng = np.random.default_rng(3)
    f = jnp.asarray(rng.normal(size=(n, 2)), dtype=jnp.float32)
    y = jnp.asarray(rng.normal(size=n), dtype=jnp.float32)
    got = sharded_gp_logpdf(f, y, 1.3, 0.6, mesh=n_mesh(8), block=8)
    assert np.isfinite(float(got))
    # dense f32 reference with the same relative jitter policy
    from causalgpslc_tpu.ops.kernels import process_cov, rbf_kernel_log

    jit = 1e-5 * (1.3 + 0.6)
    cov = process_cov(rbf_kernel_log(f, f, jnp.float32(1.0)), 1.3, 0.6 + jit)
    want = float(mvn_logpdf(y, cov.astype(jnp.float32)))
    assert float(got) == pytest.approx(want, rel=2e-4)
