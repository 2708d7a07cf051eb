"""Parameter-state construction: which sites exist, prior initialization.

Prior initialization mirrors ``Gen.generate(model, args, obs)`` used to seed
the Markov chain (``/root/reference/src/inference.jl:20`` etc.): unobserved
sites are drawn from their prior in topological order — InvGamma
hyperparameters, then ``U ~ N(0, SigmaU * uNoise)`` per column, then (binary
variants) ``logitT ~ N(0, tCov(U, X, hypers))``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.distributions import inv_gamma_sample
from ..ops.linalg import safe_cholesky
from .blocks import FIELD_PRIOR_NAMES, t_cov, u_cov
from .spec import GPSLCParams, ModelData, ModelSpec

__all__ = ["hyper_fields", "field_shape", "init_from_prior"]


def hyper_fields(spec: ModelSpec) -> list[str]:
    """Hyperparameter sites present in this variant, in the reference's MH
    sweep order (``src/inference.jl:23-44`` and per-variant dispatches).

    Note the NoU variants have no ``x_noise``/``x_scale``/``ux_ls``: there X is
    drawn from a fixed standard-normal prior (``src/model_prior.jl:175-181``),
    and the NoU-NoCov variants keep only the outcome block's three sites
    (``src/inference.jl:157-163``).
    """
    if spec.has_u and spec.has_x:
        return [
            "u_noise", "x_noise", "t_noise", "y_noise",
            "ux_ls", "ut_ls", "uy_ls", "xt_ls", "xy_ls", "ty_ls",
            "x_scale", "t_scale", "y_scale",
        ]
    if spec.has_u:
        return ["u_noise", "t_noise", "y_noise", "ut_ls", "uy_ls", "ty_ls", "t_scale", "y_scale"]
    if spec.has_x:
        return ["t_noise", "y_noise", "xt_ls", "xy_ls", "ty_ls", "t_scale", "y_scale"]
    return ["y_noise", "ty_ls", "y_scale"]


def field_shape(spec: ModelSpec, field: str) -> tuple[int, ...]:
    if field in ("u_noise", "t_noise", "y_noise", "ty_ls", "t_scale", "y_scale"):
        return ()
    if field in ("x_noise", "xt_ls", "xy_ls", "x_scale"):
        return (spec.n_x,)
    if field in ("ut_ls", "uy_ls"):
        return (spec.n_u,)
    if field == "ux_ls":
        return (spec.n_x, spec.n_u)
    raise ValueError(field)


def init_from_prior(
    key: jax.Array,
    spec: ModelSpec,
    priors: dict,
    data: ModelData,
    dtype=jnp.float64,
) -> GPSLCParams:
    """Sample every latent site from its prior (observed sites are in ``data``)."""
    fields = hyper_fields(spec)
    keys = jax.random.split(key, len(fields) + 2)
    values: dict[str, Optional[jax.Array]] = {}
    for k, field in zip(keys, fields):
        stem = FIELD_PRIOR_NAMES[field]
        shape = jnp.asarray(priors[stem + "Shape"], dtype=dtype)
        scale = jnp.asarray(priors[stem + "Scale"], dtype=dtype)
        values[field] = inv_gamma_sample(k, shape, scale, sample_shape=field_shape(spec, field))

    params = GPSLCParams(**values)

    if spec.has_u:
        chol = safe_cholesky(u_cov(data, params))
        z = jax.random.normal(keys[-2], (spec.n, spec.n_u), dtype=dtype)
        params = params._replace(u=chol @ z)

    if spec.binary_t:
        if spec.has_u or spec.has_x:
            tc = t_cov(spec, data, params)
            tchol = safe_cholesky(tc)
            z = jax.random.normal(keys[-1], (spec.n,), dtype=dtype)
            params = params._replace(logit_t=tchol @ z)
        else:
            params = params._replace(
                logit_t=jax.random.normal(keys[-1], (spec.n,), dtype=dtype)
            )

    return params
