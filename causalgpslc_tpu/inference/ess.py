"""Elliptical slice sampling ("Algorithm 3"), jit/vmap-native.

Parity target: Gen's ``elliptical_slice`` calls over ``:U => k => :U`` and
``:logitT`` (``/root/reference/src/inference.jl:50-54``, ``:232-237``),
implementing Murray, Adams & MacKay (2010), arXiv:1001.0175 (see PAPERS.md).

TPU redesign: the angle-shrinkage loop is a ``lax.while_loop`` with a bounded
iteration cap so it traces once and vmaps across chains (under ``vmap`` the
loop runs until every lane accepts, with converged lanes masked). If the cap
is hit the move degrades to a rejection (state unchanged), which preserves
the stationary distribution. The reference's loop is unbounded; in practice
ESS accepts within a handful of shrinks, so the cap (64) is never binding.

``loglik_fn`` returns ``(loglik, aux)`` where ``aux`` is any pytree of
per-component log-likelihood terms; the accepted proposal's aux is returned
so callers can keep cached block log-likelihoods coherent without
re-evaluating (the Gibbs loop threads these through consecutive site moves).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["ess_update"]

_TWO_PI = 2.0 * jnp.pi


class _EssCarry(NamedTuple):
    theta: jax.Array
    theta_min: jax.Array
    theta_max: jax.Array
    f_prop: jax.Array
    ll_prop: jax.Array
    aux_prop: object
    accepted: jax.Array
    key: jax.Array
    iters: jax.Array


def ess_update(
    key: jax.Array,
    f: jax.Array,
    chol_prior: jax.Array,
    loglik_fn: Callable,
    cur_loglik: jax.Array,
    cur_aux=None,
    max_iters: int = 64,
):
    """One elliptical-slice move for a site with prior ``N(0, L L.T)``.

    Args:
      key: PRNG key.
      f: current value, shape ``(n,)``.
      chol_prior: lower Cholesky factor of the prior covariance, or a
        callable ``key -> nu`` drawing from the prior directly (used when the
        prior has O(n) structure, e.g. the block SigmaU of
        ``ops/structured.py``, and a dense factor is never formed).
      loglik_fn: ``f -> (loglik, aux)`` — likelihood of the site (the joint
        with the prior factored out, what Gen's ``elliptical_slice`` scores).
      cur_loglik / cur_aux: cached ``loglik_fn(f)`` at the current state.

    Returns:
      ``(f_new, loglik_new, aux_new, n_iters)``.
    """
    dtype = f.dtype
    k_nu, k_logy, k_theta, k_loop = jax.random.split(key, 4)

    if callable(chol_prior):
        nu = chol_prior(k_nu)
    else:
        nu = chol_prior @ jax.random.normal(k_nu, f.shape, dtype=dtype)
    log_y = cur_loglik + jnp.log(jax.random.uniform(k_logy, dtype=dtype))

    theta = jax.random.uniform(k_theta, dtype=dtype) * _TWO_PI
    theta_min = theta - _TWO_PI
    theta_max = theta

    def cond(c: _EssCarry):
        return (~c.accepted) & (c.iters < max_iters)

    def body(c: _EssCarry):
        f_prop = f * jnp.cos(c.theta) + nu * jnp.sin(c.theta)
        ll, aux = loglik_fn(f_prop)
        accepted = ll > log_y
        # shrink the bracket toward 0 on rejection
        shrink_min = jnp.where(c.theta < 0.0, c.theta, c.theta_min)
        shrink_max = jnp.where(c.theta < 0.0, c.theta_max, c.theta)
        new_min = jnp.where(accepted, c.theta_min, shrink_min)
        new_max = jnp.where(accepted, c.theta_max, shrink_max)
        key, sub = jax.random.split(c.key)
        new_theta = jnp.where(
            accepted,
            c.theta,
            new_min + jax.random.uniform(sub, dtype=dtype) * (new_max - new_min),
        )
        return _EssCarry(new_theta, new_min, new_max, f_prop, ll, aux, accepted, key, c.iters + 1)

    if cur_aux is None:
        cur_aux = jnp.zeros((), dtype=dtype)
    init = _EssCarry(
        theta=theta,
        theta_min=theta_min,
        theta_max=theta_max,
        f_prop=f,
        ll_prop=cur_loglik,
        aux_prop=cur_aux,
        accepted=jnp.asarray(False),
        key=k_loop,
        iters=jnp.zeros((), dtype=jnp.int32),
    )
    out = jax.lax.while_loop(cond, body, init)

    acc = out.accepted
    f_new = jnp.where(acc, out.f_prop, f)
    ll_new = jnp.where(acc, out.ll_prop, cur_loglik)
    aux_new = jax.tree.map(lambda a, b: jnp.where(acc, a, b), out.aux_prop, cur_aux)
    return f_new, ll_new, aux_new, out.iters
