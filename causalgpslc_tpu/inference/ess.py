"""Elliptical slice sampling ("Algorithm 3"), jit/vmap-native.

Parity target: Gen's ``elliptical_slice`` calls over ``:U => k => :U`` and
``:logitT`` (``/root/reference/src/inference.jl:50-54``, ``:232-237``),
implementing Murray, Adams & MacKay (2010), arXiv:1001.0175 (see PAPERS.md).

TPU redesign: the angle-shrinkage loop is a ``lax.while_loop`` with a bounded
iteration cap so it traces once and vmaps across chains (under ``vmap`` the
loop runs until every lane accepts, with converged lanes masked). If the cap
is hit the move returns the current state unchanged. Strictly, truncating
ESS this way is not exactly invariance-preserving (ESS has no accept/reject
correction to absorb a truncation), but the bias is negligible in practice:
the bracket halves in expectation each round, so 64 rounds shrink it below
float resolution, and the cap has never been observed binding (a behavioral
test asserts ``max(ess_iters) < cap``; ``tests/test_inference.py``). The
reference's loop is unbounded.

``loglik_fn`` returns ``(loglik, aux)`` where ``aux`` is any pytree of
per-component log-likelihood terms; the accepted proposal's aux is returned
so callers can keep cached block log-likelihoods coherent without
re-evaluating (the Gibbs loop threads these through consecutive site moves).

Speculative batching (``spec_batch > 1``): the angle-shrinkage recursion
consumes no likelihood values — a rejected angle shrinks the bracket by its
*sign* alone — so the next ``K`` candidate angles are computable from the RNG
chain up front. Each loop round evaluates all ``K`` candidates in ONE batched
``loglik_fn`` call (on TPU: one stacked Cholesky instead of ``K`` sequential
ones, amortizing the ~10 ms per-op latency floor; BASELINE.md) and accepts
the first candidate exceeding the slice level — bit-identical to the
sequential loop (same RNG chain, same accepted state), just a different
execution schedule.
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
    spec_batch: int = 1,
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
      spec_batch: >1 evaluates that many speculative candidate angles per
        loop round in one vmapped ``loglik_fn`` call (bit-identical results;
        see module docstring). 1 = sequential reference-shaped loop.

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

    if cur_aux is None:
        cur_aux = jnp.zeros((), dtype=dtype)

    if spec_batch > 1:
        return _ess_speculative(
            f, nu, log_y, theta, theta_min, theta_max, k_loop, loglik_fn,
            cur_loglik, cur_aux, max_iters, int(spec_batch),
        )

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


class _SpecCarry(NamedTuple):
    theta: jax.Array  # next candidate to evaluate
    theta_min: jax.Array
    theta_max: jax.Array
    key: jax.Array
    accepted: jax.Array
    f_acc: jax.Array
    ll_acc: jax.Array
    aux_acc: object
    iters: jax.Array


def _ess_speculative(
    f, nu, log_y, theta, theta_min, theta_max, k_loop, loglik_fn,
    cur_loglik, cur_aux, max_iters: int, k_spec: int,
):
    """Speculative-batch execution of the angle-shrinkage loop.

    Candidate angle ``i+1`` depends on candidate ``i`` only through its sign
    (the bracket shrink on rejection consumes no likelihood), so each round
    pregenerates ``k_spec`` candidates along the assumed-all-reject path with
    the SAME RNG split chain as the sequential loop, scores them in one
    vmapped ``loglik_fn`` call, and takes the first acceptor. Bit-identical
    to the sequential loop: the accepted angle, log-lik, aux, and iteration
    count all match (candidates past the first acceptor are discarded, and
    their speculative bracket shrinks never escape the round).
    """
    dtype = f.dtype

    def cond(c: _SpecCarry):
        return (~c.accepted) & (c.iters < max_iters)

    def body(c: _SpecCarry):
        # -- pregenerate k_spec candidates along the all-reject path --------
        thetas = []
        th, tmin, tmax, key = c.theta, c.theta_min, c.theta_max, c.key
        for _ in range(k_spec):
            thetas.append(th)
            tmin = jnp.where(th < 0.0, th, tmin)
            tmax = jnp.where(th < 0.0, tmax, th)
            key, sub = jax.random.split(key)
            th = tmin + jax.random.uniform(sub, dtype=dtype) * (tmax - tmin)
        thetas = jnp.stack(thetas)  # (K,)

        # -- one batched likelihood evaluation over all candidates ----------
        f_props = f[None, :] * jnp.cos(thetas)[:, None] + nu[None, :] * jnp.sin(thetas)[:, None]
        lls, auxs = jax.vmap(loglik_fn)(f_props)
        # candidates beyond the sequential cap must not accept (exactness
        # when k_spec does not divide max_iters)
        in_budget = (c.iters + 1 + jnp.arange(k_spec)) <= max_iters
        acc_mask = (lls > log_y) & in_budget
        any_acc = jnp.any(acc_mask)
        j = jnp.argmax(acc_mask)  # first acceptor (0 if none; gated by any_acc)

        f_sel = jnp.where(any_acc, f_props[j], c.f_acc)
        ll_sel = jnp.where(any_acc, lls[j], c.ll_acc)
        aux_sel = jax.tree.map(
            lambda a, b: jnp.where(any_acc, a[j], b), auxs, c.aux_acc
        )
        iters = jnp.minimum(
            c.iters + jnp.where(any_acc, j + 1, k_spec).astype(jnp.int32), max_iters
        )
        return _SpecCarry(th, tmin, tmax, key, any_acc, f_sel, ll_sel, aux_sel, iters)

    init = _SpecCarry(
        theta=theta,
        theta_min=theta_min,
        theta_max=theta_max,
        key=k_loop,
        accepted=jnp.asarray(False),
        f_acc=f,
        ll_acc=cur_loglik,
        aux_acc=cur_aux,
        iters=jnp.zeros((), dtype=jnp.int32),
    )
    out = jax.lax.while_loop(cond, body, init)
    return out.f_acc, out.ll_acc, out.aux_acc, out.iters
