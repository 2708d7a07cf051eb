"""Static model specification and data pytrees for the GPSLC family.

The reference ships 8 separate ``@gen`` models
(``/root/reference/src/model.jl:11-130``) selected by multiple dispatch on
``{X present?} x {T binary?} x {U present?}``. Here the family is ONE
parametric model: a static :class:`ModelSpec` (hashable, jit-static) records
which blocks exist, and the per-block log-densities compose accordingly.
Absent blocks are ``None`` fields in the parameter pytree — static structure,
so every variant compiles to exactly the code it needs.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ModelSpec", "ModelData", "GPSLCParams", "make_model_data"]


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Which GPSLC variant: shapes + treatment type. Hashable => jit-static."""

    n: int
    n_u: Optional[int]  # None => no latent confounders (NoU variants)
    n_x: Optional[int]  # None => no covariates (NoCov variants)
    binary_t: bool

    @property
    def has_u(self) -> bool:
        return self.n_u is not None

    @property
    def has_x(self) -> bool:
        return self.n_x is not None

    @property
    def name(self) -> str:
        """Reference model name this spec corresponds to (``src/model.jl``)."""
        return (
            "CausalGPSLC"
            + ("" if self.has_u else "NoU")
            + ("" if self.has_x else "NoCov")
            + ("BinaryT" if self.binary_t else "RealT")
        )


class ModelData(NamedTuple):
    """Observed data + confounder structure, device-resident.

    ``t`` is float even for binary treatments ({0., 1.}): the outcome GP's
    treatment kernel consumes it numerically either way, exactly as the
    reference applies ``rbfKernelLog`` to ``Vector{Bool}``
    (``src/model_likelihood.jl:83-91``).
    """

    t: jax.Array  # (n,)
    y: jax.Array  # (n,)
    x: Optional[jax.Array] = None  # (n, nX)
    sigma_u: Optional[jax.Array] = None  # (n, n)


class GPSLCParams(NamedTuple):
    """One chain's state: every latent site of the model.

    Site inventory matches the reference trace addresses
    (``src/proposal.jl:7-24`` plus ``:U`` and ``:logitT``); fields are ``None``
    when the variant lacks the block. ``ux_ls`` is (nX, nU): row k holds the
    ARD lengthscales of the nU confounder dims for covariate k, as consumed by
    ``generateXfromU`` (``src/model_likelihood.jl:13-22``).
    """

    u_noise: Optional[jax.Array] = None  # ()
    x_noise: Optional[jax.Array] = None  # (nX,)
    t_noise: Optional[jax.Array] = None  # ()
    y_noise: Optional[jax.Array] = None  # ()
    ux_ls: Optional[jax.Array] = None  # (nX, nU)
    ut_ls: Optional[jax.Array] = None  # (nU,)
    uy_ls: Optional[jax.Array] = None  # (nU,)
    xt_ls: Optional[jax.Array] = None  # (nX,)
    xy_ls: Optional[jax.Array] = None  # (nX,)
    ty_ls: Optional[jax.Array] = None  # ()
    x_scale: Optional[jax.Array] = None  # (nX,)
    t_scale: Optional[jax.Array] = None  # ()
    y_scale: Optional[jax.Array] = None  # ()
    u: Optional[jax.Array] = None  # (n, nU)
    logit_t: Optional[jax.Array] = None  # (n,)


def make_model_data(prepared, n_u: Optional[int] = 1, dtype=jnp.float64) -> tuple[ModelSpec, ModelData]:
    """Lift a host-side :class:`~causalgpslc_tpu.data.PreparedData` onto device.

    ``n_u`` (reference default 1, ``src/hyperparameters.jl:86``) is forced to
    ``None`` when the data has no object structure, mirroring the
    ``GPSLCObject`` constructors that null out ``nU`` (``src/types.jl:278``).
    """
    spec = ModelSpec(
        n=int(prepared.t.shape[0]),
        n_u=n_u if prepared.sigma_u is not None else None,
        n_x=prepared.n_x,
        binary_t=prepared.binary_t,
    )
    data = ModelData(
        t=jnp.asarray(np.asarray(prepared.t), dtype=dtype),
        y=jnp.asarray(np.asarray(prepared.y), dtype=dtype),
        x=None if prepared.x is None else jnp.asarray(prepared.x, dtype=dtype),
        sigma_u=None if prepared.sigma_u is None else jnp.asarray(prepared.sigma_u, dtype=dtype),
    )
    return spec, data
