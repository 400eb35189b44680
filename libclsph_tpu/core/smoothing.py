"""SPH smoothing kernels (Mueller poly6 / spiky / viscosity family).

Vectorised re-implementation of the reference's scalar device functions
(``libclsph/kernels/smoothing.cl:1-33``). Numerics are preserved
exactly — including the reference's idioms:

* compact support enforced by the multiplicative mask
  ``1 - clamp(floor(r/h), 0, 1)`` rather than a branch, and
* the spiky-gradient r -> 0 singularity guard that returns the scalar
  ``-45/(pi h^6)`` broadcast to all three components
  (smoothing.cl:21-29).

All functions take the precomputed coefficient values (structures.h:46)
as plain Python floats (static under jit) and operate on arrays of any
shape; ``r`` may be an ``(..., )`` distance or ``(..., 3)`` displacement
as noted per function.
"""

from __future__ import annotations

import jax.numpy as jnp

from .params import PrecomputedKernelValues

EPSILON = 1e-7  # spiky guard (smoothing.cl:19)


def support_mask(r: jnp.ndarray, h: float) -> jnp.ndarray:
    """The reference's cutoff factor ``1 - clamp(floor(r/h), 0, 1)``.

    1.0 for r < h, 0.0 for r >= h (and for any r >= h, floor >= 1).
    """
    return 1.0 - jnp.clip(jnp.floor(r / h), 0.0, 1.0)


def poly_6(r: jnp.ndarray, h: float, terms: PrecomputedKernelValues) -> jnp.ndarray:
    """W_poly6(r) = 315/(64 pi h^9) (h^2 - r^2)^3 for r<h (smoothing.cl:1-4)."""
    return support_mask(r, h) * terms.poly_6 * (h * h - r * r) ** 3


def poly_6_gradient(
    rvec: jnp.ndarray, h: float, terms: PrecomputedKernelValues
) -> jnp.ndarray:
    """Gradient of poly6; ``rvec`` is the displacement ``(..., 3)``
    (smoothing.cl:6-10)."""
    r = jnp.linalg.norm(rvec, axis=-1, keepdims=True)
    return (
        support_mask(r, h)
        * terms.poly_6_gradient
        * rvec
        * (h * h - r * r) ** 2
    )


def poly_6_laplacian(
    r: jnp.ndarray, h: float, terms: PrecomputedKernelValues
) -> jnp.ndarray:
    """Laplacian of poly6 on scalar distance (smoothing.cl:12-17)."""
    return (
        support_mask(r, h)
        * terms.poly_6_laplacian
        * (h * h - r * r)
        * (3.0 * h * h - 7.0 * r * r)
    )


def spiky_gradient(
    rvec: jnp.ndarray, h: float, terms: PrecomputedKernelValues
) -> jnp.ndarray:
    """Spiky kernel gradient with the r->0 guard (smoothing.cl:21-29).

    For |r| within EPSILON of zero the reference returns the scalar
    ``-45/(pi h^6)`` splatted to all lanes of the float3 — reproduced
    here verbatim (note: *not* ``terms.spiky``-scaled by direction).
    """
    r = jnp.linalg.norm(rvec, axis=-1, keepdims=True)
    near_zero = jnp.abs(r) < EPSILON
    # Avoid 0/0 in the masked-out lane.
    safe_r = jnp.where(near_zero, 1.0, r)
    regular = (
        support_mask(r, h) * terms.spiky * (rvec / safe_r) * (h - r) ** 2
    )
    singular = jnp.full_like(rvec, terms.spiky)
    return jnp.where(near_zero, singular, regular)


def viscosity_laplacian(
    r: jnp.ndarray, h: float, terms: PrecomputedKernelValues
) -> jnp.ndarray:
    """Viscosity kernel Laplacian 45/(pi h^6) (h - r) for r<h
    (smoothing.cl:31-33)."""
    return support_mask(r, h) * terms.viscosity * (h - r)
