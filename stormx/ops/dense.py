"""Small dense helpers — the Bittern/legacy-DenseMatrix parity surface.

The reference's dense expression-template library ("Bittern") maps almost
entirely onto ``jnp`` (SURVEY §2.3); what warrants real code here is the
functionality jnp does not spell identically:

* ``AABB`` — axis-aligned bounding box with ``extend`` (``Bittern/AABB.hpp:
  32-69``), used for mesh extents.
* ``cross_product`` — 2-D (scalar z) and 3-D variants
  (``Bittern/MatrixProduct.hpp:90-138``).
* LU solve/inverse for the small dense systems inside BiCGStab(l)/IDR(s)/
  GMRES (legacy ``Solvers/MatrixDense.hpp:43-234`` ``decompose_lu/
  inplace_solve_lu/inplace_inverse_lu``) — thin wrappers over
  ``jax.scipy.linalg`` keeping the reference's call names.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
from jax.scipy.linalg import lu_factor, lu_solve

__all__ = ["AABB", "aabb_of", "cross_product", "solve_lu", "inverse_lu"]


@dataclass(frozen=True)
class AABB:
    """Axis-aligned bounding box (reference ``Bittern/AABB.hpp:32-69``)."""

    min: jnp.ndarray
    max: jnp.ndarray

    def extend(self, point_or_box) -> "AABB":
        if isinstance(point_or_box, AABB):
            other_min, other_max = point_or_box.min, point_or_box.max
        else:
            other_min = other_max = jnp.asarray(point_or_box)
        return AABB(
            min=jnp.minimum(self.min, other_min),
            max=jnp.maximum(self.max, other_max),
        )

    @property
    def center(self) -> jnp.ndarray:
        return 0.5 * (self.min + self.max)

    @property
    def extents(self) -> jnp.ndarray:
        return self.max - self.min


def aabb_of(points) -> AABB:
    """Bounding box of an (n, dim) point set (one min/max reduction each)."""
    points = jnp.asarray(points)
    return AABB(min=points.min(axis=0), max=points.max(axis=0))


def cross_product(a, b):
    """Cross product: 3-D → vector; 2-D → scalar z-component.

    Reference ``CrossProductView`` (``Bittern/MatrixProduct.hpp:90-138``).
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if a.shape[-1] == 2:
        return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]
    return jnp.cross(a, b)


def solve_lu(a, b):
    """x = a⁻¹·b via LU (reference ``inplace_solve_lu``)."""
    return lu_solve(lu_factor(a), b)


def inverse_lu(a):
    """a⁻¹ via LU (reference ``inplace_inverse_lu``)."""
    a = jnp.asarray(a)
    return lu_solve(lu_factor(a), jnp.eye(a.shape[-1], dtype=a.dtype))
