"""Operator abstraction: matrix-free linear/nonlinear operators.

Reference: ``Solvers/Operator.hpp:66-200`` — an abstract ``Operator`` with
``mul(y, x)``, chained ``mul(z, y, other_op, x)`` (y = other(x); z = this(y)),
``Residual``, ``ResidualNorm`` and optional ``conj_mul``.  The TPU-native
re-design replaces the virtual class with a thin wrapper around a pure
callable ``x ↦ A(x)`` over pytree vectors: closures capture operator data
(ELL tables, mesh geometry) as pytrees, so jit tracing sees everything.
"""

from __future__ import annotations

from typing import Any, Callable

from stormx.core.exceptions import StormError
from stormx.ops import vector as v

PyTree = Any

__all__ = ["LinearOperator", "make_operator", "make_symmetric_operator", "as_operator"]


class LinearOperator:
    """Matrix-free operator y = A(x) over pytree vectors.

    ``conj_apply`` is the conjugate (adjoint) product 𝓐*(x); like the
    reference (``Operator.hpp:120-127``), it raises when unset.
    """

    def __init__(
        self,
        apply: Callable[[PyTree], PyTree],
        conj_apply: Callable[[PyTree], PyTree] | None = None,
    ):
        self._apply = apply
        self._conj_apply = conj_apply

    def __call__(self, x: PyTree) -> PyTree:
        return self._apply(x)

    def mul(self, x: PyTree) -> PyTree:
        return self._apply(x)

    def conj_mul(self, x: PyTree) -> PyTree:
        if self._conj_apply is None:
            raise StormError(
                "an operator without the specified conjugate operator"
            )  # matches reference behavior, Operator.hpp:123-126
        return self._conj_apply(x)

    def residual(self, b: PyTree, x: PyTree) -> PyTree:
        """r = b − 𝓐(x) (reference ``Operator.hpp:95-99``)."""
        return v.sub(b, self(x))

    def residual_norm(self, b: PyTree, x: PyTree, axis_name: str | None = None):
        return v.norm_2(self.residual(b, x), axis_name=axis_name)


def make_operator(apply, conj_apply=None) -> LinearOperator:
    """Wrap callables into an operator (reference ``Operator.hpp:174-193``)."""
    return LinearOperator(apply, conj_apply)


def make_symmetric_operator(apply) -> LinearOperator:
    """Self-adjoint operator: 𝓐* = 𝓐 (reference ``Operator.hpp:196-200``)."""
    return LinearOperator(apply, apply)


def as_operator(op) -> LinearOperator:
    """Coerce an operator-like object: LinearOperator, sparse matrix
    (anything with ``.matvec``), or a bare callable."""
    if isinstance(op, LinearOperator):
        return op
    if hasattr(op, "matvec"):
        return LinearOperator(op.matvec)
    if callable(op):
        return LinearOperator(op)
    raise TypeError(f"cannot interpret {type(op)!r} as an operator")
