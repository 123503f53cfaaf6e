"""Preconditioner protocol and sides.

Reference: ``Solvers/Preconditioner.hpp:39-97`` — ``PreconditionerSide``
{Left, Right, Symmetric} and an abstract ``Preconditioner`` with
``build(x, b, op)`` + ``mul``.  The reference ships only the identity
(``:79-97``); the concrete Jacobi/block-Jacobi preconditioners live in
``stormx.precond`` (the reference README lists them as *Planned*,
``README.md:71-82``).
"""

from __future__ import annotations

import enum
from typing import Any, Callable

PyTree = Any

__all__ = ["PreconditionerSide", "Preconditioner", "IdentityPreconditioner", "build_preconditioner"]


class PreconditionerSide(enum.Enum):
    """Reference ``Preconditioner.hpp:39-58``.  Default side is Right
    (``Solver.hpp:74``): right preconditioning does not affect the true
    residual norm used for the stopping criterion."""

    LEFT = "left"
    RIGHT = "right"
    SYMMETRIC = "symmetric"


class Preconditioner:
    """P ≈ 𝓐⁻¹ applied as a pure function over pytree vectors."""

    def build(self, x: PyTree, b: PyTree, op) -> "Preconditioner":
        """Prepare for solving 𝓐x = b.  Returns self (functionally)."""
        return self

    def __call__(self, x: PyTree) -> PyTree:
        raise NotImplementedError

    def conj_apply(self, x: PyTree) -> PyTree:
        raise NotImplementedError


class IdentityPreconditioner(Preconditioner):
    """Debug identity preconditioner (reference ``Preconditioner.hpp:79-97``)."""

    def __call__(self, x: PyTree) -> PyTree:
        return x

    def conj_apply(self, x: PyTree) -> PyTree:
        return x


class FunctionPreconditioner(Preconditioner):
    def __init__(self, fn: Callable[[PyTree], PyTree]):
        self._fn = fn

    def __call__(self, x: PyTree) -> PyTree:
        return self._fn(x)


def build_preconditioner(precond, x, b, op):
    """Normalize the user-supplied preconditioner and run its build phase
    (reference ``Solver.hpp:119-121``)."""
    if precond is None:
        return None
    if isinstance(precond, Preconditioner):
        return precond.build(x, b, op)
    if callable(precond):
        return FunctionPreconditioner(precond)
    raise TypeError(f"cannot interpret {type(precond)!r} as a preconditioner")
