"""Krylov (inner-solver) preconditioner.

Reference ``README.md:81`` lists **Krylov** as a *Planned* flexible
preconditioner: M⁻¹r is approximated by a few iterations of an inner
Krylov solver on 𝓐z = r.  Because the inner iteration count depends on r,
the map r ↦ z is *nonlinear* — pair it with a flexible outer method
(FGMRES, ``solvers.fgmres``), exactly as the reference's "Flexible = Yes"
column prescribes.

The whole inner solve is the existing ``lax.while_loop`` driver, so the
composite solver still jits as one program and shards unchanged.
"""

from __future__ import annotations

from stormx.solvers.preconditioner import Preconditioner

__all__ = ["KrylovPreconditioner"]


class KrylovPreconditioner(Preconditioner):
    """M⁻¹ ≈ a fixed-budget inner Krylov solve of 𝓐z = r.

    ``method`` is any name from ``stormx.solvers.SOLVERS``;
    ``num_iterations`` caps the inner work (default 8);
    ``relative_tolerance`` lets well-conditioned residuals exit early
    (default 1e-2 — loose, it is only a preconditioner).
    """

    def __init__(
        self,
        op=None,
        *,
        method: str = "cg",
        num_iterations: int = 8,
        relative_tolerance: float = 1.0e-2,
        inner_precond=None,
        axis_name: str | None = None,
    ):
        self._op = op
        self._method = method
        self._inner_iters = num_iterations
        self._rtol = relative_tolerance
        self._inner_precond = inner_precond
        self._axis_name = axis_name

    def build(self, x, b, op):
        if self._op is None:
            self._op = op
        return self

    def with_axis_name(self, axis_name):
        """Functional copy whose inner reductions psum over ``axis_name``.

        Used by ``stormx.parallel.sharded_solve`` — returns a new instance
        so the user's preconditioner is never mutated (reusing it in a later
        serial solve would otherwise psum outside any shard_map and fail).
        """
        return KrylovPreconditioner(
            self._op,
            method=self._method,
            num_iterations=self._inner_iters,
            relative_tolerance=self._rtol,
            inner_precond=self._inner_precond,
            axis_name=axis_name,
        )

    def __call__(self, r):
        from stormx.ops import vector as v
        from stormx.solvers import SOLVERS
        from stormx.solvers.base import SolverOptions

        if self._op is None:
            raise ValueError(
                "KrylovPreconditioner has no operator; pass one or let the "
                "outer solver call build()"
            )
        options = SolverOptions(
            num_iterations=self._inner_iters,
            absolute_tolerance=0.0,
            relative_tolerance=self._rtol,
            record_history=False,
        )
        kwargs = {"options": options}
        if self._inner_precond is not None:
            kwargs["precond"] = self._inner_precond
        if self._axis_name is not None:
            kwargs["axis_name"] = self._axis_name
        result = SOLVERS[self._method](self._op, r, v.zeros_like(r), **kwargs)
        return result.x

    def conj_apply(self, r):
        raise NotImplementedError(
            "Krylov preconditioning is nonlinear; no adjoint apply exists — "
            "use it with a flexible method (FGMRES)"
        )
