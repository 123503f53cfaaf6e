"""Top-level FV solver: wires mesh + convection scheme + BC map.

Reference: ``Feathers/SkunkFvSolver.hpp:44-102`` — ``MhdFvSolverT`` with
default BCs {label 1 → FarField, label 2 → Slip} (``:73-74``),
``calc_func`` = zero f + convection, ``calc_step`` = forward Euler
û = u − dt·f.  Here ``step`` is a pure jittable function.
"""

from __future__ import annotations

from functools import partial

import jax

from stormx.fvm.bc import far_field_bc, slip_bc
from stormx.fvm.convection import linear_upwind_convection, upwind_convection
from stormx.fvm.flux import lax_friedrichs_flux
from stormx.fvm.gradient import lsq_gradient_matrices

__all__ = ["FvSolver"]


class FvSolver:
    """Euler-equation finite-volume solver over a DeviceMesh."""

    def __init__(
        self,
        dmesh,
        *,
        bcs=None,
        order: int = 2,
        flux_scheme=lax_friedrichs_flux,
    ):
        self.dmesh = dmesh
        # Default BC map per the reference (SkunkFvSolver.hpp:73-74).
        self.bcs = bcs if bcs is not None else {1: far_field_bc, 2: slip_bc}
        self.order = order
        self.flux_scheme = flux_scheme
        # Precompute LSQ matrices once (GradientScheme.hpp:50-62).
        self._g_mats = lsq_gradient_matrices(dmesh) if order == 2 else None

    def calc_func(self, u):
        """Spatial discretization f(u) = div·F (SkunkFvSolver.hpp:81-86)."""
        if self.order == 1:
            return upwind_convection(self.dmesh, u, self.bcs, self.flux_scheme)
        return linear_upwind_convection(
            self.dmesh, u, self.bcs, self.flux_scheme, g_mats=self._g_mats
        )

    def step(self, u, dt):
        """Forward Euler û = u − dt·f(u) (SkunkFvSolver.hpp:91-99)."""
        return u - dt * self.calc_func(u)

    def jitted_step(self):
        return jax.jit(self.step)

    def implicit_step(self, u, dt, *, options=None, axis_name=None):
        """Backward-Euler û = u − dt·f(û) via JFNK — BASELINE config #4's
        "Newton-JFNK on a nonlinear FVM residual".

        Solves the nonlinear system A(û) = u with A(w) = w + dt·f(w), where
        f is THIS solver's (1st/2nd-order limited upwind) convection
        operator — the Jacobian is never formed; J·y comes from the
        finite-difference directional derivative inside :func:`stormx.
        solvers.jfnk` (reference ``Solvers/SolverNewton.hpp:101-173``,
        paired with ``calc_step``, ``SkunkFvSolver.hpp:91-99``).

        Returns the :class:`~stormx.solvers.base.SolveResult`; ``res.x`` is
        the implicit state û.
        """
        from stormx.solvers import SolverOptions, jfnk, make_operator

        opts = options or SolverOptions(
            num_iterations=30, absolute_tolerance=0.0, relative_tolerance=1e-10
        )
        A = make_operator(lambda w: w + dt * self.calc_func(w))
        return jfnk(A, u, u, options=opts, axis_name=axis_name)

    def march(self, u0, dt, num_steps: int):
        """``num_steps`` forward-Euler steps as ONE jitted ``lax.scan``.

        The whole time loop is a single device dispatch — on TPU this
        removes per-step host round trips entirely (the reference's loop,
        ``Playground.cpp:231-243``, re-enters C++ per step).
        """

        @jax.jit
        def run(u):
            def body(u, _):
                return self.step(u, dt), None

            out, _ = jax.lax.scan(body, u, None, length=num_steps)
            return out

        return run(u0)
