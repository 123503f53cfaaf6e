"""Newton and first-order JFNK nonlinear solvers.

Reference: ``Solvers/SolverNewton.hpp``.
  * ``NewtonSolver`` is a stub that aborts (``:59-69``); here it is
    implemented properly: the user supplies a Jacobian-operator factory
    ``jacobian(x) -> LinearOperator`` (falling back to JAX autodiff ``jvp``
    when omitted — something the C++ reference could not offer).
  * ``JfnkSolver`` (``:101-173``): finite-difference directional derivative
    J(x)·y ≈ [𝓐(x + δ·y) − 𝓐(x)]/δ with δ = μ·‖y‖⁺,
    μ = √εₘ·√(1 + ‖x‖), inner BiCGStab at tolerance 1e-8 (``:140-157``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stormx.ops import safe_divide
from stormx.ops import vector as v
from stormx.solvers.base import SolveResult, SolverOptions, run_iterative
from stormx.solvers.bicgstab import bicgstab
from stormx.solvers.operator import LinearOperator, as_operator

__all__ = ["newton", "jfnk"]


def _default_inner_options() -> SolverOptions:
    # Inner tolerances from the reference (SolverNewton.hpp:141-142).
    return SolverOptions(
        absolute_tolerance=1.0e-8, relative_tolerance=1.0e-8, record_history=False
    )


def newton(
    op,
    b,
    x0,
    *,
    jacobian=None,
    inner_solve=None,
    options: SolverOptions | None = None,
    axis_name: str | None = None,
) -> SolveResult:
    """Newton iterations: solve [∂𝓐(x)/∂x]·t = r, x ← x + t.

    ``jacobian(x)`` must return the linearization of 𝓐 at x as an operator;
    when None, JAX forward-mode ``jvp`` provides the exact Jacobian-vector
    product — the TPU-native answer to the reference's unimplemented stub.
    """
    opts = options or SolverOptions()
    A = as_operator(op)
    inner_opts = _default_inner_options()
    solve_inner = inner_solve or (
        lambda J, r, t0: bicgstab(J, r, t0, options=inner_opts, axis_name=axis_name)
    )

    def jac_at(x):
        if jacobian is not None:
            return as_operator(jacobian(x))
        return LinearOperator(lambda y: jax.jvp(A.mul, (x,), (y,))[1])

    def init_fn(x):
        w = A(x)
        r = v.sub(b, w)
        return (r, w), v.norm_2(r, axis_name=axis_name)

    def iterate_fn(it, x, state):
        r, w = state
        t = solve_inner(jac_at(x), r, r).x
        x = v.add(x, t)
        w = A(x)
        r = v.sub(b, w)
        return x, (r, w), v.norm_2(r, axis_name=axis_name)

    return run_iterative(init_fn, iterate_fn, None, x0, opts)


def jfnk(
    op,
    b,
    x0,
    *,
    inner_solve=None,
    options: SolverOptions | None = None,
    axis_name: str | None = None,
) -> SolveResult:
    """First-order Jacobian-free Newton–Krylov (``SolverNewton.hpp:101-173``)."""
    opts = options or SolverOptions()
    A = as_operator(op)
    inner_opts = _default_inner_options()
    solve_inner = inner_solve or (
        lambda J, r, t0: bicgstab(J, r, t0, options=inner_opts, axis_name=axis_name)
    )

    def init_fn(x):
        # w ← 𝓐(x); r ← b − w (:115-123).
        w = A(x)
        r = v.sub(b, w)
        return (r, w), v.norm_2(r, axis_name=axis_name)

    def iterate_fn(it, x, state):
        r, w = state
        dtype = jnp.result_type(*jax.tree_util.tree_leaves(r))
        sqrt_eps = jnp.sqrt(jnp.finfo(dtype).eps)
        # μ ← √εₘ·√(1 + ‖x‖) (:135-137).
        mu = sqrt_eps * jnp.sqrt(1.0 + v.norm_2(x, axis_name=axis_name))

        def jv(y):
            # δ ← μ·‖y‖⁺; z ← [𝓐(x + δ·y) − w]·δ⁺ (:143-156).
            delta = safe_divide(mu, v.norm_2(y, axis_name=axis_name))
            z = A(v.xpay(x, delta, y))
            return v.scale(safe_divide(1.0, delta), v.sub(z, w))

        t = solve_inner(LinearOperator(jv), r, r).x
        # x ← x + t; w ← 𝓐(x); r ← b − w (:160-168).
        x = v.add(x, t)
        w = A(x)
        r = v.sub(b, w)
        return x, (r, w), v.norm_2(r, axis_name=axis_name)

    return run_iterative(init_fn, iterate_fn, None, x0, opts)
