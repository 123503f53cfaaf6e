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
    line_search: str | None = None,
    ls_beta: float = 0.5,
    ls_c: float = 1.0e-4,
    ls_max: int = 20,
) -> SolveResult:
    """Newton iterations: solve [∂𝓐(x)/∂x]·t = r, x ← x + λ·t.

    ``jacobian(x)`` must return the linearization of 𝓐 at x as an operator;
    when None, JAX forward-mode ``jvp`` provides the exact Jacobian-vector
    product — the TPU-native answer to the reference's unimplemented stub.

    ``line_search="armijo"`` globalizes the step (the stub the reference
    aborts at offers none): backtracking λ ← β·λ until the residual
    sufficient-decrease test ‖b − 𝓐(x + λt)‖ ≤ (1 − c·λ)·‖r‖ holds (at most
    ``ls_max`` halvings, then the last λ is accepted best-effort).  A
    ``lax.while_loop`` — one extra residual evaluation per trial, no host
    round trips.  Default off: the undamped path is bit-identical to before.
    """
    opts = options or SolverOptions()
    A = as_operator(op)
    inner_opts = _default_inner_options()
    solve_inner = inner_solve or (
        lambda J, r, t0: bicgstab(J, r, t0, options=inner_opts, axis_name=axis_name)
    )
    if line_search not in (None, "armijo"):
        raise ValueError(f"unknown line_search {line_search!r}; use 'armijo'")

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
        if line_search is None:
            x = v.add(x, t)
            w = A(x)
            r = v.sub(b, w)
            return x, (r, w), v.norm_2(r, axis_name=axis_name)

        rnorm = v.norm_2(r, axis_name=axis_name)

        def trial(lam):
            xt = v.xpay(x, lam, t)
            wt = A(xt)
            rt = v.sub(b, wt)
            return xt, wt, rt, v.norm_2(rt, axis_name=axis_name)

        def ls_cond(carry):
            lam, _, _, _, rn, k = carry
            return jnp.logical_and(
                k < ls_max, rn > (1.0 - ls_c * lam) * rnorm
            )

        def ls_body(carry):
            lam, *_ , k = carry
            lam = lam * ls_beta
            xt, wt, rt, rn = trial(lam)
            return (lam, xt, wt, rt, rn, k + 1)

        lam0 = jnp.asarray(1.0, dtype=jnp.asarray(rnorm).dtype)
        xt, wt, rt, rn = trial(lam0)
        lam, xt, wt, rt, rn, _ = jax.lax.while_loop(
            ls_cond, ls_body, (lam0, xt, wt, rt, rn, jnp.asarray(0, jnp.int32))
        )
        return xt, (rt, wt), rn

    return run_iterative(init_fn, iterate_fn, None, x0, opts)


def jfnk(
    op,
    b,
    x0,
    *,
    inner_solve=None,
    options: SolverOptions | None = None,
    axis_name: str | None = None,
    forcing: str | None = None,
    forcing_gamma: float = 0.9,
    forcing_alpha: float = 2.0,
    forcing_eta_max: float = 0.9,
) -> SolveResult:
    """First-order Jacobian-free Newton–Krylov (``SolverNewton.hpp:101-173``).

    ``forcing="ew"`` enables Eisenstat–Walker choice-2 inner forcing: the
    inner Krylov tolerance is η_k = γ·(‖r_k‖/‖r_{k−1}‖)^α with the standard
    safeguard η_k ← max(η_k, γ·η_{k−1}^α) whenever γ·η_{k−1}^α > 0.1,
    clamped to η_max — loose solves far from the root (where the Newton
    model is wrong anyway), tight near it.  The traced η flows into the
    inner while-loop's stopping test directly; default off keeps the
    reference's fixed 1e-8 inner tolerance bit-unchanged.
    """
    opts = options or SolverOptions()
    A = as_operator(op)
    inner_opts = _default_inner_options()
    if forcing not in (None, "ew"):
        raise ValueError(f"unknown forcing {forcing!r}; use 'ew'")
    solve_inner = inner_solve or (
        lambda J, r, t0, io=inner_opts: bicgstab(
            J, r, t0, options=io, axis_name=axis_name
        )
    )

    def init_fn(x):
        # w ← 𝓐(x); r ← b − w (:115-123).
        w = A(x)
        r = v.sub(b, w)
        rnorm = v.norm_2(r, axis_name=axis_name)
        eta0 = jnp.asarray(forcing_eta_max, dtype=jnp.asarray(rnorm).dtype)
        # State carries (residual, 𝓐(x), ‖r_k‖, ‖r_{k−1}‖, η_{k−1}).
        return (r, w, rnorm, rnorm, eta0), rnorm

    def iterate_fn(it, x, state):
        r, w, rnorm_cur, rnorm_old, eta_prev = state
        dtype = jnp.result_type(*jax.tree_util.tree_leaves(r))
        sqrt_eps = jnp.sqrt(jnp.finfo(dtype).eps)
        # μ ← √εₘ·√(1 + ‖x‖) (:135-137).
        mu = sqrt_eps * jnp.sqrt(1.0 + v.norm_2(x, axis_name=axis_name))

        def jv(y):
            # δ ← μ·‖y‖⁺; z ← [𝓐(x + δ·y) − w]·δ⁺ (:143-156).
            delta = safe_divide(mu, v.norm_2(y, axis_name=axis_name))
            z = A(v.xpay(x, delta, y))
            return v.scale(safe_divide(1.0, delta), v.sub(z, w))

        if forcing == "ew" and inner_solve is None:
            eta = forcing_gamma * (safe_divide(rnorm_cur, rnorm_old)) ** forcing_alpha
            guard = forcing_gamma * eta_prev**forcing_alpha
            eta = jnp.where(guard > 0.1, jnp.maximum(eta, guard), eta)
            eta = jnp.clip(eta, 1.0e-10, forcing_eta_max)
            # First Newton step has no ratio yet — use the cap (standard).
            eta = jnp.where(it == 0, forcing_eta_max, eta)
            io = SolverOptions(
                num_iterations=inner_opts.num_iterations,
                absolute_tolerance=0.0,
                relative_tolerance=eta,
                record_history=False,
            )
            t = bicgstab(LinearOperator(jv), r, r, options=io, axis_name=axis_name).x
        else:
            eta = eta_prev
            t = solve_inner(LinearOperator(jv), r, r).x
        # x ← x + t; w ← 𝓐(x); r ← b − w (:160-168).
        x = v.add(x, t)
        w = A(x)
        r = v.sub(b, w)
        rnorm_new = v.norm_2(r, axis_name=axis_name)
        return x, (r, w, rnorm_new, rnorm_cur, eta), rnorm_new

    return run_iterative(init_fn, iterate_fn, None, x0, opts)
