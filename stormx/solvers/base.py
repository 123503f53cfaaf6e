"""Shared iterative-solver driver.

Replicates the reference's template-method convergence loop
(``Solvers/Solver.hpp:116-147``) as a jit-compatible ``lax.while_loop``:

  1. ``init`` → initial residual norm; ``absolute_error = initial_error``.
  2. Pre-loop early exit: if ``atol > 0 and abs_err < atol`` → finalize, done
     (zero iterations executed).
  3. Loop up to ``num_iterations``: ``iterate`` returns the residual norm;
     converged when ``(atol > 0 and abs < atol) or (rtol > 0 and rel < rtol)``
     with ``rel = abs / initial``.
  4. ``finalize`` runs once after the loop (GMRES back-substitutes here).

Inner-outer solvers (``Solver.hpp:236-248``) fold their restart cycling into
``iterate_fn`` via ``inner_iteration = iteration % num_inner_iterations``.

Deviation from the reference (documented): when the initial guess is already
converged (zero iterations executed), ``finalize`` is *skipped*.  The
reference calls it unconditionally, which for GMRES divides by an
uninitialized H(0,0) — a latent bug we do not reproduce.

The convergence history (per-iteration absolute errors) is returned as a
fixed-size NaN-padded array: it is the bit-compatibility artifact BASELINE.md
compares across partition counts.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from stormx.solvers.preconditioner import PreconditionerSide

PyTree = Any

__all__ = ["SolverOptions", "SolveResult", "run_iterative", "resolve_side"]


@dataclass(frozen=True)
class SolverOptions:
    """Knobs with the reference's names and defaults (``Solver.hpp:66-76,158-159``)."""

    num_iterations: int = 2000
    absolute_tolerance: float = 1.0e-6
    relative_tolerance: float = 1.0e-6
    pre_side: PreconditionerSide | str = PreconditionerSide.RIGHT
    record_history: bool = True


class SolveResult(NamedTuple):
    x: PyTree
    converged: jax.Array  # bool scalar
    num_iterations: jax.Array  # int scalar — executed iteration count
    absolute_error: jax.Array
    relative_error: jax.Array
    history: jax.Array | None  # (num_iterations + 1,) abs errors, NaN padded


def resolve_side(side, *, precond=None, solver: str | None = None) -> PreconditionerSide:
    """Normalize ``pre_side``; reject unimplemented SYMMETRIC.

    The reference declares Left/Right/Symmetric (``Preconditioner.hpp:39-58``)
    but, like it, no solver here implements a symmetric split (M = M_L·M_R
    needs a factorized preconditioner).  Selecting it used to silently run
    UNPRECONDITIONED — worse than missing; now it raises whenever a
    preconditioner is actually supplied.  CG is the exception by algebra:
    its z = 𝓟r recurrence is equivalent to symmetrically-preconditioned CG
    for SPD 𝓟, so ``cg`` accepts any side.
    """
    if not isinstance(side, PreconditionerSide):
        side = PreconditionerSide(str(side).lower())
    if side is PreconditionerSide.SYMMETRIC and precond is not None:
        from stormx.core.exceptions import StormError

        raise StormError(
            f"pre_side='symmetric' is not implemented by {solver or 'this solver'}"
            " (a symmetric split M = M_L·M_R requires a factorized"
            " preconditioner); use 'left' or 'right' — or CG, whose z = 𝓟r"
            " recurrence is algebraically the symmetric-preconditioned"
            " iteration for SPD 𝓟"
        )
    return side


def run_iterative(
    init_fn: Callable[[PyTree], tuple[PyTree, jax.Array]],
    iterate_fn: Callable[[jax.Array, PyTree, PyTree], tuple[PyTree, PyTree, jax.Array]],
    finalize_fn: Callable[[jax.Array, PyTree, PyTree], PyTree] | None,
    x0: PyTree,
    options: SolverOptions,
) -> SolveResult:
    """Drive ``iterate_fn`` to convergence.

    ``init_fn(x) -> (state, initial_error)``;
    ``iterate_fn(iteration, x, state) -> (x, state, abs_error)``;
    ``finalize_fn(executed_iterations, x, state) -> x`` (optional).
    """
    atol = options.absolute_tolerance
    rtol = options.relative_tolerance
    n_max = options.num_iterations

    state, initial_error = init_fn(x0)
    err_dtype = jnp.asarray(initial_error).dtype
    initial_error = jnp.asarray(initial_error, dtype=err_dtype)

    # Pre-loop early exit (Solver.hpp:124-128): only the absolute tolerance.
    pre_converged = jnp.logical_and(atol > 0.0, initial_error < atol)

    if options.record_history:
        history = jnp.full((n_max + 1,), jnp.nan, dtype=err_dtype)
        history = history.at[0].set(initial_error)
    else:
        history = jnp.zeros((0,), dtype=err_dtype)

    one = jnp.asarray(1.0, dtype=err_dtype)

    def cond(carry):
        _, _, it, _, _, converged, _ = carry
        return jnp.logical_and(jnp.logical_not(converged), it < n_max)

    def body(carry):
        x, st, it, _, _, _, hist = carry
        x, st, abs_err = iterate_fn(it, x, st)
        rel_err = abs_err / initial_error
        converged = jnp.logical_or(
            jnp.logical_and(atol > 0.0, abs_err < atol),
            jnp.logical_and(rtol > 0.0, rel_err < rtol),
        )
        if options.record_history:
            hist = hist.at[it + 1].set(abs_err)
        return (x, st, it + 1, abs_err, rel_err, converged, hist)

    carry0 = (
        x0,
        state,
        jnp.asarray(0, dtype=jnp.int32),
        initial_error,
        one,
        pre_converged,
        history,
    )
    x, state, it, abs_err, rel_err, converged, history = lax.while_loop(
        cond, body, carry0
    )

    if finalize_fn is not None:
        # Skip finalize when zero iterations ran (see module docstring).
        x = lax.cond(it > 0, lambda: finalize_fn(it, x, state), lambda: x)

    return SolveResult(
        x=x,
        converged=converged,
        num_iterations=it,
        absolute_error=abs_err,
        relative_error=rel_err,
        history=history if options.record_history else None,
    )
