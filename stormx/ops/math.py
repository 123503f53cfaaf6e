"""Scalar numerics helpers, load-bearing for solver bit-compatibility.

Reference: ``Crow/MathUtils.hpp``.
  * ``safe_divide`` (``:49-52``): returns 0 when the denominator is exactly 0;
    used in *every* Krylov recurrence (e.g. ``SolverCg.hpp:97``) as the
    breakdown guard, so its semantics must be preserved exactly.
  * ``sym_ortho`` (``:164-179``): Givens rotation used by GMRES QR
    (``SolverGmres.hpp:181``) and TFQMR (``SolverTfqmr.hpp:181``).

All functions are jit-safe and shape-polymorphic (scalars or arrays).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["safe_divide", "safe_inverse", "sym_ortho", "sign"]


def safe_divide(x, y):
    """``x / y`` if ``y != 0`` else ``0`` — elementwise, NaN-free.

    Uses the double-``where`` idiom so that neither branch produces inf/NaN
    (which would otherwise poison reverse-mode gradients through the taken
    branch).
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    zero = y == 0
    y_safe = jnp.where(zero, jnp.ones_like(y), y)
    return jnp.where(zero, jnp.zeros_like(x / y_safe), x / y_safe)


def safe_inverse(y):
    """``1 / y`` if ``y != 0`` else ``0`` (reference ``:55-58``)."""
    y = jnp.asarray(y)
    return safe_divide(jnp.ones_like(y), y)


def sym_ortho(a, b):
    """Generate a Givens rotation ``(cs, sn, rr)``.

    Real (reference ``Crow/MathUtils.hpp:164-179``): ``rr = hypot(a, b)``;
    if ``rr > 0``: ``cs = a/rr, sn = b/rr``, else ``cs = 1, sn = 0``.

    Complex: ``rr = hypot(|a|, |b|)`` (real, overflow-robust like the real
    path), same quotients — the
    unitary rotation is then ``[[conj(cs), conj(sn)], [-sn, cs]]``
    (consumers apply the conjugates on the first row; ``jnp.conj`` is the
    identity for real dtypes, so the real path is bit-unchanged).  The
    reference's own template is real-only in practice — its ``hypot`` has
    no complex overload and ``safe_divide`` is constrained to
    ``std::floating_point`` — so this is a documented extension, not a
    deviation.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if jnp.iscomplexobj(a) or jnp.iscomplexobj(b):
        rr = jnp.hypot(jnp.abs(a), jnp.abs(b))  # real
        pos = rr > 0
        rr_safe = jnp.where(pos, rr, jnp.ones_like(rr))
        one = jnp.ones((), jnp.result_type(a, b))
        cs = jnp.where(pos, a / rr_safe, one)
        sn = jnp.where(pos, b / rr_safe, jnp.zeros_like(one))
        return cs, sn, rr
    rr = jnp.hypot(a, b)
    pos = rr > 0
    rr_safe = jnp.where(pos, rr, jnp.ones_like(rr))
    cs = jnp.where(pos, a / rr_safe, jnp.ones_like(rr))
    sn = jnp.where(pos, b / rr_safe, jnp.zeros_like(rr))
    return cs, sn, rr


def sign(x):
    """Sign in {-1, 0, +1} (reference ``:107-111``)."""
    return jnp.sign(jnp.asarray(x))
