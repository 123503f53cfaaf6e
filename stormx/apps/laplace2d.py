"""Laplace2D 9-point Jacobi benchmark — the reference's golden-error anchor.

Reference: ``tests/benchmark/BitternLaplace2D.cpp:44-80`` — N×N grid,
``u[:,0] = sin(x)``, ``u[:,N-1] = sin(x)·e^{-π}`` with ``x = linspace(0,π,N)``,
then ``NumIterations`` Jacobi sweeps of the 9-point stencil

    u_int ← (4·(N+S+W+E) + (NW+NE+SW+SE)) / 20

with ``error = ‖u − u_old‖_F`` after the final sweep.  Golden values
(``BitternLaplace2D.cpp:403-422``, double, 1000 iterations, tol 1e-4):
N=100 → 0.0069143, N=150 → 0.00994008, N=200 → 0.0121789.

TPU-native form: the whole sweep loop is one ``lax.fori_loop`` under jit;
the stencil is static slices (fused adds on the VPU, no gather), the same
no-gather principle as :class:`stormx.sparse.DIA`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["laplace2d", "laplace2d_error"]


def _initial(n: int, dtype):
    pi = jnp.pi
    x = jnp.linspace(0.0, pi, n, dtype=dtype)
    u = jnp.zeros((n, n), dtype=dtype)
    u = u.at[:, 0].set(jnp.sin(x))
    u = u.at[:, n - 1].set(jnp.sin(x) * jnp.exp(jnp.asarray(-pi, dtype=dtype)))
    return u


def _sweep(u):
    """One 9-point Jacobi sweep; returns (u_new, ‖u_new − u‖_F)."""
    edge = (
        u[:-2, 1:-1] + u[2:, 1:-1] + u[1:-1, :-2] + u[1:-1, 2:]
    )
    corner = u[:-2, :-2] + u[:-2, 2:] + u[2:, :-2] + u[2:, 2:]
    interior = (4.0 * edge + corner) / 20.0
    u_new = u.at[1:-1, 1:-1].set(interior)
    err = jnp.linalg.norm(u_new - u)
    return u_new, err


def laplace2d(n: int, num_iterations: int = 1000, dtype=jnp.float64):
    """Run the benchmark; returns (final u, final-sweep error)."""

    @jax.jit
    def run():
        u0 = _initial(n, dtype)

        def body(_, carry):
            u, _err = carry
            return _sweep(u)

        return lax.fori_loop(
            0, num_iterations, body, (u0, jnp.zeros((), dtype=dtype))
        )

    return run()


def laplace2d_error(n: int, num_iterations: int = 1000, dtype=jnp.float64):
    return float(laplace2d(n, num_iterations, dtype)[1])
