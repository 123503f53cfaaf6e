"""Compressible-Euler demo (Sod-like uniform init).

Reference: ``euler_solve`` (``source_apps/playground/Playground.cpp:214-246``,
``#if 0``-ed upstream but fully wired here): initialize primitive state
q = (2, 1, 1, 0, 0), convert to conserved, and march forward-Euler with the
2nd-order limited upwind scheme + Lax–Friedrichs flux (the reference's
``MhdFvSolverT`` configuration, ``SkunkFvSolver.hpp:62-74``).
"""

from __future__ import annotations

import jax.numpy as jnp

from stormx.fvm.hydro import state_from_prim
from stormx.fvm.solver import FvSolver

__all__ = ["initial_state", "run"]


def initial_state(num_cells: int, prim=(2.0, 1.0, 1.0, 0.0, 0.0), dtype=None):
    """Uniform conserved state from primitive q (Playground.cpp:219-224)."""
    prim_arr = jnp.tile(jnp.asarray(prim, dtype=dtype), (num_cells, 1))
    n = jnp.tile(jnp.asarray([1.0, 0.0, 0.0], dtype=dtype), (num_cells, 1))
    return state_from_prim(n, prim_arr).make_cons()


def run(dmesh, num_steps: int, dt: float = 1e-4, u0=None, **solver_kw):
    """March ``num_steps`` forward-Euler steps (Playground.cpp:231-243)."""
    solver = FvSolver(dmesh, **solver_kw)
    u = u0 if u0 is not None else initial_state(dmesh.num_cells)
    step = solver.jitted_step()
    for _ in range(num_steps):
        u = step(u, dt)
    return u
