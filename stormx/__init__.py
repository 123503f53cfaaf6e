"""stormx — TPU-native sparse linear algebra & FVM framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
StormRuler reference (unstructured-mesh FVM + matrix-free Krylov suite),
built TPU-first: static shapes, gather-only sparse kernels, `lax.while_loop`
convergence loops, and `shard_map` mesh partitioning.
"""

from stormx import core, ops, solvers, sparse
from stormx.core import enable_x64, print_banner
from stormx.solvers import (
    SolveResult,
    SolverOptions,
    LinearOperator,
    make_operator,
    make_symmetric_operator,
    solve,
    solve_non_uniform,
)

__version__ = "0.1.0"

__all__ = [
    "core",
    "ops",
    "solvers",
    "sparse",
    "enable_x64",
    "print_banner",
    "SolveResult",
    "SolverOptions",
    "LinearOperator",
    "make_operator",
    "make_symmetric_operator",
    "solve",
    "solve_non_uniform",
    "__version__",
]
