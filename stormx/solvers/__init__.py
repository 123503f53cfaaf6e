"""Matrix-free Krylov solver suite (reference: ``source/Storm/Solvers/``).

Every solver is a pure function ``solver(op, b, x0, **kw) -> SolveResult``
whose whole convergence loop is a single ``lax.while_loop`` — jit it, vmap
it over batches of right-hand sides, or run it inside ``shard_map`` with
``axis_name`` set for multi-chip meshes.
"""

from stormx.solvers.base import SolveResult, SolverOptions, run_iterative
from stormx.solvers.bicgstab import bicgstab, bicgstab_l
from stormx.solvers.cg import cg
from stormx.solvers.cgs import cgs
from stormx.solvers.gmres import fgmres, gmres
from stormx.solvers.idrs import idrs
from stormx.solvers.lgmres import lfgmres, lgmres
from stormx.solvers.lsqr import lsmr, lsqr
from stormx.solvers.newton import jfnk, newton
from stormx.solvers.operator import (
    LinearOperator,
    as_operator,
    make_operator,
    make_symmetric_operator,
)
from stormx.solvers.preconditioner import (
    IdentityPreconditioner,
    Preconditioner,
    PreconditionerSide,
    build_preconditioner,
)
from stormx.solvers.richardson import richardson
from stormx.solvers.tfqmr import tfqmr, tfqmr1

SOLVERS = {
    "richardson": richardson,
    "cg": cg,
    "cgs": cgs,
    "bicgstab": bicgstab,
    "bicgstab_l": bicgstab_l,
    "tfqmr": tfqmr,
    "tfqmr1": tfqmr1,
    "idrs": idrs,
    "gmres": gmres,
    "fgmres": fgmres,
    "lgmres": lgmres,
    "lfgmres": lfgmres,
    "lsqr": lsqr,
    "lsmr": lsmr,
    "newton": newton,
    "jfnk": jfnk,
}


def solve(op, b, x0=None, *, method: str = "cg", **kwargs) -> SolveResult:
    """Solve 𝓐(x) = b (reference free-function ``solve``, ``Solver.hpp:261-265``)."""
    from stormx.ops import vector as _v

    if x0 is None:
        x0 = _v.zeros_like(b)
    try:
        fn = SOLVERS[method.lower()]
    except KeyError:
        raise ValueError(f"unknown solver {method!r}; choose from {sorted(SOLVERS)}")
    return fn(op, b, x0, **kwargs)


def solve_non_uniform(op, b, x0, *, method: str = "cg", **kwargs) -> SolveResult:
    """Solve 𝓐(x) = b for an affine operator (𝓐(0) ≠ 0), reference
    ``Solver.hpp:271-292``: uniformize as [𝓐(x) − 𝓐(0)] = b − 𝓐(0)."""
    from stormx.ops import vector as _v

    A = as_operator(op)
    z = A(_v.zeros_like(x0))
    f = _v.sub(b, z)
    uni_op = make_operator(lambda x: _v.sub(A(x), z))
    return solve(uni_op, f, x0, method=method, **kwargs)


__all__ = [
    "SolveResult",
    "SolverOptions",
    "run_iterative",
    "LinearOperator",
    "as_operator",
    "make_operator",
    "make_symmetric_operator",
    "Preconditioner",
    "PreconditionerSide",
    "IdentityPreconditioner",
    "build_preconditioner",
    "richardson",
    "cg",
    "cgs",
    "bicgstab",
    "bicgstab_l",
    "tfqmr",
    "tfqmr1",
    "idrs",
    "gmres",
    "fgmres",
    "lgmres",
    "lfgmres",
    "lsqr",
    "lsmr",
    "newton",
    "jfnk",
    "solve",
    "solve_non_uniform",
    "SOLVERS",
]
