"""Concrete preconditioners.

The reference ships only ``IdentityPreconditioner``
(``Solvers/Preconditioner.hpp:79-97``) and lists Jacobi/SGS/IC/ILU/AINV/SPAI/
Krylov/AMG/BPX as *Planned* (``README.md:71-82``).  This package implements
the diagonal family — Jacobi and block-Jacobi — which are embarrassingly
parallel and therefore the natural first preconditioners on a partitioned
device mesh (each shard scales its own rows; no communication).
"""

from stormx.precond.chebyshev import ChebyshevPreconditioner
from stormx.precond.multigrid import AmgPreconditioner
from stormx.precond.jacobi import BlockJacobiPreconditioner, JacobiPreconditioner

__all__ = [
    "JacobiPreconditioner",
    "BlockJacobiPreconditioner",
    "ChebyshevPreconditioner",
    "AmgPreconditioner",
]
