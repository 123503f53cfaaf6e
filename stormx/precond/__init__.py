"""Concrete preconditioners.

The reference ships only ``IdentityPreconditioner``
(``Solvers/Preconditioner.hpp:79-97``) and lists Block-Diagonal/SGS/IC/ILU/
IQR/AINV/SPAI/AMG/Krylov as *Planned* (``README.md:71-82``).  stormx
implements the full planned catalog, grouped by TPU execution style:

* **diagonal family** (Jacobi, block-Jacobi) — embarrassingly parallel,
  shard-local scaling;
* **polynomial** (Chebyshev) — pure SpMV chains, no factorization;
* **incomplete factorizations** (SGS, ILU(0), IC(0)) — host factorization,
  device triangular solves (exact level-scheduled or fixed Jacobi sweeps);
* **incomplete QR** (CIMGS: IC(0) of AᵀA) — right preconditioner for
  LSQR/LSMR on rectangular systems;
* **approximate inverses** (SPAI(0), AINV) — host least-squares /
  biconjugation build, SpMV-only apply (the most TPU-native applies);
* **multigrid** (smoothed-aggregation AMG V-cycle);
* **Krylov** — nonlinear inner solve, for flexible outer methods (FGMRES).
"""

from stormx.precond.approx_inverse import AinvPreconditioner, SpaiPreconditioner
from stormx.precond.block_amg import BlockDiaAmg
from stormx.precond.chebyshev import ChebyshevPreconditioner
from stormx.precond.factorized import (
    IcPreconditioner,
    IluPreconditioner,
    SgsPreconditioner,
)
from stormx.precond.iqr import IqrPreconditioner
from stormx.precond.jacobi import BlockJacobiPreconditioner, JacobiPreconditioner
from stormx.precond.krylov import KrylovPreconditioner
from stormx.precond.multigrid import AmgPreconditioner
from stormx.precond.triangular import TriangularFactor, build_triangular, tri_solve

__all__ = [
    "JacobiPreconditioner",
    "BlockJacobiPreconditioner",
    "ChebyshevPreconditioner",
    "AmgPreconditioner",
    "BlockDiaAmg",
    "SgsPreconditioner",
    "IluPreconditioner",
    "IcPreconditioner",
    "SpaiPreconditioner",
    "AinvPreconditioner",
    "IqrPreconditioner",
    "KrylovPreconditioner",
    "TriangularFactor",
    "build_triangular",
    "tri_solve",
]
