"""Exception hierarchy, mirroring the reference's error taxonomy.

Reference: ``Crow/Base/Exception.hpp:29-47`` defines ``Error`` / ``IoError`` /
``GlError`` plus ``STORM_THROW*``; there is no GL layer here (visualization is
delegated to VTK export), so ``GlError`` has no analog.
"""

from __future__ import annotations

__all__ = ["StormError", "StormIoError", "SolverBreakdownError"]


class StormError(Exception):
    """Base framework error (reference ``Storm::Error``)."""


class StormIoError(StormError):
    """Mesh/file IO error (reference ``Storm::IoError``)."""


class SolverBreakdownError(StormError):
    """Numerical breakdown in a Krylov recurrence.

    The reference never raises on breakdown: every division in a solver
    recurrence goes through ``safe_divide`` (``Crow/MathUtils.hpp:49-52``)
    which returns 0.  We keep those semantics inside jitted code and reserve
    this exception for host-side validation paths.
    """
