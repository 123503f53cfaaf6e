"""Logging shim: the reference's spdlog macros (``Crow/Base/Log.hpp:29-54``)
map onto Python's stdlib logging with the same severity ladder
(TRACE/DEBUG/INFO/WARNING/ERROR/CRITICAL)."""

from __future__ import annotations

import logging

__all__ = ["get_logger", "TRACE"]

TRACE = 5
logging.addLevelName(TRACE, "TRACE")

_logger = logging.getLogger("stormx")


def get_logger(name: str | None = None) -> logging.Logger:
    return _logger.getChild(name) if name else _logger
