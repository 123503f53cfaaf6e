from stormx.core.config import (
    default_int_dtype,
    default_real_dtype,
    enable_x64,
    machine_epsilon,
    x64_enabled,
)
from stormx.core.exceptions import SolverBreakdownError, StormError, StormIoError
from stormx.core.logging import get_logger
from stormx.core.banner import print_banner
from stormx.core.debug import assert_deterministic, checked, enable_nan_checks
from stormx.core.profiling import Timer, annotate, trace

__all__ = [
    "default_int_dtype",
    "default_real_dtype",
    "enable_x64",
    "machine_epsilon",
    "x64_enabled",
    "SolverBreakdownError",
    "StormError",
    "StormIoError",
    "get_logger",
    "print_banner",
    "Timer",
    "assert_deterministic",
    "checked",
    "enable_nan_checks",
    "annotate",
    "trace",
]
