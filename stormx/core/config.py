"""Global configuration: dtype policy and feature flags.

TPU-native analog of the reference's compile-time config layer
(``Crow/Base/Config.hpp:25-173``, ``Crow/Base/Types.hpp:31-110``): the reference
fixes ``real_t = double`` at compile time; here the working precision is a
runtime policy.  On TPU, float64 is emulated and slow, so the default working
dtype is float32; correctness-critical configs (convergence-history parity
tests) opt into float64 via :func:`enable_x64`.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

__all__ = [
    "enable_x64",
    "x64_enabled",
    "default_real_dtype",
    "default_int_dtype",
    "machine_epsilon",
]


def enable_x64(enable: bool = True) -> None:
    """Globally enable float64 (the reference's ``real_t``) in JAX."""
    jax.config.update("jax_enable_x64", enable)


def x64_enabled() -> bool:
    return bool(jax.config.jax_enable_x64)


def default_real_dtype() -> jnp.dtype:
    """Working real dtype: float64 when x64 is enabled, else float32."""
    return jnp.dtype(jnp.float64) if x64_enabled() else jnp.dtype(jnp.float32)


def default_int_dtype() -> jnp.dtype:
    """Index dtype for connectivity tables (CSR/ELL columns): int32.

    The reference uses ``size_t`` indices (``Utils/Index.hpp:37-134``); int32
    halves index bandwidth and is what XLA gathers want on TPU.
    """
    return jnp.dtype(jnp.int32)


def machine_epsilon(dtype=None) -> float:
    dtype = dtype or default_real_dtype()
    return float(jnp.finfo(dtype).eps)


# Feature flags (reference: CMake-driven Config.hpp).  Kept as plain env vars.
INTERPRET_PALLAS = os.environ.get("STORMX_INTERPRET_PALLAS", "0") == "1"
