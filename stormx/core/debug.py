"""Runtime checking — the sanitizer story (SURVEY §5).

The reference's only runtime checking is ``STORM_ASSERT`` bounds checks and
``_GLIBCXX_DEBUG`` in Debug builds; there is no TSan/ASan wiring.  The JAX
equivalents:

* :func:`enable_nan_checks` — global ``jax_debug_nans`` (any NaN produced
  under jit raises at the producing primitive).
* :func:`checked` — wrap a function with ``jax.experimental.checkify`` so
  index-out-of-bounds / NaN / div-by-zero become checked errors instead of
  silent garbage (TPU gathers clamp out-of-bounds by default!).
* :func:`assert_deterministic` — run a function twice and demand bit-equal
  outputs; the determinism test that replaces TSan for a data-parallel
  runtime (our kernels must be reduction-order-deterministic per layout).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["enable_nan_checks", "checked", "assert_deterministic"]


def enable_nan_checks(on: bool = True) -> None:
    jax.config.update("jax_debug_nans", on)


def checked(fn, *, errors=None):
    """checkify-wrapped fn: returns (error, out); call ``error.throw()``.

    Default error set: user asserts + NaN + out-of-bounds indexing + div.
    """
    from jax.experimental import checkify

    errs = errors if errors is not None else checkify.all_checks
    return checkify.checkify(fn, errors=errs)


def assert_deterministic(fn, *args, runs: int = 2) -> None:
    """Demand bit-identical outputs across repeated executions."""
    ref = jax.tree_util.tree_map(np.asarray, fn(*args))
    for _ in range(runs - 1):
        out = jax.tree_util.tree_map(np.asarray, fn(*args))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(a, b), ref, out
        )
