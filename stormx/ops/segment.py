"""Segment reductions — the scatter-accumulate primitive of FVM on TPU.

The reference's hot loops scatter per-face contributions into cells
(``Feathers/ConvectionScheme.hpp:155-174``, ``Playground.cpp:116-131``) and
accumulate CSR rows.  On TPU, scatters are slow but gathers are fast, so the
canonical formats in this framework (ELL SpMV, cell←face incidence tables)
avoid scatter entirely.  These wrappers remain the *reference* path used for
correctness oracles and one-off assembly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["segment_sum", "segment_min", "segment_max"]


def segment_sum(data, segment_ids, num_segments: int):
    """Deterministic Σ over segments (row-scatter-add)."""
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=False
    )


def segment_min(data, segment_ids, num_segments: int):
    return jax.ops.segment_min(data, segment_ids, num_segments=num_segments)


def segment_max(data, segment_ids, num_segments: int):
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
