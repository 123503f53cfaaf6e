"""Permutation algorithms (reference ``Utils/Permutations.hpp``).

The reference ships three: ``is_permutation`` (whose implementation aborts
for n > 2 — ``Permutations.hpp:56-65`` — a stub we complete),
``invert_permutation`` (``:72-104``), and an in-place cycle-walking
``permute_inplace`` (``:108-148``).  On immutable device arrays "in place"
is meaningless; the TPU-native forms are O(n) vectorized gathers/scatters,
jit-safe and differentiable through the values.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["is_permutation", "invert_permutation", "permute", "inverse_permute"]


def is_permutation(perm) -> jnp.ndarray:
    """True iff ``perm`` is a permutation of 0..n−1 (complete implementation
    of the reference's stub, ``Permutations.hpp:56-65``).

    Scatter-count check: every slot hit exactly once.  Returns a traced
    bool scalar, so it composes with jit / checkify.
    """
    perm = jnp.asarray(perm)
    n = perm.shape[0]
    counts = jnp.zeros(n + 1, dtype=jnp.int32).at[
        jnp.clip(perm, 0, n),
    ].add(1)
    in_range = jnp.logical_and(perm >= 0, perm < n).all()
    return jnp.logical_and(in_range, (counts[:n] == 1).all())


def invert_permutation(perm) -> jnp.ndarray:
    """iperm with iperm[perm[i]] = i (reference ``Permutations.hpp:72-104``):
    one scatter instead of the reference's sequential loop."""
    perm = jnp.asarray(perm)
    n = perm.shape[0]
    return jnp.zeros(n, dtype=perm.dtype).at[perm].set(
        jnp.arange(n, dtype=perm.dtype)
    )


def permute(values, perm):
    """out[i] = values[perm[i]] — the functional replacement for the
    reference's cycle-walking ``permute_inplace`` (``:108-148``); under jit
    with donated buffers XLA reuses the storage, recovering "in place"."""
    return jnp.asarray(values)[jnp.asarray(perm)]


def inverse_permute(values, perm):
    """out[perm[i]] = values[i] (scatter form; ≡ permute(values,
    invert_permutation(perm)) without materializing the inverse)."""
    values = jnp.asarray(values)
    return jnp.zeros_like(values).at[jnp.asarray(perm)].set(values)
