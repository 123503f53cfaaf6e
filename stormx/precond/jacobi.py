"""Jacobi (diagonal) and block-Jacobi preconditioners.

P = diag(𝓐)⁻¹ (Jacobi) or the blockwise inverse of the b×b diagonal blocks
(block-Jacobi).  Zero diagonal entries invert to 0 via ``safe_inverse`` —
consistent with the framework-wide breakdown-guard semantics
(``Crow/MathUtils.hpp:49-58``).
"""

from __future__ import annotations

import jax.numpy as jnp

from stormx.ops import safe_inverse
from stormx.solvers.preconditioner import Preconditioner

__all__ = ["JacobiPreconditioner", "BlockJacobiPreconditioner"]


class JacobiPreconditioner(Preconditioner):
    """P·x = x / diag(𝓐).

    Construct from an explicit diagonal, or from a matrix exposing
    ``.diagonal()`` (CSR/ELL do).  ``build`` extracts the diagonal from the
    operator when it wraps such a matrix.
    """

    def __init__(self, diag=None, matrix=None):
        if diag is None and matrix is not None:
            diag = matrix.diagonal()
        self._inv_diag = None if diag is None else safe_inverse(diag)

    def build(self, x, b, op):
        if self._inv_diag is None:
            matrix = getattr(op, "matrix", None)
            if matrix is None or not hasattr(matrix, "diagonal"):
                raise ValueError(
                    "JacobiPreconditioner needs an explicit diag= or a matrix-"
                    "backed operator with .diagonal()"
                )
            self._inv_diag = safe_inverse(matrix.diagonal())
        return self

    def __call__(self, x):
        return _apply_diag(self._inv_diag, x)

    def conj_apply(self, x):
        return _apply_diag(jnp.conj(self._inv_diag), x)


def _apply_diag(inv_diag, x):
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(x)
    if len(leaves) == 1:
        return jax.tree_util.tree_unflatten(
            treedef, [leaves[0] * inv_diag.reshape(leaves[0].shape)]
        )
    # Multi-leaf vectors: split the diagonal by leaf sizes.
    sizes = [l.size for l in leaves]
    flat = inv_diag.reshape(-1)
    out, offset = [], 0
    for l, size in zip(leaves, sizes):
        out.append(l * flat[offset : offset + size].reshape(l.shape))
        offset += size
    return jax.tree_util.tree_unflatten(treedef, out)


class BlockJacobiPreconditioner(Preconditioner):
    """Blockwise-diagonal inverse: P·x = D_b⁻¹·x with b×b diagonal blocks.

    Accepts explicit blocks (n_brows, b, b) or a BSR matrix via
    ``.diagonal_blocks()``.  Blocks are pre-factorized (LU via
    ``jnp.linalg.solve`` batched) — a batched small-matrix op the TPU MXU
    handles natively.
    """

    def __init__(self, blocks=None, matrix=None):
        if blocks is None and matrix is not None:
            blocks = matrix.diagonal_blocks()
        self._blocks = blocks

    def build(self, x, b, op):
        if self._blocks is None:
            matrix = getattr(op, "matrix", None)
            if matrix is None or not hasattr(matrix, "diagonal_blocks"):
                raise ValueError(
                    "BlockJacobiPreconditioner needs blocks= or a BSR-backed operator"
                )
            self._blocks = matrix.diagonal_blocks()
        return self

    def __call__(self, x):
        import jax

        leaves, treedef = jax.tree_util.tree_flatten(x)
        bsize = self._blocks.shape[-1]
        out = []
        for l in leaves:
            xb = l.reshape(-1, bsize)
            yb = jnp.linalg.solve(self._blocks, xb[..., None])[..., 0]
            out.append(yb.reshape(l.shape))
        return jax.tree_util.tree_unflatten(treedef, out)
