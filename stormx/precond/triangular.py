"""Sparse triangular solves, TPU-style.

The reference plans a Gauss–Seidel / incomplete-factorization preconditioner
family (``README.md:73-82``, all *Planned*) whose apply is a sparse
triangular solve — the classically sequential kernel.  Two device
formulations, both with fully static shapes:

* **Level scheduling** (exact).  Host-side we compute the dependency depth
  of every row (longest path in the triangular DAG); rows of equal depth
  form a *level* and are independent, so the device loops over levels with
  one padded gather + FMA + scatter per level (``lax.fori_loop``).  Exact to
  roundoff; cost is ``num_levels`` sequential steps, which is fine for the
  wide/shallow DAGs of incomplete factors but degenerates on long thin
  bands.
* **Jacobi sweeps** (approximate, the TPU fast path).  ``y ← D⁻¹(r − N·y)``
  for a fixed number of sweeps — a truncated Neumann series for
  ``(D+N)⁻¹``.  Every sweep is one dense-rate ELL SpMV; ``sweeps ≥
  num_levels`` reproduces the exact solve.  A *fixed* sweep count keeps the
  apply linear, so CG stays safe with a symmetrized pair of them.

Both read the same frozen :class:`TriangularFactor` pytree, so every
preconditioner in :mod:`stormx.precond.factorized` can switch between them
with a flag.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["TriangularFactor", "build_triangular", "tri_solve"]


class TriangularFactor(NamedTuple):
    """Frozen device form of a sparse triangular matrix ``T = D + N``
    (``N`` strictly triangular), ready for :func:`tri_solve`.

    All row-indexed arrays carry one padding row ``n`` (a write dump for the
    level scatter); ELL value padding is zero so padded columns contribute
    nothing.
    """

    level_rows: jax.Array  # (num_levels, max_level_width) int32, padded with n
    ell_cols: jax.Array  # (n + 1, K) int32 column ids of N
    ell_vals: jax.Array  # (n + 1, K) values of N; 0 on padding
    inv_diag: jax.Array  # (n + 1,) 1/diag(T); 0 on the padding row

    @property
    def num_rows(self) -> int:
        return self.inv_diag.shape[0] - 1

    @property
    def num_levels(self) -> int:
        return self.level_rows.shape[0]


def build_triangular(
    row_ptr: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    n: int,
    *,
    lower: bool,
    unit_diagonal: bool = False,
    diag: np.ndarray | None = None,
    dtype=None,
) -> TriangularFactor:
    """Host-side build from CSR triples of the *whole* triangle (diagonal
    included unless ``unit_diagonal`` — then ``diag`` may be omitted).

    Entries on the wrong side of the diagonal are rejected; the CSR need not
    store an explicit diagonal when ``diag`` is given separately.
    """
    row_ptr = np.asarray(row_ptr)
    cols = np.asarray(cols)
    vals = np.asarray(vals)
    dtype = dtype or vals.dtype

    # Split strictly-triangular part from the diagonal.
    n_cols = [[] for _ in range(n)]
    n_vals = [[] for _ in range(n)]
    d = np.ones(n, dtype=dtype) if unit_diagonal else np.zeros(n, dtype=dtype)
    if diag is not None:
        d = np.asarray(diag, dtype=dtype).copy()
    for i in range(n):
        for k in range(row_ptr[i], row_ptr[i + 1]):
            j = int(cols[k])
            if j == i:
                if diag is None and not unit_diagonal:
                    d[i] = vals[k]
                continue
            if (j > i) if lower else (j < i):
                raise ValueError(
                    f"entry ({i},{j}) is on the wrong side for a "
                    f"{'lower' if lower else 'upper'} factor"
                )
            n_cols[i].append(j)
            n_vals[i].append(vals[k])
    if not unit_diagonal and np.any(d == 0):
        raise ValueError("triangular factor has zero diagonal entries")

    # Dependency depth = longest path; rows of equal depth are one level.
    depth = np.zeros(n, dtype=np.int64)
    order = range(n) if lower else range(n - 1, -1, -1)
    for i in order:
        if n_cols[i]:
            depth[i] = 1 + max(depth[j] for j in n_cols[i])
    num_levels = int(depth.max()) + 1 if n else 1
    buckets = [[] for _ in range(num_levels)]
    for i in range(n):
        buckets[int(depth[i])].append(i)
    width = max((len(b) for b in buckets), default=1)
    level_rows = np.full((num_levels, width), n, dtype=np.int32)
    for l, b in enumerate(buckets):
        level_rows[l, : len(b)] = b

    k_max = max((len(c) for c in n_cols), default=0)
    k_max = max(k_max, 1)
    ell_cols = np.zeros((n + 1, k_max), dtype=np.int32)
    ell_vals = np.zeros((n + 1, k_max), dtype=dtype)
    for i in range(n):
        cc = n_cols[i]
        ell_cols[i, : len(cc)] = cc
        ell_vals[i, : len(cc)] = n_vals[i]
    inv_diag = np.zeros(n + 1, dtype=dtype)
    inv_diag[:n] = 1.0 / d

    return TriangularFactor(
        level_rows=jnp.asarray(level_rows),
        ell_cols=jnp.asarray(ell_cols),
        ell_vals=jnp.asarray(ell_vals),
        inv_diag=jnp.asarray(inv_diag),
    )


def _off_diag_apply(tri: TriangularFactor, y_pad: jax.Array) -> jax.Array:
    """N·y for the strictly-triangular part, rows 0..n-1 (dense ELL rate)."""
    n = tri.num_rows
    return jnp.sum(tri.ell_vals[:n] * y_pad[tri.ell_cols[:n]], axis=1)


def tri_solve(tri: TriangularFactor, r: jax.Array, *, sweeps: int | None = None):
    """Solve ``(D + N) y = r``.

    ``sweeps=None`` → exact level-scheduled solve; ``sweeps=k`` → k Jacobi
    sweeps of the truncated Neumann series (linear in ``r`` for fixed k).
    """
    n = tri.num_rows
    r = jnp.asarray(r)
    if sweeps is not None:
        y = tri.inv_diag[:n] * r
        def body(_, y):
            contrib = _off_diag_apply(tri, jnp.pad(y, (0, 1)))
            return tri.inv_diag[:n] * (r - contrib)
        return lax.fori_loop(0, sweeps, body, y)

    r_pad = jnp.pad(r, (0, 1))
    # Derive the zeros from r so the loop carry is device-varying under
    # shard_map (fresh zeros are replicated-typed, but the body writes
    # varying data — same pattern as lgmres's Zaug init).
    y0 = 0.0 * r_pad

    def body(l, y):
        rows = tri.level_rows[l]  # (W,) padded with n
        cols = tri.ell_cols[rows]  # (W, K)
        contrib = jnp.sum(tri.ell_vals[rows] * y[cols], axis=1)
        val = (r_pad[rows] - contrib) * tri.inv_diag[rows]
        return y.at[rows].set(val)

    y = lax.fori_loop(0, tri.num_levels, body, y0)
    return y[:n]
