"""Aggregation AMG preconditioner (V-cycle), device-side apply.

The reference lists AMG among its planned preconditioners
(``README.md:71-82``); nothing is implemented there.  This is a plain
(unsmoothed) aggregation AMG:

* **Setup (host, NumPy):** greedy root aggregation over the operator graph
  → piecewise-constant prolongation P; Galerkin coarse operator
  ``A_c = Pᵀ A P`` computed as a sparse triple product; recurse until the
  coarse problem is small, then factor it densely.
* **Apply (device, jit):** V-cycle with weighted-Jacobi smoothing.  Per
  level: restrict = ``segment_sum`` by aggregate id, prolong = one gather,
  smooth = operator products + diagonal scaling — exactly the primitives
  the TPU path already runs fast.

Usage: ``cg(op, b, x0, precond=AmgPreconditioner(csr))`` — needs the
explicit CSR (matrix-free operators cannot be coarsened algebraically).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from stormx.ops.segment import segment_sum
from stormx.solvers.preconditioner import Preconditioner

__all__ = ["AmgPreconditioner", "aggregate"]


def aggregate(row_ptr, cols, vals, n) -> np.ndarray:
    """Greedy root-based aggregation over the strength graph.

    Strength: |a_ij| ≥ θ·max_k |a_ik| with θ=0.25 (classic SA default).
    Unaggregated leftovers join the strongest neighboring aggregate.
    Returns aggregate ids (n,).
    """
    theta = 0.25
    agg = np.full(n, -1, dtype=np.int64)
    # Strength mask per row.
    strong_cols = []
    for i in range(n):
        lo, hi = row_ptr[i], row_ptr[i + 1]
        c, v = cols[lo:hi], np.abs(vals[lo:hi])
        off = c != i
        c, v = c[off], v[off]
        if len(v):
            keep = v >= theta * v.max()
            strong_cols.append(c[keep])
        else:
            strong_cols.append(c)
    next_agg = 0
    # Pass 1: roots — a node all of whose strong neighbors are free.
    for i in range(n):
        if agg[i] != -1:
            continue
        nbrs = strong_cols[i]
        if (agg[nbrs] == -1).all():
            agg[i] = next_agg
            agg[nbrs] = next_agg
            next_agg += 1
    # Pass 2: attach leftovers to any aggregated strong neighbor.
    for i in range(n):
        if agg[i] != -1:
            continue
        nbrs = strong_cols[i]
        done = nbrs[agg[nbrs] != -1]
        if len(done):
            agg[i] = agg[done[0]]
        else:
            agg[i] = next_agg
            next_agg += 1
    return agg


def _coarsen(row_ptr, cols, vals, n, agg, nc):
    """Galerkin triple product A_c = Pᵀ A P for piecewise-constant P."""
    rows = np.repeat(np.arange(n), np.diff(row_ptr))
    cr, cc = agg[rows], agg[cols]
    key = cr * nc + cc
    uniq, inv = np.unique(key, return_inverse=True)
    acc = np.zeros(len(uniq))
    np.add.at(acc, inv, vals)
    ur, uc = uniq // nc, uniq % nc
    rp = np.zeros(nc + 1, dtype=np.int64)
    np.add.at(rp, ur + 1, 1)
    return np.cumsum(rp), uc.astype(np.int64), acc


class AmgPreconditioner(Preconditioner):
    """V-cycle aggregation AMG for SPD CSR operators.

    ``num_sweeps`` weighted-Jacobi (ω=2/3) pre+post smoothing sweeps per
    level; coarse systems ≤ ``coarse_size`` are solved by a dense factor.
    """

    def __init__(self, csr, *, num_sweeps: int = 1, coarse_size: int = 64,
                 max_levels: int = 10, omega: float = 2.0 / 3.0):
        self.num_sweeps = num_sweeps
        self.omega = omega
        self._levels = []
        row_ptr = np.asarray(csr.row_ptr).astype(np.int64)
        cols = np.asarray(csr.indices).astype(np.int64)
        vals = np.asarray(csr.data).astype(np.float64)
        n = csr.shape[0]
        for _ in range(max_levels):
            if n <= coarse_size:
                break
            agg = aggregate(row_ptr, cols, vals, n)
            nc = int(agg.max()) + 1
            if nc >= n:  # no coarsening progress
                break
            diag = np.zeros(n)
            rows = np.repeat(np.arange(n), np.diff(row_ptr))
            np.add.at(diag, rows[cols == rows], vals[cols == rows])
            self._levels.append(
                {
                    "rows": jnp.asarray(rows),
                    "cols": jnp.asarray(cols),
                    "vals": jnp.asarray(vals),
                    "inv_diag": jnp.asarray(
                        np.where(diag != 0.0, 1.0 / np.where(diag == 0, 1, diag), 0.0)
                    ),
                    "agg": jnp.asarray(agg),
                    "n": n,
                    "nc": nc,
                }
            )
            row_ptr, cols, vals = _coarsen(row_ptr, cols, vals, n, agg, nc)
            n = nc
        # Dense coarse factor.
        dense = np.zeros((n, n))
        rows = np.repeat(np.arange(n), np.diff(row_ptr))
        dense[rows, cols] = vals
        self._coarse_inv = jnp.asarray(np.linalg.pinv(dense))

    def build(self, x, b, op):
        return self

    # -- device-side V-cycle ------------------------------------------------
    def _matvec(self, lvl, x):
        return segment_sum(lvl["vals"] * x[lvl["cols"]], lvl["rows"], lvl["n"])

    def _smooth(self, lvl, x, b):
        for _ in range(self.num_sweeps):
            r = b - self._matvec(lvl, x)
            x = x + self.omega * lvl["inv_diag"] * r
        return x

    def _vcycle(self, k, b):
        if k == len(self._levels):
            return self._coarse_inv @ b
        lvl = self._levels[k]
        x = self._smooth(lvl, jnp.zeros_like(b), b)
        r = b - self._matvec(lvl, x)
        r_c = segment_sum(r, lvl["agg"], lvl["nc"])
        e_c = self._vcycle(k + 1, r_c)
        x = x + e_c[lvl["agg"]]
        return self._smooth(lvl, x, b)

    def __call__(self, r):
        leaves = jnp.asarray(r)
        return self._vcycle(0, leaves)

    def conj_apply(self, r):
        return self(r)
