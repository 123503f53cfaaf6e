"""Sparse approximate-inverse preconditioners: SPAI(0) and factored AINV.

Reference ``README.md:78-79`` lists **AINV** and **SPAI** as *Planned*.
These are the most TPU-native preconditioners of all: the apply is plain
SpMV (no triangular solves, no recurrences), so it runs at full streaming
rate, vectorizes, shards, and fuses like any other operator application.
All factorization work happens once on the host.

* **SPAI(0)** — static-pattern Frobenius-norm minimization: column m_j of M
  minimizes ‖A m_j − e_j‖₂ over the sparsity pattern of A's column a_j
  (M. Grote & T. Huckle, SISC 18(3), 1997, pattern level 0).  Each column is
  an independent small dense least-squares problem.
* **AINV** — factored sparse approximate inverse for SPD A:
  A⁻¹ ≈ Z D⁻¹ Zᵀ with Z unit upper triangular, built by incomplete
  biconjugation (Benzi–Meyer–Tůma, SISC 17(5), 1996) with drop tolerance.
  Apply = two SpMVs + a diagonal scale; self-adjoint, hence CG-safe.
"""

from __future__ import annotations

import numpy as np

from stormx.solvers.preconditioner import Preconditioner

__all__ = ["SpaiPreconditioner", "AinvPreconditioner", "spai0_build", "ainv_build"]


def _csr_host(csr):
    row_ptr = np.asarray(csr.row_ptr)
    cols = np.asarray(csr.indices)
    vals = np.asarray(csr.data)
    return row_ptr, cols, vals, csr.shape[0], csr.shape[1]


def _to_device_csr(row_ptr, cols, vals, shape):
    import jax.numpy as jnp

    from stormx.sparse import CSR

    return CSR(
        data=jnp.asarray(vals),
        indices=jnp.asarray(cols, dtype=jnp.int32),
        row_ptr=jnp.asarray(row_ptr, dtype=jnp.int32),
        shape=shape,
    )


def spai0_build(row_ptr, cols, vals, n):
    """SPAI with M's pattern = A's pattern.  Returns CSR triples of M.

    Column j: J = pattern(a_j) (rows of A's column j); I = rows where
    A[:, J] has entries.  Solve the |I|×|J| least-squares
    min ‖A[I,J] m − e_j[I]‖ and scatter m into column j of M.
    """
    # Column access: build CSC index of A.
    nnz = len(cols)
    rows_of = np.repeat(np.arange(n), np.diff(row_ptr))
    order = np.lexsort((rows_of, cols))
    csc_rows = rows_of[order]
    csc_vals = vals[order]
    csc_ptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(csc_ptr, cols.astype(np.int64) + 1, 1)
    csc_ptr = np.cumsum(csc_ptr)

    m_cols_per_row: list[list[int]] = [[] for _ in range(n)]
    m_vals_per_row: list[list[float]] = [[] for _ in range(n)]
    for j in range(n):
        J = csc_rows[csc_ptr[j] : csc_ptr[j + 1]]
        if len(J) == 0:
            continue
        # I = union of patterns of columns in J (rows of A[:, J]).
        I = np.unique(
            np.concatenate([csc_rows[csc_ptr[k] : csc_ptr[k + 1]] for k in J])
        )
        i_pos = {int(r): p for p, r in enumerate(I)}
        a_sub = np.zeros((len(I), len(J)), dtype=np.float64)
        for c, k in enumerate(J):
            for p in range(csc_ptr[k], csc_ptr[k + 1]):
                a_sub[i_pos[int(csc_rows[p])], c] = csc_vals[p]
        e = np.zeros(len(I), dtype=np.float64)
        e[i_pos[j]] = 1.0
        m, *_ = np.linalg.lstsq(a_sub, e, rcond=None)
        for c, k in enumerate(J):
            m_cols_per_row[int(k)].append(j)
            m_vals_per_row[int(k)].append(float(m[c]))

    out_ptr = np.zeros(n + 1, dtype=np.int64)
    out_c, out_v = [], []
    for i in range(n):
        order = np.argsort(m_cols_per_row[i])
        out_c.extend(np.asarray(m_cols_per_row[i], dtype=np.int64)[order])
        out_v.extend(np.asarray(m_vals_per_row[i])[order])
        out_ptr[i + 1] = len(out_c)
    return (
        out_ptr,
        np.asarray(out_c, dtype=np.int32),
        np.asarray(out_v, dtype=vals.dtype),
    )


class SpaiPreconditioner(Preconditioner):
    """SPAI(0) — M ≈ A⁻¹ minimizing ‖AM − I‖_F over A's pattern
    (reference ``README.md:79``, *Planned*).  Apply = M·r (one SpMV)."""

    def __init__(self, matrix):
        row_ptr, cols, vals, nr, nc = _csr_host(matrix)
        if nr != nc:
            raise ValueError("SPAI(0) needs a square matrix")
        m_ptr, m_cols, m_vals = spai0_build(row_ptr, cols, vals, nr)
        self._m = _to_device_csr(m_ptr, m_cols, m_vals, (nr, nc))

    def __call__(self, r):
        return self._m.matvec(r)

    def conj_apply(self, r):
        # Mᵀ·r without building a second CSR: (rᵀM)ᵀ via the transpose
        # identity — host-transposed CSR is cheap to cache if ever hot.
        if not hasattr(self, "_mt"):
            row_ptr, cols, vals, nr, nc = _csr_host(self._m)
            rows_of = np.repeat(np.arange(nr), np.diff(row_ptr))
            order = np.lexsort((rows_of, cols))
            t_ptr = np.zeros(nr + 1, dtype=np.int64)
            np.add.at(t_ptr, cols.astype(np.int64) + 1, 1)
            self._mt = _to_device_csr(
                np.cumsum(t_ptr), rows_of[order].astype(np.int32),
                vals[order], (nc, nr),
            )
        return self._mt.matvec(r)


def ainv_build(row_ptr, cols, vals, n, drop_tol=0.1):
    """Factored AINV for SPD A: returns (Z rows as CSR triples, inv_d).

    Right-looking outer-product biconjugation: start Z = I; at step i,
    d_i = aᵢᵀ z_i, then for j > i with p_j = aᵢᵀ z_j ≠ 0:
    z_j ← z_j − (p_j/d_i) z_i, dropping entries below ``drop_tol`` relative
    to the column norm.  Z is unit upper triangular (z_j holds rows ≤ j).
    """
    # Columns of Z as dicts row→val; z_j starts as e_j.
    z = [{j: 1.0} for j in range(n)]
    inv_d = np.zeros(n, dtype=np.float64)
    # Row access of A.
    a_rows = [
        (cols[row_ptr[i] : row_ptr[i + 1]], vals[row_ptr[i] : row_ptr[i + 1]])
        for i in range(n)
    ]
    # For the sparse update sweep we need, at step i, the set of j > i with
    # aᵢᵀ z_j ≠ 0.  Track, for each row r, which columns j currently hold a
    # nonzero z_j[r].
    holders: list[set] = [set() for _ in range(n)]
    for j in range(n):
        holders[j].add(j)

    def a_dot_z(i, zj):
        c, v = a_rows[i]
        return sum(float(v[k]) * zj.get(int(c[k]), 0.0) for k in range(len(c)))

    for i in range(n):
        d = a_dot_z(i, z[i])
        if d <= 0:
            raise ValueError(f"AINV breakdown at column {i}: pivot {d:g} ≤ 0")
        inv_d[i] = 1.0 / d
        c, _ = a_rows[i]
        touched = set()
        for k in range(len(c)):
            touched |= holders[int(c[k])]
        for j in sorted(touched):
            if j <= i:
                continue
            p = a_dot_z(i, z[j])
            if p == 0.0:
                continue
            alpha = p * inv_d[i]
            zj = z[j]
            for r, v in z[i].items():
                newv = zj.get(r, 0.0) - alpha * v
                zj[r] = newv
            # Drop small entries (keep the unit diagonal).
            norm = max(abs(v) for v in zj.values())
            for r in [r for r, v in zj.items() if r != j and abs(v) < drop_tol * norm]:
                del zj[r]
                holders[r].discard(j)
            for r in zj:
                holders[r].add(j)

    # Freeze Z to CSR (rows of Z: entry Z[r, j] = z[j][r]).
    z_ptr = np.zeros(n + 1, dtype=np.int64)
    rows_acc: list[list[tuple[int, float]]] = [[] for _ in range(n)]
    for j in range(n):
        for r, v in z[j].items():
            rows_acc[r].append((j, v))
    z_c, z_v = [], []
    for r in range(n):
        for j, v in sorted(rows_acc[r]):
            z_c.append(j)
            z_v.append(v)
        z_ptr[r + 1] = len(z_c)
    return (
        (z_ptr, np.asarray(z_c, dtype=np.int32), np.asarray(z_v)),
        inv_d,
    )


class AinvPreconditioner(Preconditioner):
    """Factored AINV (reference ``README.md:78``, *Planned*):
    M⁻¹ = Z D⁻¹ Zᵀ ≈ A⁻¹ for SPD A.  Apply = SpMVᵀ → scale → SpMV."""

    def __init__(self, matrix, *, drop_tol: float = 0.1):
        import jax.numpy as jnp

        row_ptr, cols, vals, nr, nc = _csr_host(matrix)
        if nr != nc:
            raise ValueError("AINV needs a square SPD matrix")
        (z_ptr, z_c, z_v), inv_d = ainv_build(
            row_ptr, cols, np.asarray(vals, dtype=np.float64), nr, drop_tol
        )
        dtype = np.asarray(vals).dtype
        self._z = _to_device_csr(z_ptr, z_c, z_v.astype(dtype), (nr, nc))
        # Zᵀ in CSR.
        rows_of = np.repeat(np.arange(nr), np.diff(z_ptr))
        order = np.lexsort((rows_of, z_c))
        t_ptr = np.zeros(nr + 1, dtype=np.int64)
        np.add.at(t_ptr, z_c.astype(np.int64) + 1, 1)
        self._zt = _to_device_csr(
            np.cumsum(t_ptr), rows_of[order].astype(np.int32),
            z_v[order].astype(dtype), (nc, nr),
        )
        self._inv_d = jnp.asarray(inv_d.astype(dtype))

    def __call__(self, r):
        return self._z.matvec(self._inv_d * self._zt.matvec(r))

    def conj_apply(self, r):
        return self(r)  # symmetric by construction
