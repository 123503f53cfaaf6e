"""Sparse matrix containers: CSR / COO / ELL / BSR, registered as pytrees.

Reference counterpart: ``Utils/Table.hpp:125-254`` (``CsrTable``: row offsets +
column values) — there it stores mesh adjacency; here the same layout carries
operator nonzeros.  The TPU-first re-design adds:

  * **ELL** (fixed nonzeros/row, padded): the *canonical device format*.
    SpMV = ``(data * x[cols]).sum(1)`` — a single XLA gather plus a dense
    reduction over the row axis.  No scatter appears anywhere, which matters
    because TPU scatters serialize while gathers vectorize.  Padding entries
    point at column 0 with weight 0.
  * **BSR** (block ELL): dense b×b blocks so SpMV contracts on the MXU via
    einsum.
  * **CSR/COO**: host/assembly formats and the segment-sum correctness oracle.

All containers are immutable dataclasses registered with jax.tree_util, so
they can be closed over by jitted solvers, donated, and sharded.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from stormx.ops.segment import segment_sum

__all__ = [
    "CSR",
    "COO",
    "ELL",
    "BSR",
    "DIA",
    "csr_from_dense",
    "ell_from_csr",
    "bsr_from_csr",
    "dia_from_csr",
    "ell_spgemm",
    "ell_add",
]


def _register(cls, data_fields, meta_fields):
    def flatten(obj):
        return (
            tuple(getattr(obj, f) for f in data_fields),
            tuple(getattr(obj, f) for f in meta_fields),
        )

    def unflatten(meta, data):
        kwargs = dict(zip(data_fields, data))
        kwargs.update(zip(meta_fields, meta))
        return cls(**kwargs)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@dataclass(frozen=True)
class CSR:
    """Compressed sparse row (reference ``CsrTable``, ``Utils/Table.hpp:125-190``)."""

    data: jax.Array  # (nnz,)
    indices: jax.Array  # (nnz,) int32 column ids
    row_ptr: jax.Array  # (n_rows + 1,) int32 offsets
    shape: tuple[int, int]

    @property
    def nnz(self) -> int:
        return self.data.shape[0]

    def row_ids(self) -> jax.Array:
        """Expand row_ptr into per-nonzero row ids (COO row vector).

        Pure-JAX (trace-safe): row of nnz j = #{i : row_ptr[i+1] ≤ j}.
        """
        j = jnp.arange(self.nnz, dtype=jnp.int32)
        return jnp.searchsorted(self.row_ptr[1:], j, side="right").astype(jnp.int32)

    def matvec(self, x: jax.Array) -> jax.Array:
        """Segment-sum SpMV: the correctness oracle for the ELL fast path."""
        vals = self.data * x[self.indices]
        return segment_sum(vals, self.row_ids(), self.shape[0])

    def __matmul__(self, x):
        return self.matvec(x)

    def diagonal(self) -> jax.Array:
        """Extract the main diagonal (missing entries → 0), for Jacobi."""
        rid = self.row_ids()
        is_diag = rid == self.indices
        return segment_sum(
            jnp.where(is_diag, self.data, 0.0), rid, self.shape[0]
        )

    def todense(self) -> jax.Array:
        out = jnp.zeros(self.shape, dtype=self.data.dtype)
        return out.at[self.row_ids(), self.indices].add(self.data)


_register(CSR, ("data", "indices", "row_ptr"), ("shape",))


@dataclass(frozen=True)
class COO:
    """Coordinate format — the assembly staging format."""

    data: jax.Array  # (nnz,)
    rows: jax.Array  # (nnz,) int32
    cols: jax.Array  # (nnz,) int32
    shape: tuple[int, int]

    def matvec(self, x: jax.Array) -> jax.Array:
        return segment_sum(self.data * x[self.cols], self.rows, self.shape[0])

    def __matmul__(self, x):
        return self.matvec(x)

    def to_csr(self) -> CSR:
        rows = np.asarray(self.rows)
        cols = np.asarray(self.cols)
        data = np.asarray(self.data)
        order = np.lexsort((cols, rows))
        rows, cols, data = rows[order], cols[order], data[order]
        # Sum duplicates.
        key = rows.astype(np.int64) * self.shape[1] + cols
        uniq, inv = np.unique(key, return_inverse=True)
        summed = np.zeros(len(uniq), dtype=data.dtype)
        np.add.at(summed, inv, data)
        u_rows = (uniq // self.shape[1]).astype(np.int32)
        u_cols = (uniq % self.shape[1]).astype(np.int32)
        row_ptr = np.zeros(self.shape[0] + 1, dtype=np.int32)
        np.add.at(row_ptr, u_rows + 1, 1)
        row_ptr = np.cumsum(row_ptr, dtype=np.int32)
        return CSR(
            data=jnp.asarray(summed),
            indices=jnp.asarray(u_cols),
            row_ptr=jnp.asarray(row_ptr),
            shape=self.shape,
        )


_register(COO, ("data", "rows", "cols"), ("shape",))


@dataclass(frozen=True)
class ELL:
    """ELLPACK: fixed row width K — the canonical TPU SpMV format.

    ``matvec`` compiles to gather + multiply + row-sum; XLA fuses the multiply
    and reduction, leaving one gather as the only non-elementwise op.
    """

    data: jax.Array  # (n_rows, K)
    cols: jax.Array  # (n_rows, K) int32; padding points at col 0 with data 0
    shape: tuple[int, int]

    @property
    def row_width(self) -> int:
        return self.data.shape[1]

    def matvec(self, x: jax.Array) -> jax.Array:
        gathered = x[self.cols]  # (n, K) one XLA gather
        return jnp.sum(self.data * gathered, axis=1)

    def __matmul__(self, x):
        return self.matvec(x)

    def diagonal(self) -> jax.Array:
        n = self.shape[0]
        rows = jnp.arange(n, dtype=self.cols.dtype)[:, None]
        return jnp.sum(jnp.where(self.cols == rows, self.data, 0.0), axis=1)

    def to_csr(self) -> CSR:
        """Host-side conversion (drops padding; keeps diagonal slots even
        when numerically zero so factorizations find an explicit diagonal)."""
        data = np.asarray(self.data)
        cols = np.asarray(self.cols)
        n = self.shape[0]
        rows = np.broadcast_to(np.arange(n)[:, None], cols.shape)
        keep = (data != 0) | (cols == rows)
        coo = COO(
            data=jnp.asarray(data[keep]),
            rows=jnp.asarray(rows[keep].astype(np.int32)),
            cols=jnp.asarray(cols[keep].astype(np.int32)),
            shape=self.shape,
        )
        return coo.to_csr()


_register(ELL, ("data", "cols"), ("shape",))


@dataclass(frozen=True)
class BSR:
    """Block-ELL with dense b×b blocks; SpMV contracts blocks on the MXU.

    y[i·b:(i+1)·b] = Σₖ blocks[i,k] @ x[cols[i,k]·b : ...] — an einsum over
    (n_block_rows, K, b, b) × gathered (n_block_rows, K, b).
    """

    blocks: jax.Array  # (n_brows, K, b, b)
    cols: jax.Array  # (n_brows, K) int32 block-column ids
    shape: tuple[int, int]  # scalar (unblocked) shape

    @property
    def block_size(self) -> int:
        return self.blocks.shape[-1]

    def matvec(self, x: jax.Array) -> jax.Array:
        b = self.block_size
        n_brows = self.blocks.shape[0]
        xb = x.reshape(-1, b)  # (n_bcols, b)
        gathered = xb[self.cols]  # (n_brows, K, b)
        # Precision.HIGHEST: default MXU precision truncates f32 inputs to
        # bf16 (~3e-2 error, measured — CLAUDE.md); the contraction is
        # bandwidth-bound so full precision is ~free.
        out = jnp.einsum(
            "rkij,rkj->ri",
            self.blocks,
            gathered,
            preferred_element_type=x.dtype,
            precision=lax.Precision.HIGHEST,
        )
        return out.reshape(n_brows * b)

    def __matmul__(self, x):
        return self.matvec(x)

    def diagonal_blocks(self) -> jax.Array:
        """(n_brows, b, b) diagonal blocks (zeros where absent) for block-Jacobi."""
        n_brows = self.blocks.shape[0]
        rows = jnp.arange(n_brows, dtype=self.cols.dtype)[:, None]
        mask = (self.cols == rows)[..., None, None]
        return jnp.sum(jnp.where(mask, self.blocks, 0.0), axis=1)


_register(BSR, ("blocks", "cols"), ("shape",))


@dataclass(frozen=True)
class DIA:
    """Diagonal (banded) storage — the speed-of-light TPU SpMV format.

    TPUs have no hardware gather: XLA lowers ``x[cols]`` to a serial
    per-element loop, which measures ~400× below HBM roofline.  But after
    bandwidth-reducing reordering (``stormx.parallel.rcm_order``) mesh
    operators are *banded*, and a banded SpMV needs no gather at all:

        y[i] = Σ_d  data[d, i] · x[i + offsets[d]]

    i.e. one statically-shifted elementwise FMA per stored diagonal — pure
    VPU work streaming from HBM, which XLA fuses into a single kernel.
    ``data[d, i]`` holds ``A[i, i + offsets[d]]`` (zero where out of range).

    Capability parity: the reference's only benchmark operator is exactly
    this shape (9-point Laplace stencil, ``tests/benchmark/BitternLaplace2D
    .cpp``), and its CSR mesh tables (``Utils/Table.hpp:125-190``) convert
    via :func:`dia_from_csr`.
    """

    data: jax.Array  # (num_diags, n_rows)
    offsets: tuple[int, ...]  # static; one per stored diagonal
    shape: tuple[int, int]

    @property
    def num_diags(self) -> int:
        return self.data.shape[0]

    def matvec(self, x: jax.Array) -> jax.Array:
        n, m = self.shape
        # x index is i + off for row i ∈ [0, n); pad so every static slice
        # of length n is in range (out-of-band data entries are zero).
        lo = max(0, -min(self.offsets))
        hi = max(0, n + max(self.offsets) - m)
        x_pad = jnp.pad(x, (lo, hi)) if (lo or hi) else x
        y = jnp.zeros(n, dtype=jnp.result_type(self.data.dtype, x.dtype))
        for d, off in enumerate(self.offsets):
            y = y + self.data[d] * lax.slice(x_pad, (lo + off,), (lo + off + n,))
        return y

    def __matmul__(self, x):
        return self.matvec(x)

    def diagonal(self) -> jax.Array:
        if 0 in self.offsets:
            return self.data[self.offsets.index(0)]
        return jnp.zeros(self.shape[0], dtype=self.data.dtype)


_register(DIA, ("data",), ("offsets", "shape"))


# ---------------------------------------------------------------------------
# Host-side converters (NumPy; run once at setup).
# ---------------------------------------------------------------------------


def csr_from_dense(mat) -> CSR:
    mat = np.asarray(mat)
    n_rows, n_cols = mat.shape
    rows, cols = np.nonzero(mat)
    row_ptr = np.zeros(n_rows + 1, dtype=np.int32)
    np.add.at(row_ptr, rows.astype(np.int32) + 1, 1)
    row_ptr = np.cumsum(row_ptr, dtype=np.int32)
    return CSR(
        data=jnp.asarray(mat[rows, cols]),
        indices=jnp.asarray(cols.astype(np.int32)),
        row_ptr=jnp.asarray(row_ptr),
        shape=(n_rows, n_cols),
    )


def ell_from_csr(csr: CSR, row_width: int | None = None, *,
                 device: bool = True) -> ELL:
    """Pad CSR rows to a fixed width.  For FVM cell-adjacency operators the
    natural width is maxdeg+1 (≤ 4 for triangles), so padding waste is tiny.

    ``device=False`` keeps the ELL leaves as host NumPy arrays — for build
    intermediates that are immediately read back on host (a device round
    trip costs ~40 MB each way through the remote-relay tunnel at the
    1.27M-cell scale)."""
    row_ptr = np.asarray(csr.row_ptr)
    indices = np.asarray(csr.indices)
    data = np.asarray(csr.data)
    n = csr.shape[0]
    counts = np.diff(row_ptr)
    K = int(row_width if row_width is not None else counts.max() if n else 0)
    if counts.max(initial=0) > K:
        raise ValueError(f"row_width {K} < max row nnz {counts.max()}")
    cols = np.zeros((n, K), dtype=np.int32)
    vals = np.zeros((n, K), dtype=data.dtype)
    # Vectorized fill: position of each nnz within its row.
    within = np.arange(len(indices)) - np.repeat(row_ptr[:-1], counts)
    row_of = np.repeat(np.arange(n), counts)
    cols[row_of, within] = indices
    vals[row_of, within] = data
    if not device:
        return ELL(data=vals, cols=cols, shape=csr.shape)
    return ELL(data=jnp.asarray(vals), cols=jnp.asarray(cols), shape=csr.shape)


def dia_from_csr(csr: CSR, max_diags: int | None = None) -> DIA:
    """Convert CSR to diagonal storage (host-side).

    Stores every populated diagonal; raises if that exceeds ``max_diags``
    (use RCM reordering first to shrink the band, or stay with ELL for
    genuinely scattered operators).
    """
    row_ptr = np.asarray(csr.row_ptr)
    indices = np.asarray(csr.indices)
    data = np.asarray(csr.data)
    n = csr.shape[0]
    counts = np.diff(row_ptr)
    rows = np.repeat(np.arange(n, dtype=np.int64), counts)
    offs = indices.astype(np.int64) - rows
    uniq = np.unique(offs)
    if max_diags is not None and len(uniq) > max_diags:
        raise ValueError(
            f"{len(uniq)} populated diagonals > max_diags={max_diags}; "
            "apply rcm_order first or use ELL"
        )
    slot = np.searchsorted(uniq, offs)
    diag = np.zeros((len(uniq), n), dtype=data.dtype)
    np.add.at(diag, (slot, rows), data)
    return DIA(
        data=jnp.asarray(diag),
        offsets=tuple(int(o) for o in uniq),
        shape=csr.shape,
    )


def bsr_from_csr(csr: CSR, block_size: int, row_width: int | None = None) -> BSR:
    """Aggregate a CSR matrix with block-structured sparsity into block-ELL.

    Rows/cols must be a multiple of ``block_size``; any scalar nonzero lands
    in its enclosing block (absent entries zero-filled).
    """
    b = block_size
    n_rows, n_cols = csr.shape
    if n_rows % b or n_cols % b:
        raise ValueError("shape must be divisible by block_size")
    row_ptr = np.asarray(csr.row_ptr)
    indices = np.asarray(csr.indices)
    data = np.asarray(csr.data)
    counts = np.diff(row_ptr)
    rows = np.repeat(np.arange(n_rows), counts)
    brows, bcols = rows // b, indices // b
    key = brows.astype(np.int64) * (n_cols // b) + bcols
    uniq, inv = np.unique(key, return_inverse=True)
    u_brows = (uniq // (n_cols // b)).astype(np.int64)
    u_bcols = (uniq % (n_cols // b)).astype(np.int32)
    # Per-block-row width.
    per_row = np.bincount(u_brows, minlength=n_rows // b)
    K = int(row_width if row_width is not None else per_row.max() if len(uniq) else 0)
    if per_row.max(initial=0) > K:
        raise ValueError(f"row_width {K} < max block row width {per_row.max()}")
    slot_of_block = np.zeros(len(uniq), dtype=np.int64)
    start = np.zeros(n_rows // b + 1, dtype=np.int64)
    np.cumsum(per_row, out=start[1:])
    slot_of_block = np.arange(len(uniq)) - start[u_brows]
    blocks = np.zeros((n_rows // b, K, b, b), dtype=data.dtype)
    cols = np.zeros((n_rows // b, K), dtype=np.int32)
    cols[u_brows, slot_of_block] = u_bcols
    blocks[u_brows[inv], slot_of_block[inv], rows % b, indices % b] += data
    return BSR(blocks=jnp.asarray(blocks), cols=jnp.asarray(cols), shape=csr.shape)


def ell_spgemm(a: ELL, b: ELL) -> CSR:
    """Host-side sparse·sparse product C = A·B for ELL operands.

    Used to assemble composed FVM operators (e.g. the Cahn–Hilliard
    biharmonic term D², ``stormx/apps/cahn_hilliard.py``) ONCE per mesh so
    the hot solve runs through the assembled TPU fast path instead of
    re-evaluating nested matrix-free gathers every Krylov iteration.
    Vectorized over the Ka·Kb slot product (no Python per-row loops);
    duplicates merged by ``COO.to_csr``.
    """
    if a.shape[1] != b.shape[0]:
        raise ValueError(f"shape mismatch {a.shape} @ {b.shape}")
    ad, ac = np.asarray(a.data), np.asarray(a.cols)
    bd, bc = np.asarray(b.data), np.asarray(b.cols)
    n, Ka = ad.shape
    Kb = bd.shape[1]
    # Chunk over row blocks: the dense (rows, Ka, Kb) temporaries would be
    # ~2.5 GB transient at the 4.2M-row headline scale (round-3 advisor
    # finding) — bound them to ~Ka·Kb·8·CHUNK bytes instead.
    CHUNK = 1 << 19  # 512k rows
    out_d, out_r, out_c = [], [], []
    for lo in range(0, n, CHUNK):
        hi = min(lo + CHUNK, n)
        acs = ac[lo:hi]
        rows = np.broadcast_to(
            np.arange(lo, hi)[:, None, None], (hi - lo, Ka, Kb)
        )
        cols = bc[acs]  # (chunk, Ka, Kb)
        vals = ad[lo:hi, :, None] * bd[acs]  # (chunk, Ka, Kb)
        keep = vals != 0
        # Keep explicit diagonal slots so downstream factorizations find one.
        keep |= cols == rows
        out_d.append(vals[keep])
        out_r.append(rows[keep].astype(np.int32))
        out_c.append(cols[keep].astype(np.int32))
    coo = COO(
        data=jnp.asarray(np.concatenate(out_d)),
        rows=jnp.asarray(np.concatenate(out_r)),
        cols=jnp.asarray(np.concatenate(out_c)),
        shape=(a.shape[0], b.shape[1]),
    )
    return coo.to_csr()


def ell_add(terms, shape) -> CSR:
    """Host-side linear combination Σ cᵢ·Aᵢ of ELL/CSR operands →  CSR.

    ``terms``: iterable of (coeff, operator|None); ``None`` stands for the
    identity.
    """
    datas, rows_l, cols_l = [], [], []
    n = shape[0]
    for coeff, op in terms:
        if op is None:
            datas.append(np.full(n, float(coeff)))
            rows_l.append(np.arange(n))
            cols_l.append(np.arange(n))
            continue
        if isinstance(op, CSR):
            d = np.asarray(op.data) * coeff
            r = np.repeat(np.arange(n), np.diff(np.asarray(op.row_ptr)))
            c = np.asarray(op.indices)
        else:  # ELL
            dd, cc = np.asarray(op.data), np.asarray(op.cols)
            rr = np.broadcast_to(np.arange(n)[:, None], cc.shape)
            keep = (dd != 0) | (cc == rr)
            d, r, c = dd[keep] * coeff, rr[keep], cc[keep]
        datas.append(d), rows_l.append(r), cols_l.append(c)
    coo = COO(
        data=jnp.asarray(np.concatenate(datas)),
        rows=jnp.asarray(np.concatenate(rows_l).astype(np.int32)),
        cols=jnp.asarray(np.concatenate(cols_l).astype(np.int32)),
        shape=shape,
    )
    return coo.to_csr()
