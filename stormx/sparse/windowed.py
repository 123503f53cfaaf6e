"""Sliced-ELLPACK with per-row-block column windows — the unstructured
TPU SpMV fast path (SURVEY §7 hard-part #1).

TPU gathers serialize (~0.14 Gnnz/s measured for ``ELL.matvec``'s
``x[cols]`` on one v5e chip — ~150M gathered elements/s regardless of
layout), so the general unstructured operator needs a gather-free
formulation.  After RCM reordering (``stormx.parallel.rcm_order``) every
nonzero of a mesh operator lies within a narrow band (bandwidth ~262 on
the reference's 79,672-cell ``step`` mesh), so the columns touched by any
block of ``R`` consecutive rows fit a window of ``C ≈ R + 2·bandwidth``
values.

The windows use a UNIFORM stride: block b reads x_pad[R·b : R·b + C]
(x left-padded by the lower bandwidth), so extracting ALL windows is
``C/R`` static shifted slices of a reshaped x — pure data movement, no
gather and no per-block dynamic slice (measured: per-block dynamic slices
cost ~0.7 ms for 623 blocks — more than the whole matmul).

Two in-window strategies:

* ``mode="dense"`` (default): per-block dense (R, C) windows precomputed
  host-side; matvec is one batched MXU einsum('brc,bc->br') at
  ``Precision.HIGHEST`` (default MXU precision truncates f32 → bf16,
  ~3e-2 error — CLAUDE.md).  Bandwidth-bound at n·C·4 bytes; measured
  ~729 GB/s effective on v5e → ~1 Gnnz/s on the step operator, ~7× the
  gather path.
* ``mode="onehot"``: gathered[r,k] = Σ_c [local_col==c]·win[c] — an
  iota-compare/select/reduce the VPU evaluates without materializing the
  (R, K, C) intermediate.  O(nnz) traffic but O(n·K·C) VPU compute —
  slower than dense on the step operator (measured); kept because its
  memory footprint is O(nnz), not O(n·C).
* ``mode="pallas"``: the :mod:`stormx.ops.pallas_sell` TPU kernel — the
  in-window selection as lane-wise ``tpu.dynamic_gather`` on VMEM-resident
  windows: O(nnz) traffic AND O(nnz·C/128) vector work.  TPU-only
  (interpret-mode elsewhere, for tests); requires f32 and
  ``block_rows % 128 == 0``.

The plain ELL gather path stays as the general-case oracle; tests assert
both modes match it to roundoff.

Reference analog: ``Utils/Table.hpp:125-190`` (CsrTable) is the storage the
reference loops over serially; this module is its TPU-native hot form.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SlicedELL", "sell_from_csr", "sell_from_ell", "auto_operator"]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclass(frozen=True)
class SlicedELL:
    """Row-blocked ELL with uniform-stride column windows (gather-free)."""

    data: jax.Array  # (nb, R, K)
    local_cols: jax.Array  # (nb, R, K) int32 in [0, C); padding → 0 w/ data 0
    shape: tuple[int, int]
    window: int  # C (multiple of R)
    pad_lo: int  # left zero-padding of x (covers the lower bandwidth)
    mode: str  # "dense" | "onehot"
    dense_blocks: jax.Array | None  # (nb, R, C), mode="dense" only

    @property
    def block_rows(self) -> int:
        return self.data.shape[1]

    def _windows(self, x: jax.Array) -> jax.Array:
        """(nb, C) windows win[b] = x_pad[R·b : R·b + C] via C/R static
        shifted slices — no gather, no dynamic slice."""
        nb, R, _ = self.data.shape
        C = self.window
        total = (nb + C // R) * R
        x_pad = jnp.concatenate(
            [
                jnp.zeros((self.pad_lo,), x.dtype),
                x,
                jnp.zeros((total - self.pad_lo - x.shape[0],), x.dtype),
            ]
        )
        xt = x_pad.reshape(-1, R)  # (nb + C/R, R)
        return jnp.concatenate(
            [xt[j : j + nb] for j in range(C // R)], axis=1
        )  # (nb, C)

    def matvec(self, x: jax.Array) -> jax.Array:
        if self.mode == "pallas":
            from stormx.ops.pallas_sell import sell_matvec_pallas

            return sell_matvec_pallas(
                self, x, interpret=jax.default_backend() != "tpu"
            )
        win = self._windows(x)  # (nb, C)
        if self.mode == "dense":
            y = jnp.einsum(
                "brc,bc->br",
                self.dense_blocks,
                win.astype(self.dense_blocks.dtype),
                precision=jax.lax.Precision.HIGHEST,
            )
        else:
            iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, self.window), 3)
            eq = self.local_cols[..., None] == iota
            gathered = jnp.sum(
                jnp.where(eq, win[:, None, None, :], jnp.zeros((), x.dtype)),
                axis=-1,
            )  # (nb, R, K)
            y = jnp.sum(self.data * gathered, axis=-1)
        return y.reshape(-1)[: self.shape[0]]

    def __matmul__(self, x):
        return self.matvec(x)


def _register_sliced_ell():
    data_fields = ("data", "local_cols", "dense_blocks")
    meta_fields = ("shape", "window", "pad_lo", "mode")

    def flatten(m):
        return (
            tuple(getattr(m, f) for f in data_fields),
            tuple(getattr(m, f) for f in meta_fields),
        )

    def unflatten(meta, data):
        kw = dict(zip(data_fields, data))
        kw.update(zip(meta_fields, meta))
        return SlicedELL(**kw)

    jax.tree_util.register_pytree_node(SlicedELL, flatten, unflatten)


_register_sliced_ell()


def sell_from_ell(
    ell,
    *,
    block_rows: int = 128,
    mode: str = "dense",
    max_dense_bytes: int = 2**31,
) -> SlicedELL:
    """Build from an ELL operator (rows assumed already well-ordered, e.g.
    RCM — use :func:`sell_from_csr` to reorder).

    Raises ``ValueError`` when the band is so wide that the format stops
    making sense: the window would cover (nearly) the whole row (``C ≥ n``
    after rounding — the "windows" are just dense rows then), or, in dense
    mode, the precomputed ``(nb, R, C)`` blocks would exceed
    ``max_dense_bytes`` (default 2 GiB).  ``auto_operator`` catches this and
    falls back to onehot mode / the ELL gather path.
    """
    return _build(
        np.asarray(ell.data), np.asarray(ell.cols), ell.shape, block_rows, mode,
        max_dense_bytes=max_dense_bytes,
    )


def _build(data, cols, shape, R, mode, *, max_dense_bytes: int = 2**31):
    n, K = data.shape
    nb = -(-n // R)
    pad = nb * R - n
    if pad:
        data = np.concatenate([data, np.zeros((pad, K), data.dtype)])
        cols = np.concatenate([cols, np.zeros((pad, K), cols.dtype)])
    db = data.reshape(nb, R, K)
    cb = cols.reshape(nb, R, K)
    live = db != 0
    rows = np.broadcast_to(
        np.arange(nb * R).reshape(nb, R, 1), cb.shape
    )
    # Lower/upper bandwidth over REAL nonzeros.
    d = cb.astype(np.int64) - rows
    b_lo = int(max(-(d[live].min() if live.any() else 0), 0))
    b_hi = int(max(d[live].max() if live.any() else 0, 0))
    pad_lo = b_lo
    # Uniform-stride window extraction slices x_pad reshaped to (-1, R), so C
    # must be a multiple of R as well as of the 128-lane width — round to
    # lcm(R, 128) so the C//R shift math is well-defined for every R.
    C = _round_up(pad_lo + R + b_hi, math.lcm(R, 128))
    # Wide-band guard (documented in sell_from_ell): windows that span the
    # whole vector mean RCM failed to compress the band — the format degrades
    # to a dense matrix.  Refuse rather than silently build O(n²) state.
    if C >= shape[0] + R and shape[0] > math.lcm(R, 128):
        raise ValueError(
            f"SlicedELL window C={C} covers the whole vector (n={shape[0]}, "
            f"bandwidth {max(b_lo, b_hi)}); use the ELL gather path"
        )
    if mode == "dense" and nb * R * C * data.dtype.itemsize > max_dense_bytes:
        raise ValueError(
            f"SlicedELL dense blocks would need {nb * R * C * data.dtype.itemsize}"
            f" bytes (> max_dense_bytes={max_dense_bytes}); band too wide after"
            " reordering — use mode='onehot' or the ELL gather path"
        )
    # Window of block b covers cols [R·b − pad_lo, R·b − pad_lo + C).
    base = (np.arange(nb) * R - pad_lo)[:, None, None]
    local = np.where(live, cb - base, 0).astype(np.int64)
    if live.any():
        assert local[live].min() >= 0 and local[live].max() < C
    dense = None
    if mode == "dense":
        dense = np.zeros((nb, R, C), dtype=data.dtype)
        b_idx = np.repeat(np.arange(nb), R * K)
        r_idx = np.tile(np.repeat(np.arange(R), K), nb)
        np.add.at(dense, (b_idx, r_idx, local.reshape(-1)), db.reshape(-1))
    return SlicedELL(
        data=jnp.asarray(db),
        local_cols=jnp.asarray(local.astype(np.int32)),
        shape=shape,
        window=C,
        pad_lo=pad_lo,
        mode=mode,
        dense_blocks=None if dense is None else jnp.asarray(dense),
    )


def sell_from_csr(
    csr, *, block_rows: int = 128, mode: str = "dense", reorder: bool = True,
    coords=None,
):
    """CSR → (SlicedELL, perm): bandwidth-minimizing reorder (RCM, or the
    best of RCM and coordinate sorts when entity ``coords`` are given —
    window cost scales with the total band), then slice into row blocks.

    ``perm[new] = old``; solve in permuted space (``b_p = b[perm]``) and map
    back with ``x = x_p[inv]`` where ``inv[perm] = arange(n)`` — identical
    contract to :func:`stormx.fvm.divgrad.assemble_divgrad_dia`.
    """
    from stormx.sparse.formats import ell_from_csr

    n = csr.shape[0]
    row_ptr = np.asarray(csr.row_ptr)
    indices = np.asarray(csr.indices)
    data = np.asarray(csr.data)
    if reorder:
        from stormx.parallel.partition import bandwidth_order

        rows = np.repeat(np.arange(n), np.diff(row_ptr))
        perm = bandwidth_order(n, rows, indices.astype(np.int64), coords)
        inv = np.empty(n, dtype=np.int64)
        inv[perm] = np.arange(n)
        new_rows = inv[rows]
        new_cols = inv[indices]
        order = np.lexsort((new_cols, new_rows))
        rp = np.zeros(n + 1, dtype=np.int32)
        np.add.at(rp, new_rows + 1, 1)
        from stormx.sparse.formats import CSR

        # HOST arrays on purpose: this CSR is a build intermediate that
        # ell_from_csr immediately reads back with np.asarray.  On a
        # remote-relay TPU backend a jnp.asarray here ships ~40 MB each
        # way through the ~28 MB/s tunnel (measured 80-440 s per build at
        # 1.27M rows); device arrays are created once, in _build.
        csr = CSR(
            data=data[order],
            indices=new_cols[order].astype(np.int32),
            row_ptr=np.cumsum(rp).astype(np.int32),
            shape=csr.shape,
        )
    else:
        perm = np.arange(n, dtype=np.int64)
    ell = ell_from_csr(csr, device=False)
    return _build(ell.data, ell.cols, csr.shape, block_rows, mode), perm


def auto_operator(
    csr, *, reorder: bool = True, max_diags: int = 64,
    block_rows: int | None = None, mode: str = "auto", coords=None,
):
    """Pick the TPU fast path for a sparse operator → (operator, perm).

    Measured v5e landscape (step-mesh operator, f32; slope protocol): DIA
    streams ~293 Gnnz/s when the operator IS banded with few populated
    diagonals (structured stencils); the Pallas window-gather SlicedELL
    (``mode="pallas"``) runs ~3.7 Gnnz/s on genuinely unstructured
    operators; the XLA dense-window einsum ~0.97; onehot ~0.63; the ELL
    ``x[cols]`` gather oracle ~0.14.  This helper applies that policy:
    RCM, then DIA iff ≤ ``max_diags`` distinct offsets survive, else
    SlicedELL — ``mode="auto"`` resolves to the Pallas kernel on TPU for
    f32 operators and to the XLA dense-window einsum elsewhere.

    Wide-band degradation (the documented ``sell_from_ell`` guard): when the
    post-RCM band is too wide for dense windows (O(n²)-ish storage), fall
    back to ``mode="onehot"`` (O(nnz) storage, ~0.63 Gnnz/s measured), and
    when even the windows span the whole vector, to the plain ELL gather
    oracle (~0.14 Gnnz/s) — slow but never pathological in memory.
    """
    from stormx.parallel.partition import bandwidth_order
    from stormx.sparse.formats import CSR, dia_from_csr

    n = csr.shape[0]
    row_ptr = np.asarray(csr.row_ptr)
    indices = np.asarray(csr.indices)
    data = np.asarray(csr.data)
    rows = np.repeat(np.arange(n), np.diff(row_ptr))
    if reorder:
        perm = bandwidth_order(n, rows, indices.astype(np.int64), coords)
    else:
        perm = np.arange(n, dtype=np.int64)
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n)
    new_rows, new_cols = inv[rows], inv[indices]
    n_offsets = len(np.unique(new_cols - new_rows))
    order = np.lexsort((new_cols, new_rows))
    rp = np.zeros(n + 1, dtype=np.int32)
    np.add.at(rp, new_rows + 1, 1)
    pcsr = CSR(
        data=jnp.asarray(data[order]),
        indices=jnp.asarray(new_cols[order].astype(np.int32)),
        row_ptr=jnp.asarray(np.cumsum(rp).astype(np.int32)),
        shape=csr.shape,
    )
    if n_offsets <= max_diags:
        return dia_from_csr(pcsr, max_diags=max_diags), perm
    if mode == "auto":
        mode = (
            "pallas"
            if (
                jax.default_backend() == "tpu"
                and np.asarray(data).dtype == np.float32
                and (block_rows is None or block_rows % 128 == 0)
            )
            else "dense"
        )
    if block_rows is None:
        # Measured optima (BENCH_NOTES.md): the Pallas kernel balances
        # grid-step overhead vs masked-chunk waste at R=512; the XLA modes
        # peak at R=128.
        block_rows = 512 if mode == "pallas" else 128
    try:
        sell, _ = sell_from_csr(pcsr, block_rows=block_rows, mode=mode, reorder=False)
        return sell, perm
    except ValueError:
        pass
    if mode == "dense":
        # Dense blocks too large — retry with O(nnz)-storage onehot windows.
        try:
            sell, _ = sell_from_csr(
                pcsr, block_rows=block_rows, mode="onehot", reorder=False
            )
            return sell, perm
        except ValueError:
            pass
    from stormx.sparse.formats import ell_from_csr

    return ell_from_csr(pcsr), perm
