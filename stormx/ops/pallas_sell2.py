"""Pallas TPU kernel v2 for the SlicedELL unstructured SpMV — host-side
chunk packing replaces the masked per-chunk gather loop.

STATUS (r4, measured on v5e — see BENCH_NOTES.md): RETIRED to validated
reference status; **the v1 kernel wins**.  Slope-protocol results on the
step operator (R=512, coords ordering):

* v1 masked-chunk loop (``pallas_sell``): **29.7–30.5 µs/apply,
  10.4–10.7 Gnnz/s** by the settled ≥2000-rep slope protocol (an earlier
  "13.4 µs / 23.6 Gnnz/s" figure was a 100/400-rep short-chain artifact
  against the dispatch floor — retracted in BENCH_NOTES.md; do not
  re-anchor on it).
* v2 "matmul" variant (this module): ~2× slower — the one-hot MXU chunk
  select + owner-masked reductions cost more than they save.
* v2 "gather" variant: **cannot compile** — Mosaic rejects cross-vreg
  sublane gathers ("Not implemented: Multiple source vregs along gather
  dimension"), so ``take_along_axis(..., axis=0)`` only lowers for ≤8-row
  sources.  Kept interpret-tested for future toolchains.

Original design rationale below.

The v1 kernel (:mod:`stormx.ops.pallas_sell`) emulates a flat gather from
the block's C-value window by looping over C/128 lane-chunks, masking one
``tpu.dynamic_gather`` per chunk: O(nnz · C/128) vector work — measured
~13% of its own traffic roofline at the step-operator operating point
(8 chunks).  The per-nnz work is constant here instead:

* HOST: every nonzero is repacked into a (M, 128) tile per row block such
  that (a) each tile ROW holds entries of a single 128-lane chunk of the
  window, and (b) every entry stays in the LANE of its matrix row
  (lane = row mod 128) so row sums remain lane-local.  Padding slots get
  value 0.  M = Σ_chunks max_lane count(lane, chunk) — measured ~1.5-2.5×
  the row-order sub·K on the step operator.
* KERNEL, per block: the per-row chunk ids become a one-hot matrix E and
  ``t1 = E @ win`` replicates each needed window chunk-row onto its tile
  row — one tiny MXU matmul at ``Precision.HIGHEST`` (the 0/1-permutation
  matmul trick validated bit-exact by the DIA kernels); then ONE lane-wise
  ``tpu.dynamic_gather`` selects within the chunk; row sums are owner-
  masked lane-local reductions (owner = which of the `sub` 128-row groups
  the entry's row belongs to, packed into the index word).

Index word layout (int32): ``owner << 12 | chunk << 7 | lane``
(chunk < 32 ⇒ window C ≤ 4096; owner < sub ≤ 16 ⇒ R ≤ 2048 — asserted by
the packer; ``auto_operator`` falls back to v1 outside that envelope).

HBM traffic per block ≈ (C + 2·M·128)·4 B; on the step operator
(R=256, M=24) ≈ 27 B/nnz — within ~2.9× of the O(nnz) floor while the
vector work per nnz is ~n_chunks× less than v1.

Validation protocol (CLAUDE.md): interpret-mode on CPU first, compiled at
SMALL size in a sacrificial ``timeout`` process, then full size vs the
ELL gather oracle.

Reference analog: the serial CsrTable row loops of
``/root/reference/source/Storm/Utils/Table.hpp:125-190``.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PackedSELL", "pack_sell", "supports_pallas2"]


def supports_pallas2(sell) -> bool:
    """Packing envelope: f32 data, R a multiple of 128 (lane alignment),
    chunk id in 5 bits, owner in 4 bits (see index word layout)."""
    return (
        sell.block_rows % 128 == 0
        and sell.block_rows <= 2048
        and sell.window % 128 == 0
        and sell.window <= 4096
        and sell.data.dtype == jnp.float32
    )


def _kernel3(win_ref, idx_ref, vals_ref, src_ref, out_ref, *, sub: int, K: int):
    """3-gather variant: sublane (dim-0) dynamic_gathers replace both the
    chunk-select matmul and the owner-masked reduction.

    src_ref: (1, M, 128) int32 — row-order entry (s, k, lane) at tile row
    s·K + k points to its packed slot row (dead/padding entries point at a
    guaranteed-zero packed slot).
    """
    win = win_ref[0]  # (nc8, 128)
    idx = idx_ref[0]  # (M, 128)
    vals = vals_ref[0]
    src = src_ref[0]
    M = idx.shape[0]
    nc8 = win.shape[0]
    lane = jnp.bitwise_and(idx, 127)
    chunk = jnp.bitwise_and(jnp.right_shift(idx, 7), 31)
    win_pad = jnp.concatenate(
        [win, jnp.zeros((M - nc8, 128), win.dtype)], axis=0
    )
    t1 = jnp.take_along_axis(win_pad, chunk, axis=0, mode="promise_in_bounds")
    gx = jnp.take_along_axis(t1, lane, axis=1, mode="promise_in_bounds")
    prod = vals * gx
    xr = jnp.take_along_axis(prod, src, axis=0, mode="promise_in_bounds")
    out_ref[0] = jnp.concatenate(
        [xr[s * K : (s + 1) * K].sum(axis=0, keepdims=True) for s in range(sub)],
        axis=0,
    )


@functools.partial(jax.jit, static_argnames=("sub", "K", "interpret"))
def _apply3(win3, idx, vals, src, *, sub: int, K: int, interpret: bool = False):
    from jax.experimental import pallas as pl

    nb, nc8, _ = win3.shape
    M = idx.shape[1]
    return pl.pallas_call(
        functools.partial(_kernel3, sub=sub, K=K),
        grid=(nb,),
        out_shape=jax.ShapeDtypeStruct((nb, sub, 128), vals.dtype),
        in_specs=[
            pl.BlockSpec((1, nc8, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, M, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, M, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, M, 128), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, sub, 128), lambda b: (b, 0, 0)),
        interpret=interpret,
    )(win3, idx, vals, src)


def _kernel(win_ref, idx_ref, vals_ref, out_ref, *, sub: int):
    """One grid step = one row block of R = sub·128 rows.

    win_ref:  (1, nc8, 128)  — the block's x-window as 128-lane chunk rows
    idx_ref:  (1, M, 128)    — packed index words (int32); chunk constant
                               per tile row (host packing invariant)
    vals_ref: (1, M, 128)    — packed nnz values (padding slots 0)
    out_ref:  (1, sub, 128)  — y rows (lane = row mod 128)
    """
    win = win_ref[0]  # (nc8, 128)
    idx = idx_ref[0]  # (M, 128)
    vals = vals_ref[0]
    M = idx.shape[0]
    nc8 = win.shape[0]
    lane = jnp.bitwise_and(idx, 127)
    # chunk is constant along lanes of each tile row — lane 0 is enough.
    chunk_col = jnp.bitwise_and(jnp.right_shift(idx[:, :1], 7), 31)  # (M, 1)
    iota = jax.lax.broadcasted_iota(jnp.int32, (M, nc8), 1)
    eye = (chunk_col == iota).astype(vals.dtype)  # (M, nc8) one-hot
    # Replicate each row's window chunk onto its tile row: exact 0/1-
    # permutation matmul (Precision.HIGHEST keeps f32 values bit-exact).
    t1 = jnp.dot(eye, win, precision=jax.lax.Precision.HIGHEST)  # (M, 128)
    gx = jnp.take_along_axis(t1, lane, axis=1, mode="promise_in_bounds")
    prod = vals * gx
    if sub == 1:
        out_ref[0] = prod.sum(axis=0, keepdims=True)
    else:
        owner = jnp.right_shift(idx, 12)
        out_ref[0] = jnp.concatenate(
            [
                jnp.where(owner == s, prod, jnp.zeros((), vals.dtype)).sum(
                    axis=0, keepdims=True
                )
                for s in range(sub)
            ],
            axis=0,
        )


@functools.partial(jax.jit, static_argnames=("sub", "interpret"))
def _apply(win3, idx, vals, *, sub: int, interpret: bool = False):
    from jax.experimental import pallas as pl

    nb, nc8, _ = win3.shape
    M = idx.shape[1]
    return pl.pallas_call(
        functools.partial(_kernel, sub=sub),
        grid=(nb,),
        out_shape=jax.ShapeDtypeStruct((nb, sub, 128), vals.dtype),
        in_specs=[
            pl.BlockSpec((1, nc8, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, M, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, M, 128), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, sub, 128), lambda b: (b, 0, 0)),
        interpret=interpret,
    )(win3, idx, vals)


def _pack(data: np.ndarray, local: np.ndarray):
    """(nb, R, K) ELL arrays → packed (nb, M, 128) index/value tiles.

    Entry (block b, row r, slot k) with value v and window-local column
    lc lands at tile position (m, r mod 128) where m is a row allocated to
    chunk lc>>7; within each (b, chunk, lane) group entries take
    consecutive ranks, and rows-per-chunk = max over lanes of the group
    count, so no two entries collide.  Fully vectorized (no per-row
    Python).
    """
    nb, R, K = data.shape
    sub = R // 128
    nc = int(local.max() >> 7) + 1 if local.size else 1
    b, r, k = np.nonzero(data != 0)
    val = data[b, r, k]
    lc = local[b, r, k].astype(np.int64)
    lane = r % 128
    owner = r // 128
    c = lc >> 7
    lane2 = lc & 127
    # rank within each (b, chunk, lane) group
    key = (b * nc + c) * 128 + lane
    order = np.argsort(key, kind="stable")
    ks = key[order]
    starts = np.flatnonzero(np.r_[True, np.diff(ks) != 0])
    gid = np.zeros(len(ks), dtype=np.int64)
    gid[starts] = 1
    gid = np.cumsum(gid) - 1
    rank = np.arange(len(ks)) - starts[gid]
    bc = ks >> 7  # b * nc + c
    rows_per = np.zeros(nb * nc, dtype=np.int64)
    np.maximum.at(rows_per, bc, rank + 1)
    rp2 = rows_per.reshape(nb, nc)
    off2 = np.cumsum(rp2, axis=1) - rp2  # row offset of chunk c within block
    # +1 keeps one guaranteed-all-zero row in EVERY block (row M-1): the
    # gather variant points dead row-order entries at it; M ≥ nc keeps the
    # in-kernel window padding concat non-negative; M ≥ sub·K fits the
    # row-order srcrow tile.
    M = max(int(rp2.sum(axis=1).max()) + 1, nc, sub * K)
    M = -(-M // 8) * 8
    m = off2.reshape(-1)[bc] + rank
    idx_arr = np.zeros((nb, M, 128), dtype=np.int32)
    vals_arr = np.zeros((nb, M, 128), dtype=data.dtype)
    bo, lo = b[order], lane[order]
    word = (owner[order].astype(np.int64) << 12) | (c[order] << 7) | lane2[order]
    idx_arr[bo, m, lo] = word.astype(np.int32)
    vals_arr[bo, m, lo] = val[order]
    # Host invariant the kernel relies on: chunk constant per tile row.
    # Padding slots carry chunk 0; fix rows whose lane-0 slot is padding by
    # broadcasting the row's true chunk into the whole row's chunk bits.
    row_chunk = np.zeros((nb, M), dtype=np.int32)
    np.maximum.at(row_chunk, (bo, m), (c[order]).astype(np.int32))
    idx_arr = (idx_arr & ~(31 << 7)) | (row_chunk[:, :, None] << 7)
    # Row-order → packed-slot map for the gather variant: entry (b, r, k)
    # sits at tile row (r//128)·K + k, lane r%128; dead entries point at the
    # guaranteed-zero row M-1.
    src_arr = np.full((nb, M, 128), M - 1, dtype=np.int32)
    src_arr[b, owner * K + k, lane] = m[np.argsort(order, kind="stable")]
    return idx_arr, vals_arr, src_arr


@dataclass(frozen=True)
class PackedSELL:
    """Chunk-packed SlicedELL operator — the TPU unstructured fast path.

    ``variant``: "matmul" = one-hot MXU chunk select + owner-masked row
    sums; "gather" = sublane dynamic_gathers for both the chunk select and
    the row-order unpermute (3 gathers total, no MXU).
    """

    idx: jax.Array  # (nb, M, 128) int32 packed words
    vals: jax.Array  # (nb, M, 128)
    src: jax.Array  # (nb, M, 128) int32 row-order → packed slot rows
    shape: tuple[int, int]
    window: int  # C
    pad_lo: int
    block_rows: int  # R
    ell_k: int  # K (row-order slots per row)
    variant: str = "matmul"

    @property
    def sub(self) -> int:
        return self.block_rows // 128

    def _windows(self, x: jax.Array) -> jax.Array:
        """(nb, C) uniform-stride windows — same extraction as
        :meth:`stormx.sparse.windowed.SlicedELL._windows`."""
        nb = self.idx.shape[0]
        R, C = self.block_rows, self.window
        total = (nb + C // R) * R
        x_pad = jnp.concatenate(
            [
                jnp.zeros((self.pad_lo,), x.dtype),
                x,
                jnp.zeros((total - self.pad_lo - x.shape[0],), x.dtype),
            ]
        )
        xt = x_pad.reshape(-1, R)
        return jnp.concatenate([xt[j : j + nb] for j in range(C // R)], axis=1)

    def matvec(self, x: jax.Array, *, interpret: bool | None = None) -> jax.Array:
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        nb = self.idx.shape[0]
        win = self._windows(x.astype(self.vals.dtype))
        win3 = win.reshape(nb, self.window // 128, 128)
        if self.variant == "gather":
            y = _apply3(
                win3, self.idx, self.vals, self.src,
                sub=self.sub, K=self.ell_k, interpret=interpret,
            )
        else:
            y = _apply(win3, self.idx, self.vals, sub=self.sub, interpret=interpret)
        return y.reshape(-1)[: self.shape[0]]

    def __matmul__(self, x):
        return self.matvec(x)


def _register_packed():
    data_fields = ("idx", "vals", "src")
    meta_fields = ("shape", "window", "pad_lo", "block_rows", "ell_k", "variant")

    def flatten(p):
        return (
            tuple(getattr(p, f) for f in data_fields),
            tuple(getattr(p, f) for f in meta_fields),
        )

    def unflatten(meta, data):
        kw = dict(zip(data_fields, data))
        kw.update(zip(meta_fields, meta))
        return PackedSELL(**kw)

    jax.tree_util.register_pytree_node(PackedSELL, flatten, unflatten)


_register_packed()


def pack_sell(sell, variant: str = "matmul") -> PackedSELL:
    """Repack a :class:`stormx.sparse.windowed.SlicedELL` for the v2
    kernel.  Same matvec products; the reduction tree differs from the ELL
    oracle, so agreement is to f32 roundoff (~1e-7 relative)."""
    if not supports_pallas2(sell):
        raise ValueError(
            "pallas v2 packing needs f32, block_rows % 128 == 0 (≤ 2048),"
            f" window ≤ 4096; got R={sell.block_rows}, C={sell.window},"
            f" dtype={sell.data.dtype}"
        )
    if variant not in ("matmul", "gather"):
        raise ValueError(f"unknown variant {variant!r}")
    idx, vals, src = _pack(np.asarray(sell.data), np.asarray(sell.local_cols))
    return PackedSELL(
        idx=jnp.asarray(idx),
        vals=jnp.asarray(vals),
        src=jnp.asarray(src),
        shape=sell.shape,
        window=sell.window,
        pad_lo=sell.pad_lo,
        block_rows=sell.block_rows,
        ell_k=sell.data.shape[-1],
        variant=variant,
    )
