"""Pallas TPU kernel for the SlicedELL unstructured SpMV — in-VMEM window
gather via the lane-wise ``tpu.dynamic_gather`` primitive.

Why this exists (the measured v5e landscape, CLAUDE.md / BENCH_NOTES.md):

* XLA serializes random gathers on TPU: the ELL ``x[cols]`` path measures
  ~0.14 Gnnz/s whatever the layout.
* The SlicedELL *dense* mode fixes that with batched MXU einsums over
  per-block windows, but pays n·C·4 bytes of HBM traffic per apply
  (≈770 B/nnz on the step operator) — bandwidth-roofline on its own
  padding, ~0.95 Gnnz/s.
* The *onehot* mode is O(nnz) bytes but O(n·K·C) VPU compare/select work
  in XLA, ~0.63 Gnnz/s.

The missing primitive is a cheap in-register gather.  Mosaic lowers
``jnp.take_along_axis(src, idx, axis=1)`` on a ``(M, 128)`` VMEM block to
``tpu.dynamic_gather`` — each sublane row gathers within its own 128
lanes.  That turns the in-window selection into O(nnz · C/128) vector ops
while reading only O(nnz) bytes:

  per 128-row block (grid step):
    window (C values) → VMEM as (C/128, 128) sublane rows
    nnz repacked (K, 128): sublane k = k-th entry of each of 128 rows
    for each chunk c < C/128:
        g = dynamic_gather(broadcast(window[c]), local_col & 127)
        acc += where(local_col >> 7 == c, g, 0)
    y_block = sum_k vals[k] * acc[k]

HBM traffic ≈ (C + 2·R·K + R)·4 B per block ≈ 24 B/nnz on the step
operator (K=4, C=768) — 32× less than dense mode.

The uniform-stride window extraction (``SlicedELL._windows``) stays in
XLA: it is pure data movement producing the (nb, C) window matrix the
kernel streams.

Validation protocol (CLAUDE.md): interpret-mode on CPU first, compiled at
SMALL size in a sacrificial ``timeout`` process, then full size bit-exact
against the ELL gather oracle.

Reference analog: the serial CsrTable row loops of
``/root/reference/source/Storm/Utils/Table.hpp:125-190``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["sell_matvec_pallas", "supports_pallas"]


def supports_pallas(sell) -> bool:
    """The kernel handles R a multiple of 128 (lane packing) and f32."""
    return (
        sell.block_rows % 128 == 0
        and sell.window % 128 == 0
        and sell.data.dtype == jnp.float32
    )


def _kernel(
    win_ref, vals_ref, cols_ref, out_ref, *,
    n_chunks: int, sub: int, K: int, mask_mode: str = "where",
):
    """One grid step = one row block of R = sub·128 rows.

    Mosaic's dynamic_gather lowering is 2-D only, so everything stays
    (rows, 128)-shaped.

    win_ref:  (1, n_chunks, 128)  — the block's x-window
    vals_ref: (1, sub·K, 128)     — nnz values, lane = row-in-128-group
    cols_ref: (1, sub·K, 128)     — local window columns (int32)
    out_ref:  (1, sub, 128)       — y rows
    """
    win = win_ref[0]  # (n_chunks, 128)
    vals = vals_ref[0]  # (sub·K, 128)
    cols = cols_ref[0]
    M = vals.shape[0]
    lane = jnp.bitwise_and(cols, 127)
    chunk = jnp.right_shift(cols, 7)
    acc = jnp.zeros(vals.shape, vals.dtype)
    for c in range(n_chunks):
        src = jnp.broadcast_to(win[c : c + 1], (M, 128))
        g = jnp.take_along_axis(src, lane, axis=1, mode="promise_in_bounds")
        if mask_mode == "mul":
            acc = acc + g * (chunk == c).astype(vals.dtype)
        else:
            acc = acc + jnp.where(chunk == c, g, jnp.zeros((), vals.dtype))
    prod = vals * acc
    out_ref[0] = jnp.concatenate(
        [prod[s * K : (s + 1) * K].sum(axis=0, keepdims=True) for s in range(sub)],
        axis=0,
    )


@functools.partial(jax.jit, static_argnames=("sub", "K", "interpret", "mask_mode"))
def _apply(
    win3, vals_t, cols_t, *,
    sub: int, K: int, interpret: bool = False, mask_mode: str = "where",
):
    from jax.experimental import pallas as pl

    nb, n_chunks, _ = win3.shape
    M = sub * K
    return pl.pallas_call(
        functools.partial(
            _kernel, n_chunks=n_chunks, sub=sub, K=K, mask_mode=mask_mode
        ),
        grid=(nb,),
        out_shape=jax.ShapeDtypeStruct((nb, sub, 128), vals_t.dtype),
        in_specs=[
            pl.BlockSpec((1, n_chunks, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, M, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, M, 128), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, sub, 128), lambda b: (b, 0, 0)),
        interpret=interpret,
    )(win3, vals_t, cols_t)


def sell_matvec_pallas(sell, x, *, interpret: bool = False, mask_mode: str = "where"):
    """y = A·x for a :class:`stormx.sparse.windowed.SlicedELL` via the
    Pallas window-gather kernel.  Same products as ``sell.matvec``; the
    K-reduction tree may differ, so agreement is to f32 roundoff
    (measured ~1e-7 relative on the step operator), not bit-exact.

    Grid-step overhead vs masked-chunk waste is balanced by the window
    size: ``block_rows=512`` is the measured optimum (10.4–10.7 Gnnz/s by
    the settled ≥2000-rep slope protocol; the earlier "9.9" table used
    100/400-rep chains — BENCH_NOTES.md).  A "G independent 128-row blocks per grid step"
    variant was tried twice and both formulations hung the remote Mosaic
    compile (CLAUDE.md lore) — do not resurrect it without a fresh
    toolchain.
    """
    if not supports_pallas(sell):
        raise ValueError(
            "pallas SlicedELL kernel needs block_rows % 128 == 0 and f32 data"
        )
    nb, R, K = sell.data.shape
    sub = R // 128
    C = sell.window
    win = sell._windows(x.astype(sell.data.dtype))  # (nb, C) — XLA data movement
    win3 = win.reshape(nb, C // 128, 128)
    # (nb, R, K) → (nb, sub·K, 128): lane = row within its 128-group,
    # sublane = (s, k).  Transposes are cheap XLA copies of O(nnz) elements.
    vals_t = sell.data.reshape(nb, sub, 128, K).transpose(0, 1, 3, 2)
    vals_t = vals_t.reshape(nb, sub * K, 128)
    cols_t = sell.local_cols.reshape(nb, sub, 128, K).transpose(0, 1, 3, 2)
    cols_t = cols_t.reshape(nb, sub * K, 128)
    y = _apply(
        win3, vals_t, cols_t, sub=sub, K=K, interpret=interpret,
        mask_mode=mask_mode,
    )
    return y.reshape(-1)[: sell.shape[0]]
