"""Pallas TPU kernels for banded (DIA) operators and fused Krylov steps.

Why these exist (measured on v5e, 4.2M-row 5-diagonal Poisson, float32):

* XLA's DIA SpMV runs at ~249 µs.  It is at *its own* structural limit —
  it materializes the padded vector and re-reads one shifted window per
  diagonal (~13n floats of traffic) — but the true minimum is one read of
  each operand (~7n floats ≈ 110 µs).
* A full XLA CG iteration costs ~428 µs vs ~218 µs for the ideal two-pass
  structure (the α data dependency forces exactly two passes over HBM).

The kernels keep one band window of the vector VMEM-resident per row tile
and derive every diagonal from it (one HBM read of x total).

SETTLED (r3, ``scripts/perf_dia_cg_slope.py``): with the chained-slope
protocol (K data-dependent CG iterations inside one jit, K ∈ {50,200,800})
the comparison is clean — XLA's fused CG iteration runs **84 µs**, the
Pallas ``cg_step`` **181 µs**: the hand-tiled kernels LOSE by 2.1×.  The
earlier "~428 µs XLA iteration" figure was relay dispatch-floor inflation,
and XLA's whole-iteration fusion beats this kernel's own two-pass
structure.  These kernels are therefore a REFERENCE IMPLEMENTATION only
(bit-exact-validated, tests/test_pallas.py); no solve path uses them — the
XLA DIA path is the production fast path.

Layout is the key TPU detail: vectors live as (rows, 128) tiles, and a
flat shift by ``s`` decomposes as ``q, r = divmod(s, 128)`` into a sublane
row-slice (free) plus ONE lane rotation of ``r`` (a single VPU shift),
instead of the full-vector unaligned relayout a 1-D slice would cost —
a first 1-D implementation measured 643 µs *slower* than XLA for exactly
that reason.

``dia_spmv``        z = A·x, one HBM read of x total, no gather.
``dia_spmv_dots``   additionally accumulates ⟨p,z⟩ in SMEM across tiles.
``cg_fused_update`` x += α·p, r −= α·z, ⟨r,r⟩ — one fused pass.
``cg_step``         one CG iteration from the two kernels.

All kernels run in interpret mode on CPU (tests) and compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stormx.ops.math import safe_divide

__all__ = ["dia_spmv", "dia_spmv_dots", "cg_fused_update", "cg_step"]

LANE = 128
_TILE_ROWS = 1024  # rows of 128 lanes per grid step (131072 elements)


def _interpret_default() -> bool:
    return jax.default_backend() == "cpu"


def _shifted(win, q, r, tile_rows):
    """Rows [q, q+tile_rows) of the window, lane-shifted left by r:
    result[i, l] = win_flat[(q+i)·128 + l + r].

    The lane shift runs on the MXU, not the VPU: ``a @ Q_r + b @ R_r`` with
    0/1 shift matrices (Q_r picks the wrap-free lanes from row q+i, R_r the
    wrapped lanes from row q+i+1).  A first implementation used
    ``pltpu.roll`` + select — VPU lane rotations on (1024, 128) tiles are
    vreg-shuffle-bound and measured ~2× slower than XLA's whole SpMV; the
    permutation matmul moves that data movement onto the idle MXU.
    0/1 × f32 products are exact, so this is bitwise identical to the roll.
    """
    a = win[q : q + tile_rows, :]
    if r == 0:
        return a
    b = win[q + 1 : q + 1 + tile_rows, :]
    row = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
    q_mat = (row == col + r).astype(a.dtype)
    r_mat = (row == col + (r - LANE)).astype(a.dtype)
    # HIGHEST precision: the default bf16 MXU pass truncates f32 mantissas
    # (measured 3e-2 error); with the multi-pass f32 decomposition a
    # permutation product is exact (1.0·hi + 1.0·lo reassembles x).
    dot = functools.partial(
        jnp.dot,
        preferred_element_type=a.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    return dot(a, q_mat) + dot(b, r_mat)


def _win_rows(tile_rows: int, h_rows: int) -> int:
    """Window rows: tile + halo each side + seam row, padded to a multiple
    of 8 so the DMA and every sublane slice stay tile-aligned."""
    raw = tile_rows + 2 * h_rows + 1
    return -(-raw // 8) * 8


def _spmv_kernel(offsets, h_rows, tile_rows, with_dot,
                 x_hbm, diag_ref, z_ref, dot_ref, win, sem):
    """Double-buffered window pipeline: tile i computes out of slot i%2
    while tile i+1's window DMA streams into the other slot.  The diagonal
    blocks and the output are pipelined automatically by their BlockSpecs;
    only the halo-overlapped x window needs this manual treatment."""
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    w_rows = _win_rows(tile_rows, h_rows)

    def copy_for(tile, slot):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(tile * tile_rows, w_rows), :],
            win.at[slot],
            sem.at[slot],
        )

    @pl.when(i == 0)
    def _():
        dot_ref[0, 0] = jnp.zeros((), dot_ref.dtype)
        copy_for(0, 0).start()

    @pl.when(i + 1 < n_tiles)
    def _():
        copy_for(i + 1, (i + 1) % 2).start()

    copy_for(i, i % 2).wait()
    cur = win[i % 2]
    acc = jnp.zeros((tile_rows, LANE), dtype=z_ref.dtype)
    for d, off in enumerate(offsets):
        q, r = divmod(h_rows * LANE + off, LANE)
        acc += diag_ref[d] * _shifted(cur, q, r, tile_rows)
    z_ref[...] = acc
    if with_dot:
        center = cur[h_rows : h_rows + tile_rows, :]
        dot_ref[0, 0] += jnp.sum(acc * center, dtype=dot_ref.dtype)


def _prepare(dia, x, tile_rows):
    """Trace-side: 2-D tiling of the diagonals and the halo-padded vector."""
    n = dia.shape[0]
    offsets = dia.offsets
    h = max(abs(o) for o in offsets)
    h_rows = -(-h // LANE)
    tile = tile_rows * LANE
    n_pad = -(-n // tile) * tile
    diag = dia.data
    if n_pad != n:
        diag = jnp.pad(diag, ((0, 0), (0, n_pad - n)))
    # diag2d[d, tile i] is block (tile_rows, LANE); x_pad flat index
    # h_rows·LANE + j holds x[j] (one spare row for the lane-rotate seam).
    diag2d = diag.reshape(len(offsets), n_pad // LANE, LANE)
    # Tail padding covers the last tile's full aligned window.
    tail_rows = _win_rows(tile_rows, h_rows) - tile_rows - h_rows
    x_pad = jnp.pad(x, (h_rows * LANE, tail_rows * LANE + (n_pad - n)))
    x2d = x_pad.reshape(-1, LANE)
    return offsets, n, h_rows, n_pad, diag2d, x2d


def _spmv_call(dia, x, with_dot, tile_rows=_TILE_ROWS):
    offsets, n, h_rows, n_pad, diag2d, x2d = _prepare(dia, x, tile_rows)
    num_tiles = n_pad // (tile_rows * LANE)
    kernel = functools.partial(
        _spmv_kernel, offsets, h_rows, tile_rows, with_dot
    )
    acc_dtype = jnp.float32 if x.dtype == jnp.float32 else x.dtype
    z, dot = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x2d stays in HBM
            pl.BlockSpec(
                (len(offsets), tile_rows, LANE),
                lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (tile_rows, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad // LANE, LANE), x.dtype),
            jax.ShapeDtypeStruct((1, 1), acc_dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, _win_rows(tile_rows, h_rows), LANE), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret_default(),
    )(x2d, diag2d)
    return z.reshape(-1)[:n], dot[0, 0]


def dia_spmv(dia, x):
    """Banded SpMV via the Pallas window kernel; drop-in for ``dia.matvec``."""
    z, _ = _spmv_call(dia, x, with_dot=False)
    return z


def dia_spmv_dots(dia, p):
    """(z, ⟨p,z⟩) in one HBM pass over p.

    Padding rows have zero diagonals, so they contribute nothing to either
    output.
    """
    z, dot = _spmv_call(dia, p, with_dot=True)
    return z, dot.astype(p.dtype)


def _update_kernel(alpha_ref, x_ref, r_ref, p_ref, z_ref, xo, ro, rr_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        rr_ref[0, 0] = jnp.zeros((), rr_ref.dtype)

    a = alpha_ref[0, 0]
    xo[...] = x_ref[...] + a * p_ref[...]
    r_new = r_ref[...] - a * z_ref[...]
    ro[...] = r_new
    rr_ref[0, 0] += jnp.sum(r_new * r_new, dtype=rr_ref.dtype)


def cg_fused_update(alpha, x, r, p, z, tile_rows=_TILE_ROWS):
    """x' = x + α·p, r' = r − α·z, ⟨r',r'⟩ — one fused pass."""
    n = x.shape[0]
    tile = tile_rows * LANE
    n_pad = -(-n // tile) * tile
    pad = n_pad - n

    def prep(v):
        return (jnp.pad(v, (0, pad)) if pad else v).reshape(-1, LANE)

    num_tiles = n_pad // tile
    vec_spec = pl.BlockSpec(
        (tile_rows, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    acc_dtype = jnp.float32 if x.dtype == jnp.float32 else x.dtype
    x2, r2, rr = pl.pallas_call(
        _update_kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            vec_spec,
            vec_spec,
            vec_spec,
            vec_spec,
        ],
        out_specs=[vec_spec, vec_spec, pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad // LANE, LANE), x.dtype),
            jax.ShapeDtypeStruct((n_pad // LANE, LANE), x.dtype),
            jax.ShapeDtypeStruct((1, 1), acc_dtype),
        ],
        interpret=_interpret_default(),
    )(
        jnp.asarray(alpha, dtype=x.dtype).reshape(1, 1),
        prep(x),
        prep(r),
        prep(p),
        prep(z),
    )
    return x2.reshape(-1)[:n], r2.reshape(-1)[:n], rr[0, 0].astype(x.dtype)


def cg_step(dia, x, r, p, gamma):
    """One unpreconditioned CG iteration on a banded operator.

    Two HBM passes (the minimum the α dependency allows):
    pass 1 ``dia_spmv_dots`` → (z, ⟨p,z⟩); pass 2 ``cg_fused_update``.
    Returns (x', r', p', γ') with γ = ⟨r,r⟩ carried between iterations.
    """
    z, pz = dia_spmv_dots(dia, p)
    alpha = safe_divide(gamma, pz)
    x, r, rr = cg_fused_update(alpha, x, r, p, z)
    beta = safe_divide(rr, gamma)
    p = r + beta * p
    return x, r, p, rr
