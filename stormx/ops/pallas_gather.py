"""Pallas TPU banded gather: ``y = x[idx]`` for index maps that are
*locally narrow* — after mesh reordering every FVM gather is (face→cell
state reads, cell←face flux reads, cell-adjacency reads).

XLA serializes random gathers on TPU (~0.15 G elems/s measured).  The
window trick of :mod:`stormx.ops.pallas_sell` applies, but FVM maps are
RECTANGULAR (m outputs from n sources, slope n/m ≠ 1), so uniform-stride
windows blow up (measured: the face_inner map under a K=1 SlicedELL got
C = 40960 — and STILL beat the XLA gather 4.2×, bit-exact).  This module
removes the uniform-stride constraint with **scalar-prefetched per-block
window starts**: block b of R outputs reads x rows
``[start_b, start_b + C/128)`` where ``start_b`` comes from an SMEM array
the BlockSpec index_map consumes — each block's window hugs its own index
range, so C is the largest LOCAL span (measured 51+1 on the step-mesh
face map, C=256 after 128-rounding vs 40960 global).

Rows whose index falls outside their block's C-window (e.g. blocks
straddling a label reset where the sort restarts) go to a host-computed
FIXUP list applied as one small XLA gather+scatter — the narrow-window +
sparse-fixup split of the r2 review.

Bit-exactness: gather is pure selection, so the kernel output equals
``x[idx]`` exactly (asserted in tests) — safe to drop into any FVM op.

Reference analog: the per-face/per-cell adjacency loops of
``Feathers/ConvectionScheme.hpp:155-195`` / ``Playground.cpp:116-131``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["BandedGatherPlan"]


def _kernel(starts_ref, lidx_ref, *refs, n_chunks: int, sub: int):
    """One grid step = R = sub·128 outputs.

    lidx_ref: (1, sub, 128) int32 — index − 128·start_b (lane = output)
    refs:     n_chunks window refs, each (1, 128) — BlockSpec index maps
              count in BLOCKS, so per-128-row window starts need one ref
              per chunk, indexed ``starts[b] + c`` — then out_ref
              (1, sub, 128).
    """
    x_ref, out_ref = refs[:-1], refs[-1]
    del starts_ref  # consumed by the index maps
    lidx = lidx_ref[0]  # (sub, 128)
    lane = jnp.bitwise_and(lidx, 127)
    chunk = jnp.right_shift(lidx, 7)
    acc = None
    for c in range(n_chunks):
        src = jnp.broadcast_to(x_ref[c][0], (lidx.shape[0], 128))
        g = jnp.take_along_axis(src, lane, axis=1, mode="promise_in_bounds")
        term = jnp.where(chunk == c, g, jnp.zeros((), src.dtype))
        acc = term if acc is None else acc + term
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("n_chunks", "sub", "interpret"))
def _apply(starts, lidx, x2, *, n_chunks: int, sub: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb = lidx.shape[0]

    def win_spec(c):
        # x2 is (rows, 1, 128) so the (1, 1, 128) block's trailing dims
        # EQUAL the array dims — exempt from Mosaic's (8, 128) divisibility
        # rule — while the leading block index counts single 128-rows.
        return pl.BlockSpec(
            (1, 1, 128), lambda b, starts, c=c: (starts[b] + c, 0, 0)
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, sub, 128), lambda b, starts: (b, 0, 0))]
        + [win_spec(c) for c in range(n_chunks)],
        out_specs=pl.BlockSpec((1, sub, 128), lambda b, starts: (b, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_kernel, n_chunks=n_chunks, sub=sub),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, sub, 128), x2.dtype),
        interpret=interpret,
    )(starts, lidx, *([x2] * n_chunks))


class BandedGatherPlan:
    """Host-built plan for repeated ``x[idx]`` with a fixed banded ``idx``.

    ``block_rows`` outputs per grid step; ``max_chunks`` caps the per-block
    window (outliers go to the XLA fixup).  ``__call__`` accepts ``(n,)``
    or ``(n, nv)`` arrays (components looped) and is bit-exact vs
    ``x[idx]``.
    """

    MAX_CHUNKS = 64  # beyond this the per-chunk window refs blow up the
    # trace/compile (each chunk is its own BlockSpec input — a C=40960
    # fallback would mean 320 refs); wider-than-budget maps run as a plain
    # XLA gather instead (round-3 advisor finding).

    def __init__(self, idx, n_src: int, *, block_rows: int = 512,
                 fixup_frac: float = 0.01):
        idx = np.asarray(idx, dtype=np.int64)
        if idx.ndim != 1:
            raise ValueError("idx must be 1-D (flatten ELL tables first)")
        if idx.size and (idx.min() < 0 or idx.max() >= n_src):
            raise ValueError("idx out of range")
        R = block_rows
        if R % 128:
            raise ValueError("block_rows must be a multiple of 128")
        m = idx.size
        self.m, self.n_src, self.R = m, n_src, R
        nb = max(-(-m // R), 1)
        mp = nb * R
        # Pad with the last real index so padding cannot widen the last
        # block's window.
        fill = idx[-1] if m else 0
        pad_idx = np.full(mp, fill, dtype=np.int64)
        pad_idx[:m] = idx
        blocks = pad_idx.reshape(nb, R)
        real = np.zeros(mp, dtype=bool)
        real[:m] = True
        real = real.reshape(nb, R)
        # Median-centered per-block windows (robust to outliers below AND
        # above the local band); C = smallest multiple of 128 whose
        # out-of-window count fits the fixup budget.
        center = np.median(blocks, axis=1).astype(np.int64)
        c_max = (
            int(max(blocks.max() - blocks.min(), 0)) // 128 + 3
        ) * 128
        C = c_max
        for c in range(128, c_max + 1, 128):
            start128 = np.maximum(center - c // 2, 0) // 128 * 128
            local = blocks - start128[:, None]
            n_out = int((((local < 0) | (local >= c)) & real).sum())
            if n_out <= fixup_frac * max(m, 1):
                C = c
                break
        # Chunk-count cap: a map too wide for the budget degrades to the
        # plain XLA gather (self.xla_fallback) instead of building a
        # pathological kernel with C/128 window refs.
        self.xla_fallback = C // 128 > self.MAX_CHUNKS
        self.full_idx = None
        if self.xla_fallback:
            # Fallback plans never touch the kernel metadata — skip the
            # whole window/fixup build (O(m) host time + memory).
            self.full_idx = jnp.asarray(idx.astype(np.int32))
            self.window = 0
            self.src_rows = 0
            self.sub = R // 128
            self.n_chunks = 0
            zi = jnp.zeros((0,), jnp.int32)
            self.fix_pos = zi
            self.fix_idx = zi
            self.lidx = jnp.zeros((0, self.sub, 128), jnp.int32)
            self.starts = zi
            return
        start128 = np.maximum(center - C // 2, 0) // 128 * 128
        # Clamp so start + C stays inside the padded source.
        src_rows = -(-n_src // 128) + C // 128
        self.src_rows = src_rows
        start128 = np.minimum(start128, (src_rows - C // 128) * 128)
        local = blocks - start128[:, None]
        out = (local < 0) | (local >= C)
        self.window = C
        fix_pos = np.nonzero((out & real).reshape(-1)[:m])[0]
        self.fix_pos = jnp.asarray(fix_pos.astype(np.int32))
        self.fix_idx = jnp.asarray(idx[fix_pos].astype(np.int32))
        local = np.where(out, C, local)  # chunk id C//128 never matches → 0
        sub = R // 128
        self.sub = sub
        self.lidx = jnp.asarray(local.reshape(nb, sub, 128).astype(np.int32))
        self.n_chunks = C // 128
        self.starts = jnp.asarray((start128 // 128).astype(np.int32))

    def __call__(self, x, *, interpret: bool | None = None):
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        x = jnp.asarray(x)
        if self.xla_fallback:
            return x[self.full_idx]
        if x.ndim == 2:
            cols = [self(x[:, j], interpret=interpret) for j in range(x.shape[1])]
            return jnp.stack(cols, axis=1)
        pad = self.src_rows * 128 - x.shape[0]
        x2 = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)]).reshape(-1, 1, 128)
        y = _apply(
            self.starts, self.lidx, x2,
            n_chunks=self.n_chunks, sub=self.sub, interpret=interpret,
        ).reshape(-1)[: self.m]
        if self.fix_pos.size:
            y = y.at[self.fix_pos].set(x[self.fix_idx])
        return y


def _register_plan():
    """Pytree registration so plans ride inside DeviceMesh / jit closures."""
    data = ("starts", "lidx", "fix_pos", "fix_idx", "full_idx")
    meta = ("m", "n_src", "R", "window", "sub", "n_chunks", "src_rows",
            "xla_fallback")

    def flatten(p):
        return (
            tuple(getattr(p, f) for f in data),
            tuple(getattr(p, f) for f in meta),
        )

    def unflatten(meta_vals, data_vals):
        p = object.__new__(BandedGatherPlan)
        for f, v in zip(data, data_vals):
            object.__setattr__(p, f, v)
        for f, v in zip(meta, meta_vals):
            object.__setattr__(p, f, v)
        return p

    jax.tree_util.register_pytree_node(BandedGatherPlan, flatten, unflatten)


_register_plan()
