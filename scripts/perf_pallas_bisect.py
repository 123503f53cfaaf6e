"""Bisect the DIA kernel's bandwidth: which stream is slow?

Variants (same grid/tile structure as stormx.ops.pallas_dia):
  diag   — only the auto-pipelined diagonal blocks are read (z = sum of diags)
  win    — only the manual window DMA is read (z = center slice)
  zonly  — write-only (z = broadcast scalar): output stream rate
  full   — the real kernel, for reference

Run: STORMX_BENCH_DEADLINE_S=1100 timeout 1150 python scripts/perf_pallas_bisect.py
"""

import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import functools

import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

LANE = 128
TILE = 1024
ND = 5


def kernel(mode, tile, s_ref, x_hbm, diag_ref, z_ref, win, sem):
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    w_rows = tile + 16

    def copy_for(t, slot):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(t * tile, w_rows), :], win.at[slot], sem.at[slot]
        )

    if mode in ("win", "full"):
        @pl.when(i == 0)
        def _():
            copy_for(0, 0).start()

        @pl.when(i + 1 < n_tiles)
        def _():
            copy_for(i + 1, (i + 1) % 2).start()

        copy_for(i, i % 2).wait()

    # The SMEM scalar (the previous rep's output sample) makes every rep a
    # genuine data dependency so XLA cannot hoist the call out of the loop.
    c = s_ref[0, 0]
    if mode == "diag":
        acc = jnp.full((tile, LANE), c, jnp.float32)
        for d in range(ND):
            acc += diag_ref[d]
        z_ref[...] = acc
    elif mode == "win":
        z_ref[...] = win[i % 2, 8 : 8 + tile, :] * 2.0 + c
    elif mode == "zonly":
        z_ref[...] = jnp.full((tile, LANE), 1.5, jnp.float32) + c
    else:  # full
        acc = jnp.full((tile, LANE), c, jnp.float32)
        for d in range(ND):
            acc += diag_ref[d] * win[i % 2, d : d + tile, :]
        z_ref[...] = acc


def run(mode, n_tiles=32, reps=100, tile=TILE):
    n = n_tiles * tile * LANE
    rng = np.random.default_rng(0)
    diag = jnp.asarray(rng.standard_normal((ND, n)).astype(np.float32))
    diag2d = diag.reshape(ND, -1, LANE)
    x2d = jnp.asarray(
        rng.standard_normal(((n_tiles * TILE + 16) * LANE,))
        .astype(np.float32)
        .reshape(-1, LANE)
    )

    in_specs = [
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((ND, tile, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
    ]
    call = pl.pallas_call(
        functools.partial(kernel, mode, tile),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile, LANE), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tile + 16, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    @jax.jit
    def chain(x2d, diag2d):
        def body(_, c):
            z = call(c.reshape(1, 1) * 1e-30, x2d, diag2d)
            return z[0, 0]

        return lax.fori_loop(0, reps, body, jnp.float32(0.0))

    # The axon relay memoizes identical (program, inputs) executions —
    # the timed run must use different data than the warmup.
    chain(x2d, diag2d).block_until_ready()
    x2d_b = (x2d * 1.000001).block_until_ready()
    t0 = time.perf_counter()
    chain(x2d_b, diag2d).block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    # traffic per call
    mb = {"diag": ND, "win": 1, "zonly": 0, "full": ND + 1}[mode] * n * 4 / 1e6 + n * 4 / 1e6
    print(f"{mode:5s} tiles={n_tiles:3d} tile={tile:5d}: {dt*1e6:7.0f} us  ({mb:.0f} MB → {mb/1e3/dt:.0f} GB/s)", flush=True)



def control(n_tiles=32, reps=100):
    """Known reference: stormx dia_spmv measured ~474 us at this size."""
    from stormx.ops.pallas_dia import dia_spmv
    from stormx.sparse import DIA

    n = n_tiles * TILE * LANE
    rng = np.random.default_rng(0)
    offsets = (-2048, -1, 0, 1, 2048)
    data = np.zeros((ND, n), dtype=np.float32)
    for d, off in enumerate(offsets):
        lo, hi = max(0, -off), min(n, n - off)
        data[d, lo:hi] = rng.standard_normal(hi - lo)
    dia = DIA(data=jnp.asarray(data), offsets=offsets, shape=(n, n))
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    @jax.jit
    def chain(v):
        return lax.fori_loop(0, reps, lambda _, v: dia_spmv(dia, v) * 0.125, v)

    chain(x).block_until_ready()
    x_b = (x * 1.000001).block_until_ready()
    t0 = time.perf_counter()
    chain(x_b).block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    print(f"ctrl : {dt*1e6:7.0f} us  (dia_spmv, expect ~474)", flush=True)


def probe(n_tiles, tile, reps, seed):
    n = n_tiles * tile * LANE
    rng = np.random.default_rng(seed)
    diag2d = jnp.asarray(rng.standard_normal((ND, n)).astype(np.float32)).reshape(ND, -1, LANE)
    x2d = jnp.asarray(rng.standard_normal(((n_tiles * tile + 16) * LANE,)).astype(np.float32).reshape(-1, LANE))
    call = pl.pallas_call(
        functools.partial(kernel, "full", tile),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((ND, tile, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile, LANE), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tile + 16, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    @jax.jit
    def chain(x2d, diag2d, reps_arr):
        def body(_, c):
            z = call(c.reshape(1, 1) * 1e-30, x2d, diag2d)
            return z[0, 0]
        return lax.fori_loop(0, reps_arr, body, jnp.float32(0.0))

    float(np.asarray(chain(x2d, diag2d, reps)))  # warm compile+exec, full fetch
    x2 = jnp.asarray(rng.standard_normal(x2d.shape).astype(np.float32))
    t0 = time.perf_counter()
    out = float(np.asarray(chain(x2, diag2d, reps)))
    dt = time.perf_counter() - t0
    print(f"full tiles={n_tiles} reps={reps}: total {dt*1e3:.1f} ms → {dt/reps*1e6:.0f} us/rep (out={out:.3g})", flush=True)


if __name__ == "__main__":
    probe(32, 1024, 100, seed=11)
    probe(32, 1024, 400, seed=22)
