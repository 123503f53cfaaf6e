"""Headline benchmark: SpMV throughput (nnz/s) on one chip.

The hot kernel of every Krylov iteration and every FVM operator application
is the sparse operator application (SURVEY §3.1/§3.5).  The TPU-native fast
path is banded/diagonal SpMV (``stormx.sparse.DIA``): after RCM reordering
(``stormx.parallel.rcm_order``) mesh operators are banded, and each stored
diagonal is one statically-shifted elementwise FMA — no gather, pure HBM
streaming.  The benchmark operator is the 5-point Laplacian, the same
stencil family as the reference's only benchmark
(``tests/benchmark/BitternLaplace2D.cpp``).

``vs_baseline`` is speedup over the identical diagonal SpMV in vectorized
NumPy on this host — the stand-in for the reference's compiled C++
expression templates, which publish no absolute numbers (BASELINE.md); the
reference's own harness benches against NumPy
(``tests/benchmark/CMakeLists.txt:47-93``).

Timing protocol: ``reps`` chained applications inside ONE jit (a
``lax.fori_loop`` whose carry is the vector), so per-call dispatch latency
— milliseconds over the remote-TPU relay — is amortized out and XLA cannot
dead-code any iteration.  A 1/8 rescale per step keeps the iterates
bounded in float32; it fuses into the same kernel.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import threading
import time

import numpy as np

# Watchdog: device attach / remote compile can hang indefinitely when the
# TPU relay is wedged (observed after Mosaic kernel faults).  Exit with an
# error rather than hanging the driver.
_DEADLINE_S = int(os.environ.get("STORMX_BENCH_DEADLINE_S", "480"))


def _watchdog():
    time.sleep(_DEADLINE_S)
    print(
        f"bench.py: exceeded {_DEADLINE_S}s (TPU attach/compile hang?); aborting",
        file=sys.stderr,
        flush=True,
    )
    os._exit(2)


def _start_watchdog():
    # Started from main() only — importing this module (e.g. for
    # poisson5_diags) must not arm a process killer.
    threading.Thread(target=_watchdog, daemon=True).start()

NX = 2048  # 4.19M rows, 20.9M nnz — HBM-bandwidth-bound on one chip
REPS = 200


def poisson5_diags(nx: int, dtype=np.float32):
    """5-point Laplacian on an nx×nx grid in DIA layout (vectorized build).

    Returns (offsets, data) with data[d, i] = A[i, i + offsets[d]].
    """
    n = nx * nx
    i = np.arange(n) // nx
    j = np.arange(n) % nx
    offsets = (-nx, -1, 0, 1, nx)
    data = np.zeros((5, n), dtype=dtype)
    data[0] = np.where(i > 0, -1.0, 0.0)  # west  neighbor (i-1, j)
    data[1] = np.where(j > 0, -1.0, 0.0)  # south neighbor (i, j-1)
    data[2] = 4.0
    data[3] = np.where(j < nx - 1, -1.0, 0.0)  # north (i, j+1)
    data[4] = np.where(i < nx - 1, -1.0, 0.0)  # east  (i+1, j)
    return offsets, data


def numpy_dia_spmv(offsets, data, x):
    """The identical diagonal SpMV in vectorized NumPy (the baseline)."""
    n = data.shape[1]
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    x_pad = np.concatenate([np.zeros(lo, x.dtype), x, np.zeros(hi, x.dtype)])
    y = np.zeros(n, dtype=x.dtype)
    for d, off in enumerate(offsets):
        y += data[d] * x_pad[lo + off : lo + off + n]
    return y


def main():
    import os

    _start_watchdog()

    import jax

    # Persistent compile cache: the remote-compile relay is slow (~1 min) and
    # occasionally hangs, so reuse compiled programs across processes.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from jax import lax

    from stormx.sparse import DIA

    offsets, diag_np = poisson5_diags(NX)
    n = NX * NX
    nnz = int(np.count_nonzero(diag_np))

    rng = np.random.default_rng(0)
    x_np = rng.standard_normal(n).astype(np.float32)

    # --- NumPy baseline: the identical chained loop, vectorized, host CPU.
    # Doubles as the correctness oracle for the whole timed computation.
    numpy_dia_spmv(offsets, diag_np, x_np)  # warm-up
    t0 = time.perf_counter()
    v_np = x_np
    for _ in range(REPS):
        v_np = numpy_dia_spmv(offsets, diag_np, v_np) * np.float32(0.125)
    base_dt = (time.perf_counter() - t0) / REPS

    # --- TPU: DIA SpMV, REPS chained applications inside one jit. ---
    dia = DIA(data=jnp.asarray(diag_np), offsets=offsets, shape=(n, n))
    x = jnp.asarray(x_np)

    @jax.jit
    def chain(v):
        return lax.fori_loop(0, REPS, lambda _, v: dia.matvec(v) * 0.125, v)

    y = chain(x)
    y.block_until_ready()  # compile + warm-up
    # Correctness gate (entire timed chain vs the NumPy oracle) before timing.
    err = float(jnp.max(jnp.abs(y - jnp.asarray(v_np))))
    assert err < 1e-2, f"chained SpMV mismatch vs NumPy: {err}"

    t0 = time.perf_counter()
    chain(x).block_until_ready()
    dt = (time.perf_counter() - t0) / REPS

    nnz_per_s = nnz / dt
    baseline_nnz_per_s = nnz / base_dt
    print(
        json.dumps(
            {
                "metric": "spmv_nnz_per_s",
                "value": nnz_per_s,
                "unit": "nnz/s",
                "vs_baseline": nnz_per_s / baseline_nnz_per_s,
            }
        )
    )


if __name__ == "__main__":
    main()
