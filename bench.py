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

Timing protocol — two defenses, both mandated by measurement (CLAUDE.md):

* **Slope protocol** against the relay's dispatch-latency floor (hundreds
  of ms, varying): chained applications run inside ONE jit
  (``lax.fori_loop``), at TWO chain lengths; the per-application time is
  the SLOPE (T_hi − T_lo)/(REPS_HI − REPS_LO), which cancels the fixed
  per-dispatch overhead that a single chain timing cannot distinguish
  from kernel time.
* **Memoization defense**: the relay returns cached results for a repeated
  (program, input) pair, so every TIMED run uses an input the device has
  never seen — ``s·x0`` for a fresh power-of-two ``s`` per run.  The chain
  is linear and power-of-two scaling is exact in float32, so the expected
  output is bit-predictable (``s·chain(x0)``) and every timed result is
  verified against it.  The NumPy oracle checks the warm-up chains.

A 1/8 rescale per step keeps iterates bounded in float32; it fuses into
the same kernel.  Reported value = best (min) slope over the distinct
scaled inputs.
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
# Slope baseline: Δ = 20k applications ≈ 0.6-3 s of kernel time — an order
# of magnitude above the relay's noise amplitude (measured: Δ=800 gave
# NON-POSITIVE slopes — wall time there is pure dispatch + result-transfer,
# independent of rep count; Δ=8000 gave slopes spread 20-34 µs from T_lo
# noise ~±0.1 s).
REPS_LO = 500
REPS_HI = 20500


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

    # On-chip Pallas gate (VERDICT r3 item 8): a Mosaic/toolchain regression
    # in the production kernels fails HERE in seconds, not mid-bench.
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from verify_tpu import verify_pallas_on_chip

    verify_pallas_on_chip()
    print("pallas on-chip gate: OK", file=sys.stderr, flush=True)

    offsets, diag_np = poisson5_diags(NX)
    n = NX * NX
    nnz = int(np.count_nonzero(diag_np))

    rng = np.random.default_rng(0)
    x_np = rng.standard_normal(n).astype(np.float32)

    # --- NumPy baseline: the identical chained loop, vectorized, host CPU.
    # Doubles as the correctness oracle for the REPS_LO chain.
    numpy_dia_spmv(offsets, diag_np, x_np)  # warm-up
    t0 = time.perf_counter()
    v_lo_np = x_np
    for _ in range(REPS_LO):
        v_lo_np = numpy_dia_spmv(offsets, diag_np, v_lo_np) * np.float32(0.125)
    base_dt = (time.perf_counter() - t0) / REPS_LO

    # --- TPU: DIA SpMV chains at two lengths inside one jit each. ---
    dia = DIA(data=jnp.asarray(diag_np), offsets=offsets, shape=(n, n))
    x = jnp.asarray(x_np)

    def make_chain(reps):
        @jax.jit
        def chain(v):
            return lax.fori_loop(0, reps, lambda _, v: dia.matvec(v) * 0.125, v)

        return chain

    chain_lo, chain_hi = make_chain(REPS_LO), make_chain(REPS_HI)

    # Compile + warm-up; gate the LO chain against the NumPy oracle.
    y_lo = chain_lo(x)
    y_hi = chain_hi(x)
    y_lo.block_until_ready(), y_hi.block_until_ready()
    err = float(jnp.max(jnp.abs(y_lo - jnp.asarray(v_lo_np))))
    assert err < 1e-2, f"chained SpMV mismatch vs NumPy: {err}"
    # Gate the HI chain by on-device composition: REPS_HI/REPS_LO repeats of
    # the NumPy-verified LO program apply the identical op sequence, so the
    # result is bit-identical — and a DIFFERENT program per step, so the
    # relay's memoization cannot fake the agreement.
    assert REPS_HI % REPS_LO == 0
    y_comp = x
    for _ in range(REPS_HI // REPS_LO):
        y_comp = chain_lo(y_comp)
    comp_err = float(jnp.max(jnp.abs(y_hi - y_comp)))
    assert comp_err == 0.0, f"hi chain != composed lo chains: {comp_err}"

    # Timed runs: fresh inputs per run (memoization defense) at both chain
    # lengths; per-application time = slope between the lengths (dispatch-
    # floor defense).  Power-of-two scaling ⇒ exact expected outputs.
    ref = {REPS_LO: np.asarray(y_lo), REPS_HI: np.asarray(y_hi)}
    chains = {REPS_LO: chain_lo, REPS_HI: chain_hi}
    debug = os.environ.get("STORMX_BENCH_DEBUG")
    slopes = []
    for s in (2.0, 4.0, 8.0):
        xs = jnp.asarray(x_np * np.float32(s))  # fresh input bytes
        # Force the host→device transfer BEFORE timing: the tunnel moves
        # ~28 MB/s, so an unforced 16.8 MB transfer lands entirely in the
        # first timed call and corrupts the slope by ~30 µs/apply
        # (measured; it made a pure v·c chain time NEGATIVE slopes).
        xs.block_until_ready()
        wall = {}
        for reps in (REPS_LO, REPS_HI):
            t0 = time.perf_counter()
            ys = chains[reps](xs)
            ys.block_until_ready()
            wall[reps] = time.perf_counter() - t0
            err = float(np.max(np.abs(np.asarray(ys) - s * ref[reps])))
            assert err <= 1e-4 * s * float(np.max(np.abs(ref[reps])) + 1.0), (
                f"timed chain(s·x) != s·chain(x) at reps={reps}: {err}"
            )
        slope = (wall[REPS_HI] - wall[REPS_LO]) / (REPS_HI - REPS_LO)
        slopes.append(slope)
        if debug:
            print(
                f"s={s}: T_lo={wall[REPS_LO]:.3f}s T_hi={wall[REPS_HI]:.3f}s "
                f"slope={slope * 1e6:.1f} µs/apply",
                file=sys.stderr,
                flush=True,
            )
    # Median across scales: the relay's dispatch noise is heavy-tailed in
    # BOTH directions (a slow T_lo makes a fake small/negative slope, a slow
    # T_hi a fake large one) — min() would report the most optimistic
    # artifact as throughput.
    dt = float(np.median(slopes))
    assert dt > 0, f"median slope non-positive ({slopes}); relay noise"

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
