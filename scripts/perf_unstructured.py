"""Measure unstructured SpMV strategies on the real TPU chip (step mesh).

Variants (all on the RCM-reordered reference step operator, f32):
  * ell      — plain ELL gather ``x[cols]`` (the known-slow oracle)
  * onehot8/128  — SlicedELL fused iota-compare gather (VPU), R=8/128
  * dense8/128   — SlicedELL windowed block-dense (MXU), R=8/128

Timing: reps chained inside ONE jit whose rep count is a TRACED bound
(`lax.fori_loop` with dynamic trip count → one compile per variant), so the
marginal per-rep cost can be estimated from two rep counts — the relay's
dispatch-latency floor and memoization (CLAUDE.md) make single-call timings
unreliable.  Inputs differ between warmup and every timed call.

Usage: timeout 560 python scripts/perf_unstructured.py
"""

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DEADLINE_S = int(os.environ.get("STORMX_BENCH_DEADLINE_S", "540"))


def _watchdog():
    time.sleep(_DEADLINE_S)
    print("perf_unstructured: deadline exceeded; aborting", file=sys.stderr, flush=True)
    os._exit(2)


threading.Thread(target=_watchdog, daemon=True).start()


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from jax import lax

    from stormx.fvm.divgrad import assemble_laplacian
    from stormx.mesh import read_tetgen
    from stormx.sparse import ell_from_csr
    from stormx.sparse.windowed import sell_from_csr

    mesh = read_tetgen("/root/reference/tests/_data/mesh/step.1.")
    L = assemble_laplacian(mesh)
    csr32 = L.to_csr()
    n = mesh.num_cells
    data32 = np.asarray(csr32.data, dtype=np.float32)
    from stormx.sparse.formats import CSR

    csr32 = CSR(
        data=jnp.asarray(data32),
        indices=csr32.indices,
        row_ptr=csr32.row_ptr,
        shape=csr32.shape,
    )
    nnz = int(np.count_nonzero(data32))
    print(f"# n={n} nnz={nnz}", file=sys.stderr)

    variants = {}
    sell0, perm = sell_from_csr(csr32, block_rows=8, mode="onehot")
    variants["onehot8"] = sell0.matvec
    sell1, _ = sell_from_csr(csr32, block_rows=128, mode="onehot")
    variants["onehot128"] = sell1.matvec
    sell2, _ = sell_from_csr(csr32, block_rows=8, mode="dense")
    variants["dense8"] = sell2.matvec
    sell3, _ = sell_from_csr(csr32, block_rows=128, mode="dense")
    variants["dense128"] = sell3.matvec
    # The Pallas window-gather kernel (r3 fast path; BENCH_NOTES.md): R=512
    # is the measured optimum.
    sell4, _ = sell_from_csr(csr32, block_rows=512, mode="pallas")
    variants["pallas512"] = sell4.matvec
    # ELL gather on the SAME RCM-permuted operator for a fair comparison.
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n)

    def permuted_csr():
        rows = np.repeat(np.arange(n), np.diff(np.asarray(csr32.row_ptr)))
        cols = np.asarray(csr32.indices)
        nr, nc = inv[rows], inv[cols]
        order = np.lexsort((nc, nr))
        rp = np.zeros(n + 1, np.int32)
        np.add.at(rp, nr + 1, 1)
        return CSR(
            data=jnp.asarray(data32[order]),
            indices=jnp.asarray(nc[order].astype(np.int32)),
            row_ptr=jnp.asarray(np.cumsum(rp).astype(np.int32)),
            shape=(n, n),
        )

    ell = ell_from_csr(permuted_csr())
    variants["ell"] = ell.matvec

    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.standard_normal(n).astype(np.float32)) for _ in range(4)]

    results = {}
    for name, mv in variants.items():
        @jax.jit
        def chain(v, reps, mv=mv):
            return lax.fori_loop(0, reps, lambda _, v: mv(v) * 0.125, v)

        # Oracle check + compile/warmup.
        y = mv(xs[0])
        y_ref = ell.matvec(xs[0]) if name != "ell" else y
        err = float(jnp.max(jnp.abs(y - y_ref)))
        assert err < 1e-3, (name, err)
        chain(xs[0], 8).block_until_ready()
        lo, hi = (64, 256) if name == "ell" else (256, 1024)
        t0 = time.perf_counter()
        chain(xs[1], lo).block_until_ready()
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        chain(xs[2], hi).block_until_ready()
        t_hi = time.perf_counter() - t0
        per_rep = (t_hi - t_lo) / (hi - lo)
        results[name] = per_rep
        print(
            json.dumps(
                {
                    "metric": f"unstructured_spmv_{name}",
                    "value": nnz / per_rep,
                    "unit": "nnz/s",
                    "per_rep_us": per_rep * 1e6,
                    "t_lo_s": t_lo,
                    "t_hi_s": t_hi,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
