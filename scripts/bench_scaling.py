"""Partition-scaling benchmark on the virtual CPU device mesh.

Measures the structure of the distributed path — partition-invariant
convergence and per-partition-count iteration timing for the whole
shard_map'd CG solve — on N virtual CPU devices.  Absolute numbers on CPU
are NOT the TPU story (ICI collectives vs shared memory); the artifact that
matters here is (a) identical histories at every P, and (b) the per-P
wall-clock table as a smoke-level scaling check.  Run on a real pod this
same script reports SpMV scaling efficiency (BASELINE.md: ≥80% at N≥2).

Usage: python scripts/bench_scaling.py [n=65536]
"""

import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

# Decide the platform WITHOUT querying backends (jax.default_backend() would
# initialize the TPU plugin, which hangs when the remote chip is wedged).
# Opt into real-TPU mode explicitly with STORMX_BENCH_TPU=1.
if os.environ.get("STORMX_BENCH_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
# fp64: the partition-invariance oracle is an fp64 statement (fp32 CG at
# cond≈10³ wobbles by 1e-4 regardless of partitioning).
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stormx.parallel import make_device_mesh, partition_csr, sharded_solve  # noqa: E402
from stormx.solvers import SolverOptions  # noqa: E402
from stormx.sparse import CSR  # noqa: E402


def poisson_csr(nx: int) -> CSR:
    n = nx * nx
    idx = np.arange(n)
    i, j = idx // nx, idx % nx
    rows, cols, vals = [idx], [idx], [np.full(n, 4.0)]
    for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        ii, jj = i + di, j + dj
        m = (ii >= 0) & (ii < nx) & (jj >= 0) & (jj < nx)
        rows.append(idx[m])
        cols.append((ii * nx + jj)[m])
        vals.append(np.full(int(m.sum()), -1.0))
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    vals = np.concatenate(vals)
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    rp = np.zeros(n + 1, dtype=np.int64)
    np.add.at(rp, rows + 1, 1)
    return CSR(
        data=jnp.asarray(vals),
        indices=jnp.asarray(cols.astype(np.int32)),
        row_ptr=jnp.asarray(np.cumsum(rp).astype(np.int32)),
        shape=(n, n),
    )


def main():
    n_side = int(np.sqrt(int(sys.argv[1]))) if len(sys.argv) > 1 else 128
    csr = poisson_csr(n_side)
    n = csr.shape[0]
    b = np.ones(n)
    opts = SolverOptions(num_iterations=2000)
    max_p = min(8, jax.device_count())

    results = {}
    base_dt = None
    for p in [1, 2, 4, max_p]:
        pop = partition_csr(csr, p, method="bfs")
        mesh = make_device_mesh(p)
        # Warm-up (compile) then timed run.
        res = sharded_solve(pop, b, mesh=mesh, method="cg", options=opts)
        t0 = time.perf_counter()
        res = sharded_solve(pop, b, mesh=mesh, method="cg", options=opts)
        dt = time.perf_counter() - t0
        assert bool(res.converged), f"P={p} did not converge"
        h = np.asarray(res.history)
        results[p] = (dt, int(res.num_iterations), h[np.isfinite(h) & (h > 0)],
                      np.asarray(res.x))
        if base_dt is None:
            base_dt = dt
        print(
            f"P={p}: {dt*1e3:8.1f} ms  iters={int(res.num_iterations)}  "
            f"rel-time={dt/base_dt:5.2f}  converged={bool(res.converged)}",
            flush=True,
        )

    # Partition-invariance oracle.  The partitioned MATVEC is bit-exact at
    # every P (verified separately in tests/test_parallel.py); the dot
    # products, however, sum in a P-dependent tree, and CG amplifies those
    # last-bit differences with the condition number — at cond≈(n_side/π)²
    # histories visibly drift after tens of iterations, exactly as two
    # different serial summation orders would.  What is guaranteed (and
    # checked): early-history agreement and converged-solution agreement to
    # solver tolerance.
    ps = sorted(results)
    h0, x0 = results[ps[0]][2], results[ps[0]][3]
    for p in ps[1:]:
        hp, xp = results[p][2], results[p][3]
        m = min(len(h0), len(hp), 20)
        drift = float(np.max(np.abs(h0[:m] - hp[:m]) / h0[:m]))
        xdiff = float(np.max(np.abs(x0 - xp)) / np.max(np.abs(x0)))
        print(f"P={ps[0]} vs P={p}: early-history drift {drift:.2e}, solution diff {xdiff:.2e}")
        assert drift < 1e-9, "partition-variant early convergence history!"
        assert xdiff < 1e-5, "partition-variant solution!"

    # The per-P efficiency table (BASELINE.md ≥80% target applies to REAL
    # multi-chip runs; on the virtual CPU mesh all P share one host's cores,
    # so strong-scaling efficiency here is a structural smoke number only —
    # the honest artifact is the JSON record the next bench round compares).
    import json

    base_dt = results[ps[0]][0]
    table = {
        str(p): {
            "wall_s": results[p][0],
            "iterations": results[p][1],
            "speedup_vs_p1": base_dt / results[p][0],
        }
        for p in ps
    }
    print(json.dumps({
        "metric": "cg_strong_scaling_cpu_mesh",
        "rows": n,
        "per_p": table,
        "note": "virtual CPU mesh shares one host; >=80% target is for real chips",
    }), flush=True)
    print("scaling structure OK")


if __name__ == "__main__":
    main()
