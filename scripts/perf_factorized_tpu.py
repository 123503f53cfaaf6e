"""Factorized-preconditioner wall-clock on the real chip (VERDICT r4 item 3).

Time-to-tolerance for the level-scheduled vs fixed-sweep triangular applies
(``stormx/precond/triangular.py``) behind CG+IC(0) and BiCGStab+ILU(0), vs
the CG+Jacobi baseline, on the 5-diagonal Poisson operator (isotropic and
anisotropic) — the family the reference only *plans*
(``README.md:71-82``).  The level-scheduled apply is one padded
gather+scatter PER LEVEL — exactly the shape XLA executes worst on TPU —
so the honest expectation is a large wall-clock loss there, with the
``sweeps`` (truncated-Neumann) mode the only candidate for a win.

Protocol as perf_amg_tpu.py: each solve is one dispatch (while_loop inside
jit), fresh RHS per timed run, non-convergence reported not asserted.

Usage: timeout 560 python scripts/perf_factorized_tpu.py [nx] [eps] [filter]
(one config per invocation keeps each remote-compile batch in budget)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

def poisson_host(nx, eps=1.0, dtype=np.float32):
    """Host replica of perf_amg_tpu.poisson_dia: -uxx - eps*uyy, 5-point.

    Kept NumPy end-to-end — the device DIA is materialized ONCE at the end
    of main(); building host structures from device-resident jnp arrays
    costs minutes of relay-tunnel round trips at n~1M (CLAUDE.md r5).
    """
    n = nx * nx
    offs = (-nx, -1, 0, 1, nx)
    data = np.zeros((5, n), dtype)
    i = np.arange(n)
    data[2] = 2.0 + 2.0 * eps
    for k, off in enumerate(offs):
        if off == 0:
            continue
        j = i + off
        valid = (j >= 0) & (j < n)
        if abs(off) == 1:
            valid &= (i // nx) == (j // nx)
        data[k][valid] = -1.0 if abs(off) == 1 else -eps
    return data, offs


def dia_to_csr(data, offsets, n):
    """Host DIA arrays → host CSR with explicit diagonal slots
    (factorization input; factorizations run on host anyway)."""
    from stormx.sparse.formats import CSR

    i = np.arange(n)
    rows, cols, vals = [], [], []
    for d, off in enumerate(offsets):
        j = i + off
        valid = (j >= 0) & (j < n)
        keep = valid & ((data[d] != 0) | (off == 0))
        rows.append(i[keep])
        cols.append(j[keep])
        vals.append(data[d][keep])
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    vals = np.concatenate(vals)
    order = np.lexsort((cols, rows))
    rp = np.zeros(n + 1, np.int64)
    np.add.at(rp, rows + 1, 1)
    return CSR(
        data=vals[order],
        indices=cols[order].astype(np.int32),
        row_ptr=np.cumsum(rp).astype(np.int32),
        shape=(n, n),
    )


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    import jax.numpy as jnp

    from stormx.precond import (
        IcPreconditioner,
        IluPreconditioner,
        JacobiPreconditioner,
        SgsPreconditioner,
    )
    from stormx.solvers import SOLVERS, SolverOptions, make_operator

    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    eps = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    flt = sys.argv[3] if len(sys.argv) > 3 else ""
    from stormx.sparse import DIA

    data_np, offs = poisson_host(nx, eps=eps)
    n = nx * nx
    csr = dia_to_csr(data_np, offs, n)
    dia = DIA(data=jnp.asarray(data_np), offsets=offs, shape=(n, n))
    print(f"built n={n} (host) + device DIA", flush=True)
    rng = np.random.default_rng(0)
    opts = SolverOptions(
        num_iterations=20000, absolute_tolerance=0.0, relative_tolerance=1e-5
    )
    d0 = jnp.asarray(data_np[2])

    # (name, solver, preconditioner factory)
    configs = {
        "cg+jacobi": ("cg", lambda: JacobiPreconditioner(diag=d0)),
        "cg+ic0-level": ("cg", lambda: IcPreconditioner(csr)),
        "cg+ic0-sweeps3": ("cg", lambda: IcPreconditioner(csr, sweeps=3)),
        "cg+sgs-sweeps3": ("cg", lambda: SgsPreconditioner(csr, sweeps=3)),
        "bicgstab+ilu0-level": ("bicgstab", lambda: IluPreconditioner(csr)),
        "bicgstab+ilu0-sweeps3": (
            "bicgstab",
            lambda: IluPreconditioner(csr, sweeps=3),
        ),
    }
    configs = {k: v for k, v in configs.items() if flt in k}

    op = make_operator(dia.matvec)
    for name, (method, mk) in configs.items():
        t0 = time.time()
        pre = mk()
        setup_s = time.time() - t0
        solver_fn = SOLVERS[method]
        solve = jax.jit(
            lambda b, pre=pre, fn=solver_fn: fn(
                op, b, jnp.zeros(n, jnp.float32), precond=pre, options=opts
            )
        )
        bw = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        t0 = time.time()
        rw = solve(bw)
        rw.x.block_until_ready()  # compile + warm
        print(f"{name}: setup {setup_s:.2f}s, compile+first {time.time()-t0:.1f}s",
              flush=True)
        best, iters, conv = np.inf, int(rw.num_iterations), True
        for _ in range(3):
            bt = jnp.asarray(rng.standard_normal(n).astype(np.float32))
            bt.block_until_ready()
            t0 = time.perf_counter()
            rt = solve(bt)
            rt.x.block_until_ready()
            best = min(best, time.perf_counter() - t0)
            iters = int(rt.num_iterations)
            conv = bool(rt.converged)
        tag = "" if conv else "  ** DID NOT CONVERGE **"
        print(
            f"eps={eps:g} {name:22s} {best * 1e3:9.1f} ms/solve  "
            f"{iters:6d} iters{tag}",
            flush=True,
        )


if __name__ == "__main__":
    main()
