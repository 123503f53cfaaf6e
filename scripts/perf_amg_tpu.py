"""AMG wall-clock on the real chip (VERDICT r3 item 5).

Time-to-tolerance of CG+Jacobi vs CG+BlockDiaAmg (the gather-free block-
aggregation V-cycle) on the 5-diagonal Poisson operator, f32, in TWO
regimes:

* isotropic — the headline operator.  Expected: AMG wins iterations but
  LOSES wall-clock (the V-cycle costs ~6-20 plain iterations and Jacobi-CG
  converges fine) — recorded as the honest loss.
* anisotropic (-uxx - eps*uyy, strong x-coupling) — Jacobi-CG iteration
  counts blow up ~1/sqrt(eps) while the block aggregation coarsens along
  x, exactly the strong direction (semicoarsening): AMG wins wall-clock.

Each solve is ONE dispatch (lax.while_loop inside jit); fresh RHS per
timed run defeats relay memoization; solves run ~0.1-1 s, large against
the dispatch floor.  Non-convergence at the iteration cap is REPORTED,
not asserted — "Jacobi did not converge in 20k iters" is itself the
anisotropic result.

Usage: timeout 560 python scripts/perf_amg_tpu.py [nx] [eps] [config-filter]
(one config per invocation keeps each remote-compile batch under the
timeout; the persistent .jax_cache makes reruns warm)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def poisson_dia(nx, dtype=np.float32, eps=1.0):
    """5-point -uxx - eps*uyy on an nx*nx grid, row-major (x fastest):
    x-neighbors couple with -1, y-neighbors with -eps."""
    import jax.numpy as jnp

    from stormx.sparse.formats import DIA

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
    return DIA(data=jnp.asarray(data), offsets=offs, shape=(n, n))


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

    from stormx.precond import BlockDiaAmg, JacobiPreconditioner
    from stormx.solvers import SolverOptions, cg, make_operator

    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    eps = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    flt = sys.argv[3] if len(sys.argv) > 3 else ""
    dia = poisson_dia(nx, eps=eps)
    n = nx * nx
    rng = np.random.default_rng(0)
    opts = SolverOptions(
        num_iterations=20000, absolute_tolerance=0.0, relative_tolerance=1e-5
    )
    d0 = jnp.asarray(np.asarray(dia.data)[2])

    configs = {
        "jacobi": JacobiPreconditioner(diag=d0),
        "blockamg-g2-s2": None,  # built lazily (host setup timed)
        "blockamg-g4-s1": None,
        # g=8 → 5 levels at 4.2M rows: the smallest compiled program
        # (remote compile time scales with the unrolled V-cycle depth).
        "blockamg-g8-s1": None,
    }
    configs = {k: v for k, v in configs.items() if flt in k}
    for name in list(configs):
        if name.startswith("blockamg"):
            _, g, s = name.split("-")
            t0 = time.time()
            configs[name] = BlockDiaAmg(
                dia, group=int(g[1:]), num_sweeps=int(s[1:])
            )
            print(f"{name}: setup {time.time() - t0:.2f} s "
                  f"({len(configs[name]._levels)} levels)", flush=True)

    op = make_operator(dia.matvec)
    for name, pre in configs.items():
        solve = jax.jit(
            lambda b, pre=pre: cg(op, b, jnp.zeros(n, jnp.float32),
                                  precond=pre, options=opts)
        )
        bw = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        rw = solve(bw)
        rw.x.block_until_ready()  # compile + warm
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
        print(f"eps={eps:g} {name:16s} {best * 1e3:9.1f} ms/solve  "
              f"{iters:6d} iters{tag}", flush=True)


if __name__ == "__main__":
    main()
