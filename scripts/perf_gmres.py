"""GMRES(50) on TPU — µs/iter, MGS vs CGS2 (VERDICT r4 item 2).

The reference's GMRES uses sequential MGS (``SolverGmres.hpp:157-162``):
k+1 dependent dot+axpy pairs at inner step k — k+1 psums per iteration
when distributed.  The CGS2 alternative (``stormx/solvers/gmres.py``)
orthogonalizes against the whole basis with ONE batched (k+1, n)·(n,)
matvec (run twice for reorthogonalization) — 2 psums per iteration at any
k, and MXU-shaped instead of a serial dot chain.

Measurement: solve with tol=0 so the while_loop runs exactly
``num_iterations``; slope between two iteration budgets cancels compile +
dispatch + init. Fresh inputs per timed run (relay memoization), inputs
block_until_ready'd before timing (CLAUDE.md protocol).

Stages:
    dia   — 4.2M-row 5-diagonal Poisson operator (bench.py's; XLA DIA path)
    sell  — 79,672-cell step SlicedELL operator (pallas kernel path)

Usage:  timeout 560 python scripts/perf_gmres.py dia|sell|scale
(scale = the 1.27M-cell refined-step SlicedELL operator; needs the
perf_scale.py lv=2 cache)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def setup():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def measure(op_mul, n, iters_pair, label):
    import jax
    import jax.numpy as jnp

    from stormx.solvers import SolverOptions, make_operator
    from stormx.solvers.gmres import gmres

    op = make_operator(op_mul)
    rng = np.random.default_rng(11)
    for orthog in ("mgs", "cgs2"):
        times = {}
        for iters in iters_pair:
            opts = SolverOptions(
                num_iterations=iters,
                absolute_tolerance=0.0,
                relative_tolerance=0.0,
                record_history=False,
            )
            sol = jax.jit(
                lambda bb, o=opts, og=orthog: gmres(
                    op, bb, jnp.zeros_like(bb), options=o, orthog=og
                ).x
            )
            xw = jnp.asarray(rng.standard_normal(n).astype(np.float32))
            xw.block_until_ready()
            t0 = time.time()
            sol(xw).block_until_ready()  # compile + first run
            print(
                f"  {label}/{orthog} iters={iters}: compile+run {time.time()-t0:.1f}s",
                flush=True,
            )
            best = np.inf
            for _ in range(3):
                xt = jnp.asarray(rng.standard_normal(n).astype(np.float32))
                xt.block_until_ready()
                t0 = time.perf_counter()
                sol(xt).block_until_ready()
                best = min(best, time.perf_counter() - t0)
            times[iters] = best
            print(f"  {label}/{orthog} iters={iters}: best {best:.3f}s", flush=True)
        i0, i1 = iters_pair
        slope = (times[i1] - times[i0]) / (i1 - i0)
        print(
            f"{label} GMRES(50) {orthog}: {slope*1e6:.1f} us/iter"
            f"  (raw {times})",
            flush=True,
        )


def dia_stage():
    setup()
    import jax.numpy as jnp

    from bench import poisson5_diags, NX
    from stormx.sparse import DIA

    offsets, data = poisson5_diags(NX)
    n = NX * NX
    dia = DIA(data=jnp.asarray(data), offsets=offsets, shape=(n, n))
    print(f"DIA operator: n={n}, 5 diagonals", flush=True)
    measure(dia.matvec, n, (100, 300), "dia4.2M")


def sell_stage():
    setup()
    import jax.numpy as jnp

    from stormx.fvm.divgrad import assemble_laplacian
    from stormx.mesh import read_tetgen
    from stormx.ops.pallas_sell import sell_matvec_pallas
    from stormx.sparse.formats import CSR
    from stormx.sparse.windowed import sell_from_csr

    mesh = read_tetgen("/root/reference/tests/_data/mesh/step.1.")
    csr = assemble_laplacian(mesh).to_csr()
    csr32 = CSR(
        data=jnp.asarray(np.asarray(csr.data, dtype=np.float32)),
        indices=csr.indices,
        row_ptr=csr.row_ptr,
        shape=csr.shape,
    )
    sell, _ = sell_from_csr(
        csr32, mode="onehot", block_rows=512,
        coords=np.asarray(mesh.cell_centers),
    )
    n = csr.shape[0]
    print(f"SlicedELL step operator: n={n}, C={sell.window}", flush=True)
    measure(lambda v: sell_matvec_pallas(sell, v), n, (200, 1000), "sell-step")


def scale_stage():
    setup()
    from perf_scale import build_operator, build_sell
    from stormx.ops.pallas_sell import sell_matvec_pallas

    csr, centers, _ = build_operator(2)
    sell, _ = build_sell(csr, centers, R=512)
    n = csr.shape[0]
    print(f"SlicedELL refined-step operator: n={n}, C={sell.window}", flush=True)
    measure(lambda v: sell_matvec_pallas(sell, v), n, (100, 300), "sell-1.27M")


if __name__ == "__main__":
    stage = sys.argv[1] if len(sys.argv) > 1 else "dia"
    {"dia": dia_stage, "sell": sell_stage, "scale": scale_stage}[stage]()
