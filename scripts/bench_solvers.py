"""BASELINE solver metrics on the real TPU chip (one JSON line each):

  * cg_iters_per_s_dia      — CG on the 4.2M-row 5-point DIA operator (f32)
  * cg_time_to_tol_dia      — same operator, relative tol 1e-6
  * gmres_iters_per_s_dia   — GMRES(30)+MGS on the DIA operator
  * cg_iters_per_s_step     — CG on the 79,672-cell unstructured step-mesh
                              operator via the SlicedELL fast path (f32)
  * cg_time_to_tol_step     — rel tol 1e-4 (f32 limit at cond ~1e6)

Protocol (CLAUDE.md relay rules): the whole solve is ONE jit program
(while-loop inside), so per-iteration cost is the SLOPE between two fixed
iteration budgets (tolerances disabled) — dispatch noise and memoization
cannot produce a reliable single-call time.  time-to-tol is reported as
iterations-to-tol × measured s/iter, plus the raw wall time of the
converged call as a sanity field.
"""

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DEADLINE_S = int(os.environ.get("STORMX_BENCH_DEADLINE_S", "540"))
threading.Thread(
    target=lambda: (time.sleep(_DEADLINE_S), os._exit(2)), daemon=True
).start()


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from stormx.precond import JacobiPreconditioner
    from stormx.solvers import SolverOptions, cg, gmres, make_operator
    from stormx.sparse import DIA

    sys.path.insert(0, "/root/repo")
    from bench import NX, poisson5_diags

    rng = np.random.default_rng(0)

    def slope(solve_fn, rhs_maker, lo, hi):
        """Marginal seconds/iteration between two fixed budgets — min of a few
        timed calls per budget (fresh rhs each, so the relay cannot memoize)
        to shed its dispatch-latency noise."""
        solve_fn(rhs_maker(), lo).block_until_ready()  # compile lo
        solve_fn(rhs_maker(), hi).block_until_ready()  # compile hi

        def best(iters):
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                solve_fn(rhs_maker(), iters).block_until_ready()
                ts.append(time.perf_counter() - t0)
            return min(ts)

        return (best(hi) - best(lo)) / (hi - lo)

    # ---- DIA operator (the structured fast path) --------------------------
    offsets, diag_np = poisson5_diags(NX)
    n = NX * NX
    dia = DIA(data=jnp.asarray(diag_np), offsets=offsets, shape=(n, n))
    op = make_operator(dia.matvec)
    pre = JacobiPreconditioner(diag=jnp.full((n,), 4.0, jnp.float32))

    budgets = {}

    def dia_solver(method):
        def run(b, iters):
            opts = SolverOptions(
                num_iterations=int(iters), absolute_tolerance=0.0,
                relative_tolerance=0.0, record_history=False,
            )
            kw = {"restart": 30} if method is gmres else {}
            return method(op, b, jnp.zeros(n, jnp.float32), precond=pre,
                          options=opts, **kw).x
        return run

    def rhs():
        return jnp.asarray(rng.standard_normal(n).astype(np.float32))

    for name, method, lo, hi in (
        ("cg", cg, 2000, 20000),
        ("gmres", gmres, 1000, 8000),
    ):
        per = slope(dia_solver(method), rhs, lo, hi)
        budgets[name] = per
        emit(metric=f"{name}_iters_per_s_dia", value=1.0 / per, unit="iters/s",
             s_per_iter=per, rows=n)

    # time-to-tol: converged run for the iteration count, slope for the rate.
    # f32 CG at cond ~ (NX/π)² bottoms out around 1e-4 relative — the fp64
    # tol-1e-8 statement lives in tests/test_milestone_a.py on CPU.
    opts = SolverOptions(num_iterations=3000, absolute_tolerance=0.0,
                         relative_tolerance=1e-4)
    b1 = rhs()
    t0 = time.perf_counter()
    res = cg(op, b1, jnp.zeros(n, jnp.float32), precond=pre, options=opts)
    jax.block_until_ready(res.x)
    wall = time.perf_counter() - t0
    iters = int(res.num_iterations)
    emit(metric="cg_time_to_tol_dia", value=iters * budgets["cg"], unit="s",
         iterations=iters, rel_tol=1e-4, converged=bool(res.converged),
         wall_first_call_s=wall)

    # ---- step-mesh operator (the unstructured fast path) ------------------
    from stormx.fvm.divgrad import assemble_laplacian
    from stormx.mesh import read_tetgen
    from stormx.sparse import sell_from_csr
    from stormx.sparse.formats import CSR

    mesh = read_tetgen("/root/reference/tests/_data/mesh/step.1.")
    L = assemble_laplacian(mesh)
    csr = L.to_csr()
    csr = CSR(data=jnp.asarray(np.asarray(csr.data, dtype=np.float32)),
              indices=csr.indices, row_ptr=csr.row_ptr, shape=csr.shape)
    sell, perm = sell_from_csr(csr, block_rows=128, mode="dense")
    ns = mesh.num_cells
    diag = (np.asarray(L.data) * (np.asarray(L.cols) == np.arange(ns)[:, None])).sum(1)
    pre_s = JacobiPreconditioner(diag=jnp.asarray(diag[perm].astype(np.float32)))
    op_s = make_operator(sell.matvec)

    def step_solver(b, iters):
        opts = SolverOptions(
            num_iterations=int(iters), absolute_tolerance=0.0,
            relative_tolerance=0.0, record_history=False,
        )
        return cg(op_s, b, jnp.zeros(ns, jnp.float32), precond=pre_s,
                  options=opts).x

    def rhs_s():
        r = rng.standard_normal(ns).astype(np.float32)
        return jnp.asarray(r - r.mean())

    per_s = slope(step_solver, rhs_s, 2000, 20000)
    emit(metric="cg_iters_per_s_step", value=1.0 / per_s, unit="iters/s",
         s_per_iter=per_s, rows=ns, layout="sliced_ell_dense128")

    opts = SolverOptions(num_iterations=4000, absolute_tolerance=0.0,
                         relative_tolerance=1e-4)
    res = cg(op_s, rhs_s(), jnp.zeros(ns, jnp.float32), precond=pre_s,
             options=opts)
    jax.block_until_ready(res.x)
    emit(metric="cg_time_to_tol_step", value=int(res.num_iterations) * per_s,
         unit="s", iterations=int(res.num_iterations), rel_tol=1e-4,
         converged=bool(res.converged))


if __name__ == "__main__":
    main()
