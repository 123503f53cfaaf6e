"""Unstructured flagship at ≥1M cells — the mesh-size scaling demonstration.

The reference's largest problem is the 79,672-cell step mesh and its serial
loops cap there (``Playground.cpp:176-210``); SURVEY §5 names mesh-size
scaling the long-context analog.  This script measures the full unstructured
pipeline at ``refine(step, 2)`` = **1,274,752 cells** (and refine×1 =
318,688 for the scaling slope):

    host   — mesh refine/build/order/assemble wall times, SlicedELL window
             and per-block span distribution, BandedGatherPlan stats (CPU)
    spmv   — pallas_sell Gnnz/s at scale, slope protocol (TPU)
    cg     — CG(+Jacobi) time-to-tol on the 1.27M-cell Laplacian (TPU)
    amg    — AMG setup wall time + CG+AMG vs CG+Jacobi (TPU; use
             timeout 1100 — two large program compiles + ~60 MB of
             hierarchy H2D ride the slow relay tunnel)
    ch     — assembled Cahn–Hilliard implicit-step timing at scale (TPU;
             timeout 1100 — in-process mesh+assembly is ~5 min)

Timing rules per CLAUDE.md: chained reps inside one jit, fresh inputs per
timed run, inputs block_until_ready'd before timing, slopes between two
chain lengths.

Usage:  timeout 560 python scripts/perf_scale.py host|spmv|cg|ch [--levels 2]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = "/tmp/stormx_scale_cache_{lv}.npz"
STEP = "/root/reference/tests/_data/mesh/step.1."


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


def build_operator(levels: int, *, verbose: bool = True):
    """Refined-step Laplacian CSR (f32, TPU-ordered) + cell coords.

    Caches the ordered CSR arrays on /tmp so the TPU stages skip the ~25 s
    host build.
    """
    from stormx.sparse.formats import CSR

    path = CACHE.format(lv=levels)
    if os.path.exists(path):
        # HOST arrays only: a jnp.asarray here ships ~40 MB through the
        # ~28 MB/s relay tunnel and every later np.asarray pulls it back —
        # measured 80-200 s of pure transfer per stage.  Device arrays are
        # created once, inside the SlicedELL build.
        z = np.load(path)
        csr = CSR(
            data=z["data"],
            indices=z["indices"],
            row_ptr=z["row_ptr"],
            shape=(int(z["n"]), int(z["n"])),
        )
        return csr, z["centers"], z["volumes"]

    from stormx.fvm.divgrad import assemble_laplacian
    from stormx.mesh import read_tetgen, refine

    t0 = time.time()
    mesh = read_tetgen(STEP)
    t1 = time.time()
    mesh = refine(mesh, levels)
    t2 = time.time()
    mesh = mesh.optimize_for_tpu()
    t3 = time.time()
    csr64 = assemble_laplacian(mesh).to_csr()
    t4 = time.time()
    if verbose:
        print(
            f"host build: read {t1-t0:.1f}s  refine×{levels}+build {t2-t1:.1f}s"
            f"  order {t3-t2:.1f}s  assemble {t4-t3:.1f}s"
            f"  → {mesh.num_cells} cells, {mesh.num_faces} faces,"
            f" nnz={int(np.asarray(csr64.row_ptr)[-1])}",
            flush=True,
        )
    data = np.asarray(csr64.data, dtype=np.float32)
    indices = np.asarray(csr64.indices)
    row_ptr = np.asarray(csr64.row_ptr)
    np.savez(
        path,
        data=data,
        indices=indices,
        row_ptr=row_ptr,
        n=mesh.num_cells,
        centers=np.asarray(mesh.cell_centers),
        volumes=np.asarray(mesh.cell_volumes),
    )
    csr = CSR(data=data, indices=indices, row_ptr=row_ptr, shape=csr64.shape)
    return csr, np.asarray(mesh.cell_centers), np.asarray(mesh.cell_volumes)


def _host_matvec(csr, x):
    """f32 result of A@x computed on host in f64 (no device round trip)."""
    rp = np.asarray(csr.row_ptr)
    rows = np.repeat(np.arange(csr.shape[0]), np.diff(rp))
    y = np.zeros(csr.shape[0], np.float64)
    np.add.at(
        y, rows,
        np.asarray(csr.data, np.float64) * x[np.asarray(csr.indices)],
    )
    return y.astype(np.float32)


def build_sell(csr, centers, R=512):
    from stormx.sparse.windowed import sell_from_csr

    t = time.time()
    sell, perm = sell_from_csr(
        csr, block_rows=R, mode="onehot", reorder=True, coords=centers
    )
    print(
        f"R={R}: sell build {time.time()-t:.1f}s  window C={sell.window}"
        f" ({sell.window//128} chunks)",
        flush=True,
    )
    return sell, perm


def host(levels):
    """Host pipeline + window/plan statistics (CPU-safe)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    path = CACHE.format(lv=levels)
    if os.path.exists(path):
        os.unlink(path)  # force a fresh timed build
    csr, centers, _ = build_operator(levels)
    n = csr.shape[0]
    rp = np.asarray(csr.row_ptr)
    idx = np.asarray(csr.indices)
    for R in (256, 512, 1024):
        sell, _ = build_sell(csr, centers, R)
        # Per-block span distribution: the GLOBAL window C is the max
        # per-block span; how far is the tail from the bulk?
        lc = np.asarray(sell.local_cols)
        live = np.asarray(sell.data) != 0
        spans = np.array(
            [
                (lc[b][live[b]].max() - lc[b][live[b]].min() + 1)
                if live[b].any()
                else 0
                for b in range(lc.shape[0])
            ]
        )
        q = np.percentile(spans, [50, 90, 99, 100]).astype(int)
        print(
            f"  R={R}: block spans p50={q[0]} p90={q[1]} p99={q[2]}"
            f" max={q[3]} (window C={sell.window})",
            flush=True,
        )
    # Banded-gather plans on the refined mesh (FVM fast-path feasibility).
    from stormx.mesh import read_tetgen, refine

    mesh = refine(read_tetgen(STEP), levels).optimize_for_tpu()
    t = time.time()
    dm = mesh.device_arrays(np.float32, banded_gather=True)
    print(f"device_arrays(banded_gather=True): {time.time()-t:.1f}s")
    for name in ("bg_face_inner", "bg_face_outer", "bg_cell_face", "bg_cell_adj"):
        plan = getattr(dm, name)
        if plan is None:
            print(f"  {name}: None")
            continue
        print(
            f"  {name}: m={plan.m} C={plan.window} chunks={plan.n_chunks}"
            f" fixups={int(plan.fix_pos.size)}"
            f" xla_fallback={plan.xla_fallback}",
            flush=True,
        )


def _slope(fn, n, reps_pair=(400, 1200), label=""):
    """Chained-apply slope with fresh, pre-transferred inputs."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(3)
    times = {}
    for reps in reps_pair:
        def body(_, x):
            return fn(x) * 0.5

        c = jax.jit(lambda x, r=reps: lax.fori_loop(0, r, body, x))
        xw = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        xw.block_until_ready()
        c(xw).block_until_ready()  # compile+warm
        best = np.inf
        for _ in range(3):
            xt = jnp.asarray(rng.standard_normal(n).astype(np.float32))
            xt.block_until_ready()
            t0 = time.perf_counter()
            c(xt).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        times[reps] = best
        print(f"  {label} reps={reps}: {best:.3f}s", flush=True)
    r0, r1 = reps_pair
    return (times[r1] - times[r0]) / (r1 - r0)


def spmv(levels):
    setup()

    from stormx.ops.pallas_sell import sell_matvec_pallas

    csr, centers, _ = build_operator(levels)
    n = csr.shape[0]
    nnz = int(np.asarray(csr.row_ptr)[-1])
    sell, perm = build_sell(csr, centers, R=512)
    # Correctness at scale first, against a HOST CSR matvec oracle (the
    # XLA onehot mode constant-folds a (nb,R,K,C) one-hot tensor — 41 GB
    # at this scale — so the small-mesh compiled oracle cannot run here).
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    xp = rng.standard_normal(n).astype(np.float32)
    x_nat = np.empty(n, np.float32)
    x_nat[perm] = xp  # permuted vector v_p = v_nat[perm]
    rp = np.asarray(csr.row_ptr)
    rows = np.repeat(np.arange(n), np.diff(rp))
    y_nat = np.zeros(n, np.float64)
    np.add.at(
        y_nat, rows,
        np.asarray(csr.data, np.float64) * x_nat[np.asarray(csr.indices)],
    )
    y_ref = y_nat[perm]
    x = jnp.asarray(xp)
    y_pal = np.asarray(sell_matvec_pallas(sell, x))
    rel = np.abs(y_pal - y_ref).max() / np.abs(y_ref).max()
    print(f"correctness at n={n}: rel {rel:.2e}")
    assert rel < 1e-5
    slope = _slope(lambda v: sell_matvec_pallas(sell, v), n, label="pallas")
    print(
        f"pallas_sell @ {n} cells: {slope*1e6:.1f} us/apply"
        f"  {nnz/slope/1e9:.2f} Gnnz/s",
        flush=True,
    )


def cg(levels):
    jax = setup()
    import jax.numpy as jnp

    from stormx.ops.pallas_sell import sell_matvec_pallas
    from stormx.precond import JacobiPreconditioner
    from stormx.solvers import SolverOptions, cg as cg_solve, make_operator

    csr, centers, volumes = build_operator(levels)
    n = csr.shape[0]
    sell, perm = build_sell(csr, centers, R=512)
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n)

    # Diagonal in permuted space for Jacobi.
    rp = np.asarray(csr.row_ptr)
    idx = np.asarray(csr.indices)
    dat = np.asarray(csr.data)
    rows = np.repeat(np.arange(n), np.diff(rp))
    dmask = idx == rows
    diag = np.zeros(n, np.float32)
    np.add.at(diag, rows[dmask], dat[dmask])
    diag_p = diag[perm]

    op = make_operator(lambda v: sell_matvec_pallas(sell, v))
    rng = np.random.default_rng(5)
    u = rng.standard_normal(n).astype(np.float32)
    b = _host_matvec(csr, u)  # consistent rhs, host-side
    b_p = jnp.asarray(b[perm])
    opts = SolverOptions(relative_tolerance=1e-6, num_iterations=4000)

    for name, pre in (
        ("cg", None),
        ("cg+jacobi", JacobiPreconditioner(diag=jnp.asarray(diag_p))),
    ):
        sol = jax.jit(
            lambda bb, pre=pre: cg_solve(
                op, bb, jnp.zeros_like(bb), precond=pre, options=opts
            )
        )
        res = sol(b_p)
        res.x.block_until_ready()  # compile+first
        t0 = time.perf_counter()
        res = sol(jnp.asarray((b * 2.0)[perm]))
        res.x.block_until_ready()
        dt = time.perf_counter() - t0
        it = int(res.num_iterations)
        print(
            f"{name}: {it} iters, {dt:.2f}s → {dt/max(it,1)*1e6:.0f} us/iter,"
            f" converged={bool(res.converged)} rel={float(res.relative_error):.2e}",
            flush=True,
        )


def amg(levels):
    """Aggregation-AMG at scale: setup wall time per level (host) and
    CG+AMG vs CG+Jacobi on chip, fine-level smoothing routed through the
    Pallas kernel (coarse tail stays ELL gathers)."""
    jax = setup()
    import jax.numpy as jnp

    from stormx.ops.pallas_sell import sell_matvec_pallas
    from stormx.precond import JacobiPreconditioner
    from stormx.precond.multigrid import AmgPreconditioner
    from stormx.solvers import SolverOptions, cg as cg_solve, make_operator
    from stormx.sparse.formats import CSR
    from stormx.sparse.windowed import sell_from_csr

    csr, centers, _ = build_operator(levels)
    n = csr.shape[0]
    sell, perm = build_sell(csr, centers, R=512)
    # Permuted-space CSR (the ordering the pallas operator applies in).
    rp = np.asarray(csr.row_ptr)
    idx = np.asarray(csr.indices)
    dat = np.asarray(csr.data)
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n)
    rows = inv[np.repeat(np.arange(n), np.diff(rp))]
    cols = inv[idx]
    order = np.lexsort((cols, rows))
    rp2 = np.zeros(n + 1, np.int64)
    np.add.at(rp2, rows + 1, 1)
    csr_p = CSR(
        data=dat[order],
        indices=cols[order].astype(np.int32),
        row_ptr=np.cumsum(rp2).astype(np.int32),
        shape=(n, n),
    )
    t0 = time.time()
    pre = AmgPreconditioner(
        csr_p, num_sweeps=1,
        fine_matvec=lambda v: sell_matvec_pallas(sell, v.astype(jnp.float32)),
    )
    print(
        f"AMG setup: {time.time()-t0:.1f}s, levels "
        f"{[lv['n'] for lv in pre._levels]} + coarse"
        f" {pre._coarse_inv.shape[0]}",
        flush=True,
    )
    # The hierarchy builds in f64 (host exactness); run the cycle in f32.
    for lv in pre._levels:
        lv["ell_vals"] = lv["ell_vals"].astype(jnp.float32)
        lv["inv_diag"] = lv["inv_diag"].astype(jnp.float32)
    pre._coarse_inv = pre._coarse_inv.astype(jnp.float32)

    op = make_operator(lambda v: sell_matvec_pallas(sell, v))
    rng = np.random.default_rng(5)
    u = rng.standard_normal(n).astype(np.float32)
    b = _host_matvec(csr, u)[perm]
    diag = np.zeros(n, np.float32)
    r_of = np.repeat(np.arange(n), np.diff(rp))
    dm = idx == r_of
    np.add.at(diag, r_of[dm], dat[dm])
    opts = SolverOptions(relative_tolerance=1e-6, num_iterations=4000)
    for name, p in (
        ("cg+jacobi", JacobiPreconditioner(diag=jnp.asarray(diag[perm]))),
        ("cg+amg", pre),
    ):
        sol = jax.jit(
            lambda bb, p=p: cg_solve(
                op, bb, jnp.zeros_like(bb), precond=p, options=opts
            )
        )
        res = sol(jnp.asarray(b))
        res.x.block_until_ready()
        t0 = time.perf_counter()
        res = sol(jnp.asarray(b * 2.0))
        res.x.block_until_ready()
        dt = time.perf_counter() - t0
        it = int(res.num_iterations)
        print(
            f"{name}: {it} iters, {dt:.2f}s ({dt/max(it,1)*1e3:.2f} ms/iter),"
            f" converged={bool(res.converged)}",
            flush=True,
        )


def ch(levels):
    """Assembled Cahn–Hilliard implicit step at scale (the app path)."""
    setup()
    import jax
    import jax.numpy as jnp

    from stormx.apps.cahn_hilliard import make_assembled_step
    from stormx.mesh import read_tetgen, refine

    t0 = time.time()
    mesh = refine(read_tetgen(STEP), levels).optimize_for_tpu()
    print(f"mesh: {time.time()-t0:.1f}s, {mesh.num_cells} cells", flush=True)
    t0 = time.time()
    step = make_assembled_step(mesh, dtype=np.float32)
    print(f"CH setup (assemble A + windows): {time.time()-t0:.1f}s", flush=True)
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.uniform(-1, 1, mesh.num_cells).astype(np.float32))
    t0 = time.time()
    c1, res = step(c)
    c1.block_until_ready()
    print(f"first step (compile): {time.time()-t0:.1f}s", flush=True)
    for k in range(3):
        t0 = time.perf_counter()
        c1, res = step(c1)
        c1.block_until_ready()
        print(
            f"step {k}: {time.perf_counter()-t0:.2f}s"
            f" ({int(res.num_iterations)} inner iters)",
            flush=True,
        )


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "host"
    levels = 2
    if "--levels" in sys.argv:
        levels = int(sys.argv[sys.argv.index("--levels") + 1])
    {"host": host, "spmv": spmv, "cg": cg, "ch": ch, "amg": amg}[stage](levels)


if __name__ == "__main__":
    main()
