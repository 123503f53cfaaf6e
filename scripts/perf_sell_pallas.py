"""Validate + measure the Pallas SlicedELL window-gather kernel on TPU.

Stages (run separately; each is a sacrificial process per CLAUDE.md):
    small  — compiled correctness at a tiny size (new-Mosaic-kernel safety)
    full   — compiled correctness on the 79,672-cell step operator
    perf   — slope-protocol timing (chained applies, two chain lengths,
             fresh inputs per timed run) vs the dense/onehot XLA modes

Usage:  timeout 560 python scripts/perf_sell_pallas.py small|full|perf
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def setup():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    return jax


def build_small():
    """Tiny banded operator, n=512, K=3."""
    import jax.numpy as jnp

    from stormx.sparse.formats import CSR
    from stormx.sparse.windowed import sell_from_csr

    n = 512
    rng = np.random.default_rng(1)
    rows, cols, vals = [], [], []
    for i in range(n):
        for j in (i - 2, i, i + 1):
            if 0 <= j < n:
                rows.append(i), cols.append(j), vals.append(rng.standard_normal())
    rows, cols, vals = map(np.asarray, (rows, cols, vals))
    order = np.lexsort((cols, rows))
    rp = np.zeros(n + 1, np.int32)
    np.add.at(rp, rows + 1, 1)
    csr = CSR(
        data=jnp.asarray(vals[order].astype(np.float32)),
        indices=jnp.asarray(cols[order].astype(np.int32)),
        row_ptr=jnp.asarray(np.cumsum(rp).astype(np.int32)),
        shape=(n, n),
    )
    sell, perm = sell_from_csr(csr, mode="dense", reorder=False)
    return sell, n


def build_step(mode="dense", block_rows=128, coords=False):
    import jax.numpy as jnp

    from stormx.fvm.divgrad import assemble_laplacian
    from stormx.mesh import read_tetgen
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
    sell, perm = sell_from_csr(
        csr32, mode=mode, block_rows=block_rows,
        coords=np.asarray(mesh.cell_centers) if coords else None,
    )
    return sell, csr.shape[0]


def check(sell, n, tag):
    import jax.numpy as jnp

    from stormx.ops.pallas_sell import sell_matvec_pallas

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    y_ref = np.asarray(sell.matvec(x))
    y_pal = np.asarray(sell_matvec_pallas(sell, x))
    rel = np.abs(y_pal - y_ref).max() / max(np.abs(y_ref).max(), 1e-30)
    print(f"{tag}: rel err vs XLA mode = {rel:.3e}")
    assert rel < 1e-5, "MISMATCH"
    print(f"{tag}: PASS")


def chain_fn(apply_fn, reps):
    """x → normalized repeated application, inside one jit (amortizes the
    ~5 ms relay dispatch and defeats relay memoization via fresh inputs)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def body(_, x):
        y = apply_fn(x)
        # power-of-two scale keeps values bounded without perturbing bits
        return y * 0.5

    def run(x):
        return lax.fori_loop(0, reps, body, x)

    return jax.jit(run)


def perf():
    jax = setup()
    import jax.numpy as jnp

    from stormx.ops.pallas_sell import sell_matvec_pallas

    sell_d, n = build_step("dense")
    sell_o, _ = build_step("onehot")
    nnz = int(np.count_nonzero(np.asarray(sell_d.data)))
    print(f"n={n} nnz={nnz}")

    paths = {
        "pallas": lambda x: sell_matvec_pallas(sell_d, x),
        "dense": sell_d.matvec,
        "onehot": sell_o.matvec,
    }
    rng = np.random.default_rng(3)
    for name, fn in paths.items():
        times = {}
        for reps in (100, 400):
            c = chain_fn(fn, reps)
            xw = jnp.asarray(rng.standard_normal(n).astype(np.float32))
            c(xw).block_until_ready()  # warm/compile
            best = np.inf
            for _ in range(3):
                xt = jnp.asarray(rng.standard_normal(n).astype(np.float32))
                xt.block_until_ready()
                t0 = time.perf_counter()
                c(xt).block_until_ready()
                best = min(best, time.perf_counter() - t0)
            times[reps] = best
        slope = (times[400] - times[100]) / 300.0
        print(
            f"{name:8s} slope {slope * 1e6:9.2f} us/apply  "
            f"{nnz / slope / 1e9:8.2f} Gnnz/s   raw {times}"
        )


def sweep():
    """block_rows sweep: grid-step overhead (fewer, bigger steps) vs
    masked-chunk waste (window chunks per nnz grows with R)."""
    jax = setup()
    import jax.numpy as jnp

    from stormx.ops.pallas_sell import sell_matvec_pallas

    rng = np.random.default_rng(3)
    for R in (128, 256, 512, 1024):
        import jax.numpy as jnp

        from stormx.fvm.divgrad import assemble_laplacian
        from stormx.mesh import read_tetgen
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
        sell, _ = sell_from_csr(csr32, mode="onehot", block_rows=R)
        n = csr.shape[0]
        nnz = int(np.count_nonzero(np.asarray(sell.data)))
        # correctness first
        x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        y_ref = np.asarray(sell.matvec(x))
        y_pal = np.asarray(sell_matvec_pallas(sell, x))
        rel = np.abs(y_pal - y_ref).max() / np.abs(y_ref).max()
        assert rel < 1e-5, (R, rel)
        times = {}
        for reps in (100, 400):
            c = chain_fn(lambda v: sell_matvec_pallas(sell, v), reps)
            xw = jnp.asarray(rng.standard_normal(n).astype(np.float32))
            c(xw).block_until_ready()
            best = np.inf
            for _ in range(3):
                xt = jnp.asarray(rng.standard_normal(n).astype(np.float32))
                xt.block_until_ready()
                t0 = time.perf_counter()
                c(xt).block_until_ready()
                best = min(best, time.perf_counter() - t0)
            times[reps] = best
        slope = (times[400] - times[100]) / 300.0
        print(
            f"R={R:5d} C={sell.window:5d} slope {slope * 1e6:9.2f} us/apply"
            f"  {nnz / slope / 1e9:8.2f} Gnnz/s"
        )


def coords_perf():
    """Pallas R=512 with RCM vs coordinate-sort ordering (bandwidth 524 vs
    504 on the step mesh — drops the window from 12 to 8 chunks)."""
    jax = setup()
    import jax.numpy as jnp

    from stormx.ops.pallas_sell import sell_matvec_pallas

    rng = np.random.default_rng(3)
    for coords in (False, True):
        sell, n = build_step("onehot", block_rows=512, coords=coords)
        nnz = int(np.count_nonzero(np.asarray(sell.data)))
        x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        y_ref = np.asarray(sell.matvec(x))
        y_pal = np.asarray(sell_matvec_pallas(sell, x))
        rel = np.abs(y_pal - y_ref).max() / np.abs(y_ref).max()
        assert rel < 1e-5, (coords, rel)
        times = {}
        for reps in (100, 400):
            c = chain_fn(lambda v: sell_matvec_pallas(sell, v), reps)
            xw = jnp.asarray(rng.standard_normal(n).astype(np.float32))
            c(xw).block_until_ready()
            best = np.inf
            for _ in range(3):
                xt = jnp.asarray(rng.standard_normal(n).astype(np.float32))
                xt.block_until_ready()
                t0 = time.perf_counter()
                c(xt).block_until_ready()
                best = min(best, time.perf_counter() - t0)
            times[reps] = best
        slope = (times[400] - times[100]) / 300.0
        print(
            f"coords={coords!s:5s} C={sell.window:5d} "
            f"slope {slope * 1e6:9.2f} us/apply  {nnz / slope / 1e9:8.2f} Gnnz/s"
        )


def v2_small():
    """Compiled correctness of the chunk-packed v2 kernel at tiny size."""
    jax = setup()
    import jax.numpy as jnp

    from stormx.ops.pallas_sell2 import pack_sell

    sell, n = build_small()
    packed = pack_sell(sell)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    y_ref = np.asarray(sell.matvec(x))
    y2 = np.asarray(packed.matvec(x))
    rel = np.abs(y2 - y_ref).max() / max(np.abs(y_ref).max(), 1e-30)
    print(f"v2 small: M={packed.idx.shape[1]} rel err {rel:.3e}")
    assert rel < 1e-5, "MISMATCH"
    print("v2 small: PASS")


def v2_sweep():
    """Chunk-packed v2 kernel: correctness at step scale + R sweep vs the
    v1 masked-chunk kernel (slope protocol)."""
    jax = setup()
    import jax.numpy as jnp

    from stormx.ops.pallas_sell import sell_matvec_pallas
    from stormx.ops.pallas_sell2 import pack_sell

    rng = np.random.default_rng(3)
    for R in (512,):
        sell, n = build_step("onehot", block_rows=R, coords=True)
        nnz = int(np.count_nonzero(np.asarray(sell.data)))
        x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        y_ref = np.asarray(sell.matvec(x))
        for mm in ("where", "mul"):
            y1 = np.asarray(sell_matvec_pallas(sell, x, mask_mode=mm))
            rel = np.abs(y1 - y_ref).max() / np.abs(y_ref).max()
            assert rel < 1e-5, (R, mm, rel)
        packed = pack_sell(sell, "matmul")
        y2 = np.asarray(packed.matvec(x))
        rel = np.abs(y2 - y_ref).max() / np.abs(y_ref).max()
        assert rel < 1e-5, (R, "v2m", rel)
        rows = {
            "v1-where": lambda v: sell_matvec_pallas(sell, v),
            "v1-mul  ": lambda v: sell_matvec_pallas(sell, v, mask_mode="mul"),
            "v2-matml": packed.matvec,
        }
        for name, fn in rows.items():
            times = {}
            # Long chains: at ~30 µs/apply the 100/400-rep chains of the r3
            # table are 3-12 ms of compute against a dispatch floor of
            # hundreds of ms — the slope is a small difference of two large
            # noisy numbers (observed 13-31 µs scatter).  2000/8000 reps
            # put the Δ at ~180 ms ≫ noise.
            for reps in (2000, 8000):
                c = chain_fn(fn, reps)
                xw = jnp.asarray(rng.standard_normal(n).astype(np.float32))
                c(xw).block_until_ready()
                best = np.inf
                for _ in range(3):
                    xt = jnp.asarray(rng.standard_normal(n).astype(np.float32))
                    xt.block_until_ready()
                    t0 = time.perf_counter()
                    c(xt).block_until_ready()
                    best = min(best, time.perf_counter() - t0)
                times[reps] = best
            slope = (times[8000] - times[2000]) / 6000.0
            print(
                f"{name} R={R:5d} C={sell.window:5d} "
                f"slope {slope * 1e6:9.2f} us/apply  {nnz / slope / 1e9:8.2f} Gnnz/s",
                flush=True,
            )


def main(stage):
    setup()
    if stage == "small":
        sell, n = build_small()
        check(sell, n, "small")
    elif stage == "full":
        sell, n = build_step()
        check(sell, n, "full")
    elif stage == "perf":
        perf()
    elif stage == "sweep":
        sweep()
    elif stage == "coords":
        coords_perf()
    elif stage == "v2small":
        v2_small()
    elif stage == "v2":
        v2_sweep()
    else:
        raise SystemExit(f"unknown stage {stage}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "small")
