"""Banded-gather kernel on the step mesh's real FVM maps, slope protocol.

Maps (faces sorted by inner cell within labels, cells coordinate-ordered):
  face_inner  — (119,974,) cell reads per face
  face_outer  — same, outer side (boundary clamped to inner)
  cell_face   — (79,672·4,) flattened cell←face flux reads

Usage: timeout 560 python scripts/perf_fvm_gather.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    import jax.numpy as jnp
    from jax import lax

    from stormx.mesh import read_tetgen
    from stormx.ops.pallas_gather import BandedGatherPlan
    from stormx.parallel.partition import bandwidth_order

    mesh = read_tetgen("/root/reference/tests/_data/mesh/step.1.")
    interior = mesh.interior_faces()
    inner, outer = mesh.face_cells[interior, 0], mesh.face_cells[interior, 1]
    rows = np.concatenate([inner, outer])
    cols = np.concatenate([outer, inner])
    cperm = bandwidth_order(
        mesh.num_cells, rows, cols, np.asarray(mesh.cell_centers)
    )
    m2 = mesh.permute("cell", cperm)
    fperm = np.arange(m2.num_faces)
    r = m2.face_label_ranges
    for L in range(len(r) - 1):
        blk = slice(r[L], r[L + 1])
        fperm[blk] = fperm[blk][np.argsort(m2.face_cells[blk, 0], kind="stable")]
    m2 = m2.permute("face", fperm)

    dm = m2.device_arrays(dtype=jnp.float32)
    n_c, n_f = m2.num_cells, m2.num_faces
    maps = {
        "face_inner": (np.asarray(m2.face_cells[:, 0]), n_c),
        "face_outer": (
            np.where(m2.face_cells[:, 1] >= 0, m2.face_cells[:, 1],
                     m2.face_cells[:, 0]),
            n_c,
        ),
        "cell_face": (np.asarray(dm.cell_face_ell).reshape(-1), n_f),
    }
    rng = np.random.default_rng(0)
    for name, (idx, n_src) in maps.items():
        plan = BandedGatherPlan(idx, n_src)
        idxj = jnp.asarray(idx.astype(np.int32))
        x0 = jnp.asarray(rng.standard_normal(n_src).astype(np.float32))
        ok = bool(
            (np.asarray(plan(x0)) == np.asarray(x0)[idx]).all()
        )
        print(
            f"{name}: m={len(idx)} C={plan.window} "
            f"fixups={int(plan.fix_pos.size)} bit-exact={ok}",
            flush=True,
        )
        assert ok
        for pname, fn in (
            ("pallas", lambda v: plan(v)),
            ("xla", lambda v: v[idxj]),
        ):
            def chain(reps):
                def body(_, xv):
                    y = fn(xv)
                    return (
                        y[:n_src] * 0.5
                        if len(idx) >= n_src
                        else jnp.concatenate(
                            [y, jnp.zeros((n_src - len(idx),), y.dtype)]
                        ) * 0.5
                    )
                return jax.jit(lambda x0: lax.fori_loop(0, reps, body, x0))

            times = {}
            for reps in (50, 200):
                c = chain(reps)
                xw = jnp.asarray(rng.standard_normal(n_src).astype(np.float32))
                c(xw).block_until_ready()
                best = np.inf
                for _ in range(3):
                    xt = jnp.asarray(
                        rng.standard_normal(n_src).astype(np.float32)
                    )
                    xt.block_until_ready()
                    t0 = time.perf_counter()
                    c(xt).block_until_ready()
                    best = min(best, time.perf_counter() - t0)
                times[reps] = best
            s = (times[200] - times[50]) / 150.0
            print(
                f"  {pname:7s} {s * 1e6:9.2f} us/gather  "
                f"{len(idx) / s / 1e9:6.2f} G elems/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
