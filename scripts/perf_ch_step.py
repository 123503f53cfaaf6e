"""Cahn–Hilliard implicit-step wall time on TPU: matrix-free (nested FVM
gathers per CG iteration) vs assembled A = I − τσD + τγD² through
auto_operator (the Pallas window-gather path).

The step mesh in f32; each step is one device dispatch containing the
whole CG while-loop, so per-step wall time is dominated by solve time and
safe to time directly (fresh inputs per run defeat relay memoization).

Usage: timeout 560 python scripts/perf_ch_step.py
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

    from stormx.apps.cahn_hilliard import make_assembled_step, make_step
    from stormx.mesh import read_tetgen
    from stormx.solvers import SolverOptions

    mesh = read_tetgen("/root/reference/tests/_data/mesh/step.1.")
    opts = SolverOptions(
        num_iterations=2000, absolute_tolerance=0.0, relative_tolerance=1e-6
    )
    dmesh = mesh.device_arrays(dtype=jnp.float32)
    steps = {
        "matrix-free": make_step(dmesh, options=opts),
        "assembled": make_assembled_step(mesh, options=opts, dtype=jnp.float32),
    }
    rng = np.random.default_rng(0)
    for name, step in steps.items():
        cw = jnp.asarray(
            (0.5 + 0.1 * rng.standard_normal(mesh.num_cells)).astype(np.float32)
        )
        c, res = step(cw)
        c.block_until_ready()  # compile + warm
        iters = int(res.num_iterations)
        best = np.inf
        for _ in range(3):
            ct = jnp.asarray(
                (0.5 + 0.1 * rng.standard_normal(mesh.num_cells)).astype(np.float32)
            )
            ct.block_until_ready()
            t0 = time.perf_counter()
            c2, r2 = step(ct)
            c2.block_until_ready()
            best = min(best, time.perf_counter() - t0)
        print(
            f"{name:12s} {best * 1e3:9.1f} ms/step  ({iters} CG iters warm; "
            f"{best / max(int(r2.num_iterations), 1) * 1e6:7.1f} us/iter)",
            flush=True,
        )


if __name__ == "__main__":
    main()
