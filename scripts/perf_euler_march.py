"""Explicit compressible-Euler march on the step mesh (TPU, f32):
XLA gathers vs the Pallas banded-gather fast path, both orders.

Per-step cost is a handful of face/cell gathers + VPU flux math, chained
inside one jit (lax.fori_loop) — slope protocol, fresh inputs per run.

Usage: timeout 560 python scripts/perf_euler_march.py [order] [bg|xla]
       [--levels N]   # uniform red refinement (r5: N=2 → 1.27M cells)
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

    from stormx.apps.euler import initial_state
    from stormx.fvm.bc import far_field_bc, slip_bc
    from stormx.fvm.solver import FvSolver
    from stormx.mesh import read_tetgen, refine

    args = list(sys.argv[1:])
    levels = 0
    if "--levels" in args:
        i = args.index("--levels")
        levels = int(args[i + 1])
        del args[i : i + 2]
    mesh = read_tetgen("/root/reference/tests/_data/mesh/step.1.")
    if levels:
        mesh = refine(mesh, levels)
    mesh = mesh.optimize_for_tpu()
    rng = np.random.default_rng(0)
    n = mesh.num_cells
    print(f"{n} cells, {mesh.num_faces} faces", flush=True)

    orders = (int(args[0]),) if len(args) > 0 else (1, 2)
    bgs = (args[1] == "bg",) if len(args) > 1 else (False, True)
    # Chain lengths scale down with mesh size to keep each timed run in
    # seconds (Δ·step stays ≫ the relay dispatch floor).
    reps_pair = (100, 400) if n < 300_000 else (20, 80)
    for order in orders:
        for bg in bgs:
            dm = mesh.device_arrays(dtype=jnp.float32, banded_gather=bg)
            bcs = {
                L: (far_field_bc if L % 2 else slip_bc)
                for L in range(1, len(dm.face_label_ranges) - 1)
            }
            solver = FvSolver(dm, bcs=bcs, order=order)
            dt = jnp.float32(1e-5)

            def chain(reps):
                def body(_, u):
                    return solver.step(u, dt)

                return jax.jit(lambda u0: lax.fori_loop(0, reps, body, u0))

            def fresh():
                u0 = np.asarray(initial_state(n, dtype=jnp.float32))
                pert = (1.0 + 0.001 * rng.random(u0.shape)).astype(np.float32)
                return jnp.asarray(u0 * pert)

            times = {}
            # 100/400-step chains: Δ = 300 steps ≳ 150 ms even on the fast
            # path — large against the relay dispatch floor (the r4 lesson:
            # short chains gave 2× scatter on the SELL kernel).
            for reps in reps_pair:
                c = chain(reps)
                uw = fresh()
                uw.block_until_ready()
                c(uw).block_until_ready()
                best = np.inf
                for _ in range(3):
                    ut = fresh()
                    ut.block_until_ready()
                    t0 = time.perf_counter()
                    c(ut).block_until_ready()
                    best = min(best, time.perf_counter() - t0)
                times[reps] = best
            s = (times[reps_pair[1]] - times[reps_pair[0]]) / (
                reps_pair[1] - reps_pair[0]
            )
            print(
                f"order={order} banded_gather={bg!s:5s} "
                f"{s * 1e3:9.3f} ms/step",
                flush=True,
            )


if __name__ == "__main__":
    main()
