"""Navier–Stokes projection-step FVM substeps on the step mesh (TPU, f32):
XLA gathers vs the Pallas banded-gather fast path.

Measures the non-solve part of :class:`stormx.apps.navier_stokes
.NsProjection.step` — predictor (LSQ gradients + div_grad viscosity),
face fluxes, flux divergence, flux correction, pressure gradient — with a
FIXED pressure field so the chain is solver-free (the Krylov solve's cost
is covered by scripts/bench_solvers.py and is gather-path-independent).

Slope protocol, 100/400-step chains (Δ ≥ 150 ms — the r4 lesson).

Usage: timeout 560 python scripts/perf_ns_step.py
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
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    import jax.numpy as jnp
    from jax import lax

    from stormx.apps.navier_stokes import (
        NsProjection,
        face_fluxes,
        flux_divergence,
    )
    from stormx.fvm.gradient import lsq_gradients
    from stormx.mesh import read_tetgen

    mesh = read_tetgen("/root/reference/tests/_data/mesh/step.1.").optimize_for_tpu()
    rng = np.random.default_rng(0)
    n = mesh.num_cells

    for bg in (False, True):
        ns = NsProjection(mesh, nu=1e-3, banded_gather=bg)
        dt = jnp.float32(1e-4)

        def substeps(vel, p):
            v_star = ns.predictor(vel, dt)
            flux = face_fluxes(ns.dmesh, v_star)
            div = flux_divergence(ns.dmesh, flux)
            flux_new = ns.correct_fluxes(flux, p + 1e-6 * div, dt)
            grad_p = lsq_gradients(ns.dmesh, p, g_mats=ns._g_mats)
            vel_new = v_star - dt * grad_p
            # fold flux info back so nothing is dead-code-eliminated
            return vel_new + 1e-12 * flux_new[: n].reshape(-1, 1)

        def chain(reps):
            def body(_, carry):
                vel, p = carry
                vel2 = substeps(vel, p)
                return vel2, p * jnp.float32(1.0)

            return jax.jit(
                lambda vel0, p0: lax.fori_loop(0, reps, body, (vel0, p0))[0]
            )

        def fresh():
            return (
                jnp.asarray(rng.standard_normal((n, 2)).astype(np.float32) * 0.01),
                jnp.asarray(rng.standard_normal(n).astype(np.float32) * 0.01),
            )

        times = {}
        for reps in (100, 400):
            c = chain(reps)
            vw, pw = fresh()
            vw.block_until_ready(), pw.block_until_ready()
            c(vw, pw).block_until_ready()
            best = np.inf
            for _ in range(3):
                vt, pt = fresh()
                vt.block_until_ready(), pt.block_until_ready()
                t0 = time.perf_counter()
                c(vt, pt).block_until_ready()
                best = min(best, time.perf_counter() - t0)
            times[reps] = best
        s = (times[400] - times[100]) / 300.0
        print(
            f"NS substeps banded_gather={bg!s:5s} {s * 1e3:9.3f} ms/step",
            flush=True,
        )


if __name__ == "__main__":
    main()
