"""Cahn–Hilliard demo: implicit time stepping via CG on a matrix-free
biharmonic-ish operator over an unstructured mesh.

Reference: ``source_apps/playground/Playground.cpp:111-210`` — 200k forward
steps, each an implicit solve of

    c_hat + τ·∇·∇[ σ·(c_hat − c) − Γ·∇·∇ c_hat ]-ish operator (:151-167)

with f = dF/dc = 2c(c−1)(2c−1) (:142-144), τ = 1e-3, Γ = 1e-4, σ = 2 (:113).
The TPU-native version jit-compiles the ENTIRE step — CG while-loop included
— into one XLA program, so a time step is a single device dispatch instead
of 200k Python-driven face loops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from stormx.fvm.divgrad import div_grad
from stormx.solvers import SolverOptions, cg, make_operator

__all__ = ["dF_dc", "make_step", "make_assembled_step", "run", "TAU", "GAMMA_CH", "SIGMA"]

TAU = 1.0e-3  # Playground.cpp:113
GAMMA_CH = 1.0e-4
SIGMA = 2.0


def dF_dc(c):
    """Double-well potential derivative (Playground.cpp:142-144)."""
    return 2.0 * c * (c - 1.0) * (2.0 * c - 1.0)


def make_step(dmesh, *, tau=TAU, gamma=GAMMA_CH, sigma=SIGMA, options=None):
    """Build the jitted Cahn–Hilliard step c → (c_hat, solve_stats)."""
    opts = options or SolverOptions()

    def step(c):
        f = dF_dc(c)

        def op(c_in):
            # w_hat = f + σ(c_in − c) − Γ·divgrad(c_in) (:157-159)
            w_hat = f + sigma * (c_in - c)
            w_hat = div_grad(dmesh, w_hat, -gamma, c_in)
            # c_hat = c_in − τ·divgrad(w_hat) (:163-166)
            return div_grad(dmesh, c_in, -tau, w_hat)

        # The operator is affine (𝓐(0) = τ·divgrad-image of f − σc ≠ 0), so
        # uniformize before CG per the reference's own mechanism
        # (solve_non_uniform, Solver.hpp:271-292): solve [𝓐(x) − 𝓐(0)] = c − 𝓐(0).
        z = op(jnp.zeros_like(c))
        res = cg(make_operator(lambda x: op(x) - z), c - z, c, options=opts)
        return res.x, res

    return jax.jit(step)


def make_assembled_step(mesh, *, tau=TAU, gamma=GAMMA_CH, sigma=SIGMA,
                        options=None, dtype=None):
    """Assembled-operator Cahn–Hilliard step: the linear part
    ``A = I − τσ·D + τγ·D²`` (D = volume-weighted div-grad) is assembled
    ONCE per mesh (``ell_spgemm``/``ell_add``) and served through
    ``auto_operator`` — on TPU that is the Pallas window-gather path at
    ~10 Gnnz/s, vs re-evaluating two nested matrix-free FVM gathers
    (~0.15 G gathered elements/s) every CG iteration.

    Numerically the same affine solve as :func:`make_step` (the reference's
    ``solve_non_uniform`` mechanism): histories agree to operator-evaluation
    roundoff, not bit-exactly.
    """
    import numpy as np

    from stormx.fvm.divgrad import assemble_divgrad
    from stormx.sparse.formats import ell_add, ell_spgemm
    from stormx.sparse.windowed import auto_operator

    opts = options or SolverOptions()
    D = assemble_divgrad(mesh)
    D2 = ell_spgemm(D, D)
    A = ell_add(
        [(1.0, None), (-tau * sigma, D), (tau * gamma, D2)],
        (mesh.num_cells, mesh.num_cells),
    )
    if dtype is not None:
        from stormx.sparse.formats import CSR

        A = CSR(
            data=jnp.asarray(np.asarray(A.data, dtype=dtype)),
            indices=A.indices, row_ptr=A.row_ptr, shape=A.shape,
        )
    op, perm = auto_operator(A, coords=np.asarray(mesh.cell_centers))
    inv = np.argsort(perm)
    perm_j, inv_j = jnp.asarray(perm), jnp.asarray(inv)
    dmesh = mesh.device_arrays(dtype=dtype)

    def step(c):
        f = dF_dc(c)
        # Affine constant 𝓐(0) = −τ·D(f − σc) evaluated matrix-free (one
        # divgrad — cheap next to the Krylov loop).
        z = div_grad(dmesh, jnp.zeros_like(c), -tau, f - sigma * c)
        rhs = (c - z)[perm_j]
        res = cg(
            make_operator(lambda x: op.matvec(x)), rhs, c[perm_j], options=opts
        )
        return res.x[inv_j], res

    return jax.jit(step)


def run(
    dmesh,
    c0,
    num_steps: int,
    *,
    mesh=None,
    output_every: int | None = None,
    output_dir: str = ".",
    checkpointer=None,
    start_step: int = 0,
    assembled: bool = False,
    **kw,
):
    """Time loop (Playground.cpp:187-209); returns the final concentration.

    Mirrors the Playground driver's side channels: ``output_every`` writes
    ``out_cahn_hilliard_<k>.vtk`` snapshots (≙ ``save_vtk``, :66-109,207-208
    — needs ``mesh``), and a :class:`stormx.io.Checkpointer` makes the run
    restartable (``start_step`` resumes counting).

    ``assembled=True`` (needs ``mesh``) solves through the once-assembled
    operator — measured 57× faster per step on TPU (59 vs 3370 ms on the
    reference step mesh; BENCH_NOTES.md).
    """
    if assembled:
        if mesh is None:
            raise ValueError("assembled=True needs the host mesh")
        step = make_assembled_step(mesh, **kw)
    else:
        step = make_step(dmesh, **kw)
    c = c0
    for k in range(start_step, start_step + num_steps):
        c, _ = step(c)
        if output_every and mesh is not None and (k + 1) % output_every == 0:
            import os

            from stormx.io import write_vtk

            write_vtk(
                mesh,
                os.path.join(output_dir, f"out_cahn_hilliard_{k + 1}.vtk"),
                {"c": c},
            )
        if checkpointer is not None:
            checkpointer.maybe_save(k + 1, {"c": c, "step": k + 1})
    return c


def main(mesh_prefix: str, num_steps: int = 200, seed: int = 0):
    """Playground ``main`` analog: load mesh, random init, march, snapshot."""
    import numpy as np

    from stormx.core import print_banner
    from stormx.mesh import read_tetgen

    print_banner()
    mesh = read_tetgen(mesh_prefix)
    dmesh = mesh.device_arrays()
    rng = np.random.default_rng(seed)
    c0 = jnp.asarray(0.5 + 0.1 * rng.standard_normal(mesh.num_cells))
    return run(
        dmesh, c0, num_steps, mesh=mesh, assembled=True,
        output_every=max(1, num_steps // 10),
    )
