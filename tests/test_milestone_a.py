"""Milestone A (SURVEY §7 step 5, BASELINE config #1): CG on the 2D Poisson
``div_grad`` operator on the reference's flagship ``step`` mesh — 40,303
nodes / 79,672 triangle cells (``tests/_data/mesh/step.1.node:1``), fp64,
relative tolerance 1e-8 — serial AND partitioned over the 8-virtual-device
mesh.  This is the one path that touches every layer: TetGen reader → mesh
builder → two-point-flux operator assembly → Krylov driver → distributed
partitioning/halo/psum machinery (≙ ``Playground.cpp:116-174``).

Operator forms:
  * ``assemble_laplacian`` — the SYMMETRIC flux form L (SPD up to the
    constant nullspace): the CG-safe config.
  * ``assemble_divgrad`` — the reference's volume-weighted form V⁻¹L
    (``Playground.cpp:116-131``), nonsymmetric on this variable-volume mesh:
    solved with BiCGStab and cross-checked against the CG solution.

Partition invariance at this scale: the matvec is bit-exact per partition
layout, but CG dot products change their SUMMATION GROUPING across P, and at
cond(L) ~ 1e6 with ~2000 iterations the fp64 histories wobble up to ~1e-2
RELATIVE near the 1e-8 tail (the small-mesh suites see ~1e-13 at cond 1e3 —
same mechanism, amplified; CLAUDE.md numerics invariants).  The returned
solutions still agree to ~1e-13.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from stormx.fvm.divgrad import assemble_divgrad, assemble_laplacian
from stormx.mesh import read_tetgen
from stormx.parallel import make_device_mesh, partition_csr, sharded_solve
from stormx.precond import JacobiPreconditioner
from stormx.solvers import SolverOptions, bicgstab, cg, make_operator

STEP_PREFIX = "/root/reference/tests/_data/mesh/step.1."

OPTS = SolverOptions(
    num_iterations=4000, absolute_tolerance=0.0, relative_tolerance=1e-8
)


@pytest.fixture(scope="module")
def step_problem():
    mesh = read_tetgen(STEP_PREFIX)
    L = assemble_laplacian(mesh)
    n = mesh.num_cells
    diag = (np.asarray(L.data) * (np.asarray(L.cols) == np.arange(n)[:, None])).sum(1)
    c = np.asarray(mesh.cell_centers)
    f = np.sin(2 * np.pi * c[:, 0]) * np.cos(2 * np.pi * c[:, 1])
    rhs = mesh.cell_volumes * f
    rhs = rhs - rhs.mean()  # consistency with the constant nullspace
    return mesh, L, diag, rhs


@pytest.fixture(scope="module")
def serial_solution(step_problem):
    mesh, L, diag, rhs = step_problem
    res = cg(
        make_operator(L.matvec),
        jnp.asarray(rhs),
        jnp.zeros(mesh.num_cells),
        precond=JacobiPreconditioner(diag=jnp.asarray(diag)),
        options=OPTS,
    )
    return res


@pytest.mark.slow  # reference-scale (79,672-cell step mesh); --runslow
class TestStepMeshPoisson:
    def test_serial_cg_converges_at_reference_scale(self, step_problem, serial_solution):
        mesh, L, diag, rhs = step_problem
        res = serial_solution
        assert bool(res.converged)
        it = int(res.num_iterations)
        assert 0 < it < 4000
        # CG's reported error is the unpreconditioned ‖r‖₂; verify the
        # TRUE residual of the returned x meets the relative tolerance.
        r = np.asarray(L.matvec(res.x)) - rhs
        assert np.linalg.norm(r) <= 1.1e-8 * np.linalg.norm(rhs)

    @pytest.mark.parametrize("parts", [1, 8])
    def test_partition_invariance_at_scale(self, step_problem, serial_solution, parts):
        mesh, L, diag, rhs = step_problem
        res_s = serial_solution
        res_p = sharded_solve(
            partition_csr(L.to_csr(), parts),
            rhs,
            mesh=make_device_mesh(parts),
            method="cg",
            precond_diag=diag,
            options=OPTS,
        )
        assert bool(res_p.converged)
        # Same iteration count and machine-level solution agreement.
        assert int(res_p.num_iterations) == int(res_s.num_iterations)
        np.testing.assert_allclose(
            np.asarray(res_p.x), np.asarray(res_s.x), atol=1e-11
        )
        # History agreement: tight early (before conditioning amplifies the
        # reduction-grouping difference), bounded (~1e-2 rel) everywhere.
        k = int(res_s.num_iterations)
        hs = np.asarray(res_s.history)[: k + 1]
        hp = np.asarray(res_p.history)[: k + 1]
        rel = np.abs(hp - hs) / hs
        assert np.nanmax(rel[:100]) < 1e-9
        assert np.nanmax(rel) < 2e-2

    def test_cahn_hilliard_app_at_reference_scale(self, step_problem):
        # The reference app's actual workload (Playground.cpp:176-210):
        # implicit Cahn–Hilliard steps on step.1 — each step one CG solve
        # on the matrix-free biharmonic-ish operator over all 79,672 cells.
        from stormx.apps.cahn_hilliard import make_step

        mesh, L, diag, rhs = step_problem
        dmesh = mesh.device_arrays()
        rng = np.random.default_rng(0)
        c = jnp.asarray(0.5 + 0.1 * rng.standard_normal(mesh.num_cells))
        step = make_step(dmesh)
        for _ in range(3):
            c, res = step(c)
            assert bool(res.converged)
        c_np = np.asarray(c)
        assert np.isfinite(c_np).all()
        assert c_np.min() > -0.5 and c_np.max() < 1.5  # stays physical

    def test_ras_ilu_fewer_iterations_than_jacobi(self, step_problem):
        # RAS per-shard block-ILU(0) on the reference-scale operator
        # (BASELINE north star "Jacobi/block-diagonal first, ILU-class
        # later"): distributed BiCGStab must beat Jacobi on iterations.
        # Note RAS histories are partition-count dependent by construction
        # (stormx.parallel.ras docstring).
        mesh, L, diag, rhs = step_problem
        pop = partition_csr(L.to_csr(), 8)
        dmesh8 = make_device_mesh(8)
        r_jac = sharded_solve(pop, rhs, mesh=dmesh8, method="bicgstab",
                              options=OPTS, precond_diag=diag)
        r_ilu = sharded_solve(pop, rhs, mesh=dmesh8, method="bicgstab",
                              options=OPTS, ras="ilu0")
        assert bool(r_jac.converged) and bool(r_ilu.converged)
        assert int(r_ilu.num_iterations) < 0.7 * int(r_jac.num_iterations)
        r = np.asarray(L.matvec(jnp.asarray(np.asarray(r_ilu.x)))) - rhs
        assert np.linalg.norm(r) <= 2e-8 * np.linalg.norm(rhs)

    def test_reference_operator_form_bicgstab(self, step_problem, serial_solution):
        # The reference applies the volume-weighted form V⁻¹L directly
        # (Playground.cpp:116-131).  On this variable-volume mesh that
        # operator is nonsymmetric → BiCGStab; the solution must match the
        # symmetric-form CG solution up to the constant nullspace shift.
        mesh, L, diag, rhs = step_problem
        dg = assemble_divgrad(mesh)  # rows of +∇·∇ (≡ −V⁻¹L)
        rhs2 = -rhs / mesh.cell_volumes
        res = bicgstab(
            make_operator(dg.matvec),
            jnp.asarray(rhs2),
            jnp.zeros(mesh.num_cells),
            precond=JacobiPreconditioner(
                diag=jnp.asarray(-diag / mesh.cell_volumes)
            ),
            options=OPTS,
        )
        assert bool(res.converged)
        x_cg = np.asarray(serial_solution.x)
        x_bi = np.asarray(res.x)
        x_cg = x_cg - x_cg.mean()
        x_bi = x_bi - x_bi.mean()
        np.testing.assert_allclose(x_bi, x_cg, atol=1e-7)
