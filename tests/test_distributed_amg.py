"""Distributed aggregation AMG inside sharded_solve (VERDICT r2 #6).

The contract: a partition-invariant O(n) multilevel preconditioner —
shard-local Jacobi smoothing through the halo-exchanging operator, one psum
per restriction, replicated coarse hierarchy — beating Jacobi on iterations
(and, at the reference scale, on wall-clock, with setup measured in
seconds).
"""

import time

import jax.numpy as jnp
import numpy as np
import pytest

from stormx.fvm.divgrad import assemble_laplacian
from stormx.mesh import read_tetgen
from stormx.mesh.structured import structured_tri_rect
from stormx.parallel import (
    DistributedAmg,
    make_device_mesh,
    partition_csr,
    sharded_solve,
)
from stormx.solvers import SolverOptions

STEP_PREFIX = "/root/reference/tests/_data/mesh/step.1."

OPTS = SolverOptions(
    num_iterations=3000, absolute_tolerance=0.0, relative_tolerance=1e-9
)


def _problem(mesh):
    L = assemble_laplacian(mesh)
    c = np.asarray(mesh.cell_centers)
    rhs = np.sin(2 * np.pi * c[:, 0]) * np.cos(np.pi * c[:, 1])
    rhs = mesh.cell_volumes * rhs
    return L.to_csr(), rhs - rhs.mean(), L


class TestDistributedAmg:
    def test_beats_jacobi_iterations_and_partition_invariant(self):
        mesh = structured_tri_rect(40, 32)  # 2560 cells
        csr, rhs, L = _problem(mesh)
        diag = np.asarray(L.diagonal())
        out = {}
        for parts in (1, 8):
            pop = partition_csr(csr, parts)
            amg = DistributedAmg(csr, pop)
            res = sharded_solve(
                pop, rhs, mesh=make_device_mesh(parts), method="cg",
                amg=amg, options=OPTS,
            )
            assert bool(res.converged), parts
            out[parts] = res
        # Partition invariance: CG histories across P to fp64 rounding.
        k1 = int(out[1].num_iterations)
        assert k1 == int(out[8].num_iterations)
        h1 = np.asarray(out[1].history)[: k1 + 1]
        h8 = np.asarray(out[8].history)[: k1 + 1]
        # The V-cycle's restriction psum regroups summations per apply, so
        # the preconditioner itself differs across P at ~1 ulp per
        # application; CG histories track to ~1e-9 relative (plain-CG psum
        # noise is ~1e-13 — here the perturbation enters the preconditioner
        # too, slightly amplifying the drift).
        np.testing.assert_allclose(h8, h1, rtol=1e-7)
        np.testing.assert_allclose(
            np.asarray(out[8].x), np.asarray(out[1].x), atol=1e-9
        )
        # Multilevel must beat one-level Jacobi on iterations.
        jac = sharded_solve(
            partition_csr(csr, 8), rhs, mesh=make_device_mesh(8),
            method="cg", precond_diag=diag, options=OPTS,
        )
        assert bool(jac.converged)
        assert k1 < 0.5 * int(jac.num_iterations), (
            k1, int(jac.num_iterations)
        )
        # The returned solution really solves the system.
        r = np.asarray(L.matvec(jnp.asarray(np.asarray(out[8].x)))) - rhs
        assert np.linalg.norm(r) <= 5e-9 * np.linalg.norm(rhs)

    def test_amg_excludes_other_preconds(self):
        mesh = structured_tri_rect(8, 8)
        csr, rhs, L = _problem(mesh)
        pop = partition_csr(csr, 4)
        amg = DistributedAmg(csr, pop)
        with pytest.raises(ValueError):
            sharded_solve(
                pop, rhs, mesh=make_device_mesh(4), amg=amg,
                precond_diag=np.asarray(L.diagonal()),
            )

    @pytest.mark.slow
    def test_reference_scale_beats_jacobi_wallclock(self):
        # 79,672-cell step operator: AMG must win on iterations at P=8
        # (measured 153 vs 2076, 13.6×) AND on wall-clock, with setup in
        # seconds (the r2 per-row loops took minutes-to-hours).
        #
        # Wall-clock is asserted at P=1: the 8-VIRTUAL-device CPU mesh makes
        # the replicated coarse hierarchy compete for the same physical
        # cores (8× redundant CPU work that real chips do for free in
        # parallel), so P=8 CPU wall-clock is an artifact of the test
        # harness, not of the design.  P=1 exercises the identical XLA
        # program shape with no oversubscription.
        mesh = read_tetgen(STEP_PREFIX)
        csr, rhs, L = _problem(mesh)
        diag = np.asarray(L.diagonal())

        pop8 = partition_csr(csr, 8)
        t0 = time.perf_counter()
        amg8 = DistributedAmg(csr, pop8)
        setup_s = time.perf_counter() - t0
        assert setup_s < 60.0, f"AMG setup took {setup_s:.1f}s"

        def run(pop, dmesh, **kw):
            res = sharded_solve(
                pop, rhs, mesh=dmesh, method="cg", options=OPTS, **kw
            )
            assert bool(res.converged)
            return res

        dmesh8 = make_device_mesh(8)
        r_amg8 = run(pop8, dmesh8, amg=amg8)
        r_jac8 = run(pop8, dmesh8, precond_diag=diag)
        assert int(r_amg8.num_iterations) < 0.4 * int(r_jac8.num_iterations)

        pop1 = partition_csr(csr, 1)
        amg1 = DistributedAmg(csr, pop1)
        dmesh1 = make_device_mesh(1)
        run(pop1, dmesh1, amg=amg1), run(pop1, dmesh1, precond_diag=diag)
        t0 = time.perf_counter()
        run(pop1, dmesh1, amg=amg1)
        t_amg = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(pop1, dmesh1, precond_diag=diag)
        t_jac = time.perf_counter() - t0
        assert t_amg < t_jac, (t_amg, t_jac)


def _poisson_dia(nx, coupling_y=1.0):
    from stormx.sparse.formats import DIA

    n = nx * nx
    offs = (-nx, -1, 0, 1, nx)
    data = np.zeros((5, n))
    i = np.arange(n)
    data[2] = 2.0 + 2.0 * coupling_y
    for k, off in enumerate(offs):
        if off == 0:
            continue
        j = i + off
        valid = (j >= 0) & (j < n)
        if abs(off) == 1:
            valid &= (i // nx) == (j // nx)
        data[k][valid] = -1.0 if abs(off) == 1 else -coupling_y
    return DIA(data=jnp.asarray(data), offsets=offs, shape=(n, n))


class TestDistributedBlockDiaAmg:
    """Bit-exact distributed block AMG on banded operators.

    Unlike DistributedAmg (whose restriction psum perturbs the V-cycle to
    ~1e-7), every ingredient here is shard-local or an exact collective —
    the invariance contract is plain-CG's ~1e-13.
    """

    def test_partition_invariant_to_plain_cg_contract(self):
        from stormx.parallel import DistributedBlockDiaAmg
        from stormx.parallel.banded import partition_dia, sharded_dia_solve

        dia = _poisson_dia(60)  # 3600 rows: 8*4 alignment pads the tail
        rng = np.random.default_rng(0)
        b = jnp.asarray(rng.standard_normal(dia.shape[0]))
        opts = SolverOptions(
            num_iterations=2000, absolute_tolerance=0.0,
            relative_tolerance=1e-10,
        )
        out = {}
        for parts in (1, 8):
            pdia = partition_dia(dia, parts, align=4)
            amg = DistributedBlockDiaAmg(dia, pdia, group=4)
            res = sharded_dia_solve(
                pdia, b, mesh=make_device_mesh(parts), method="cg",
                options=opts, amg=amg,
            )
            assert bool(res.converged), parts
            out[parts] = res
        k1 = int(out[1].num_iterations)
        assert k1 == int(out[8].num_iterations)
        h1 = np.asarray(out[1].history)[: k1 + 1]
        h8 = np.asarray(out[8].history)[: k1 + 1]
        # No psum inside the V-cycle: only the outer dots regroup.
        np.testing.assert_allclose(h8, h1, rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(out[8].x), np.asarray(out[1].x), atol=1e-11
        )
        r = np.asarray(dia.matvec(jnp.asarray(np.asarray(out[8].x)))) - (
            np.asarray(b)
        )
        assert np.linalg.norm(r) <= 1e-9 * np.linalg.norm(np.asarray(b))

    def test_beats_jacobi_iterations(self):
        from stormx.parallel import DistributedBlockDiaAmg
        from stormx.parallel.banded import partition_dia, sharded_dia_solve

        dia = _poisson_dia(64)
        rng = np.random.default_rng(1)
        b = jnp.asarray(rng.standard_normal(dia.shape[0]))
        opts = SolverOptions(
            num_iterations=4000, absolute_tolerance=0.0,
            relative_tolerance=1e-9,
        )
        pdia = partition_dia(dia, 8, align=2)
        amg = DistributedBlockDiaAmg(dia, pdia, group=2, num_sweeps=2)
        res_a = sharded_dia_solve(
            pdia, b, mesh=make_device_mesh(8), method="cg", options=opts,
            amg=amg,
        )
        d0 = np.asarray(dia.data)[2]
        res_j = sharded_dia_solve(
            pdia, b, mesh=make_device_mesh(8), method="cg", options=opts,
            precond_diag=d0,
        )
        assert bool(res_a.converged) and bool(res_j.converged)
        assert int(res_a.num_iterations) < 0.5 * int(res_j.num_iterations)

    def test_validates_partition_alignment_and_exclusions(self):
        from stormx.parallel import DistributedBlockDiaAmg
        from stormx.parallel.banded import partition_dia, sharded_dia_solve

        dia = _poisson_dia(26)  # n=676 > coarse_size: real hierarchy
        pdia_bad = partition_dia(dia, 8)  # n_loc=85, not a multiple of 4
        with pytest.raises(ValueError, match="align"):
            DistributedBlockDiaAmg(dia, pdia_bad, group=4)
        pdia = partition_dia(dia, 8, align=4)
        amg = DistributedBlockDiaAmg(dia, pdia, group=4)
        with pytest.raises(ValueError, match="excludes"):
            sharded_dia_solve(
                pdia, jnp.ones(dia.shape[0]), mesh=make_device_mesh(8),
                amg=amg, precond_diag=np.asarray(dia.data)[2],
            )
        # built-for-a-different-partition guard
        other = partition_dia(dia, 4, align=4)
        with pytest.raises(ValueError, match="different partition"):
            sharded_dia_solve(
                other, jnp.ones(dia.shape[0]), mesh=make_device_mesh(4),
                amg=amg,
            )
