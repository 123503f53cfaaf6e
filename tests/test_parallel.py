"""Distribution-layer tests on the 8-virtual-device CPU mesh.

The oracle (SURVEY §4 "Multi-node testing"): the convergence history of an
N-partition solve must match the 1-partition / serial history to fp64
tolerance — partitioning is a layout change, not an algorithm change.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stormx.parallel import (
    make_device_mesh,
    partition_csr,
    partition_vector,
    rcm_order,
    sharded_matvec,
    sharded_solve,
    unpartition_vector,
)
from stormx.solvers import SolverOptions, make_operator, solve
from stormx.sparse import CSR

from conftest import make_nonsym_matrix, make_spd_matrix


def dense_to_csr(a):
    rows, cols = np.nonzero(a)
    data = a[rows, cols]
    n = a.shape[0]
    row_ptr = np.zeros(n + 1, dtype=np.int32)
    np.add.at(row_ptr, rows + 1, 1)
    return CSR(
        data=jnp.asarray(data),
        indices=jnp.asarray(cols.astype(np.int32)),
        row_ptr=jnp.asarray(np.cumsum(row_ptr).astype(np.int32)),
        shape=(n, n),
    )


@pytest.fixture(scope="module")
def spd_problem():
    rng = np.random.default_rng(7)
    n = 96
    a = make_spd_matrix(n, rng, density=0.06)
    a[np.abs(a) < 1e-12] = 0.0
    b = rng.standard_normal(n)
    return a, dense_to_csr(a), b


def test_rcm_is_permutation():
    rng = np.random.default_rng(3)
    n = 50
    rows = rng.integers(0, n, 300)
    cols = rng.integers(0, n, 300)
    order = rcm_order(n, rows, cols)
    assert sorted(order.tolist()) == list(range(n))


@pytest.mark.parametrize("num_parts", [1, 2, 4, 8])
def test_partitioned_matvec_matches_dense(spd_problem, num_parts):
    a, csr, _ = spd_problem
    x = np.random.default_rng(1).standard_normal(a.shape[0])
    pop = partition_csr(csr, num_parts)
    mv = sharded_matvec(pop, make_device_mesh(num_parts))
    y = unpartition_vector(pop, mv(partition_vector(pop, x)))
    np.testing.assert_allclose(y, a @ x, rtol=1e-12, atol=1e-10)


def test_partition_vector_roundtrip(spd_problem):
    _, csr, b = spd_problem
    pop = partition_csr(csr, 4)
    np.testing.assert_array_equal(unpartition_vector(pop, partition_vector(pop, b)), b)


@pytest.mark.parametrize("num_parts", [2, 8])
def test_sharded_cg_matches_serial_history(spd_problem, num_parts):
    a, csr, b = spd_problem
    serial = solve(make_operator(csr.matvec), jnp.asarray(b), method="cg")
    res = sharded_solve(partition_csr(csr, num_parts), b, method="cg")
    assert bool(res.converged)
    assert int(res.num_iterations) == int(serial.num_iterations)
    hs = np.asarray(serial.history)
    hp = np.asarray(res.history)
    k = int(serial.num_iterations) + 1
    np.testing.assert_allclose(hp[:k], hs[:k], rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(res.x), np.linalg.solve(a, b), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("method", ["bicgstab", "gmres", "tfqmr", "idrs", "lgmres", "cgs"])
def test_sharded_nonsymmetric_solvers(method):
    rng = np.random.default_rng(11)
    n = 64
    a = make_nonsym_matrix(n, rng)
    a[(np.abs(a) < 0.4) & ~np.eye(n, dtype=bool)] = 0.0
    b = rng.standard_normal(n)
    res = sharded_solve(partition_csr(dense_to_csr(a), 4), b, method=method)
    assert bool(res.converged)
    np.testing.assert_allclose(
        np.asarray(res.x), np.linalg.solve(a, b), rtol=1e-4, atol=1e-5
    )


def test_sharded_jacobi_preconditioner(spd_problem):
    a, csr, b = spd_problem
    plain = sharded_solve(partition_csr(csr, 4), b, method="cg")
    pre = sharded_solve(partition_csr(csr, 4), b, method="cg", precond_diag=np.diag(a))
    assert bool(pre.converged)
    assert int(pre.num_iterations) <= int(plain.num_iterations)
    np.testing.assert_allclose(
        np.asarray(pre.x), np.linalg.solve(a, b), rtol=1e-5, atol=1e-6
    )


def test_partition_invariance_across_counts(spd_problem):
    """2-part and 8-part histories agree to fp64 tolerance (BASELINE.md)."""
    _, csr, b = spd_problem
    hists = {}
    for p in (2, 8):
        res = sharded_solve(partition_csr(csr, p), b, method="cg")
        h = np.asarray(res.history)
        hists[p] = h[~np.isnan(h)]
    assert len(hists[2]) == len(hists[8])
    np.testing.assert_allclose(hists[2], hists[8], rtol=1e-10)


class TestNativeHostRuntime:
    """The C++ host runtime (stormx._native) vs the NumPy fallbacks."""

    def _adjacency_case(self):
        rng = np.random.default_rng(13)
        n = 120
        rows = rng.integers(0, n, 500)
        cols = rng.integers(0, n, 500)
        return n, rows, cols

    def test_native_lib_builds(self):
        from stormx._native import load_hostrt

        assert load_hostrt() is not None, "g++ build of hostrt.cpp failed"

    def test_native_rcm_matches_python(self):
        from stormx.parallel.partition import _csr_adjacency, _rcm_python
        from stormx._native import native_rcm_order

        n, rows, cols = self._adjacency_case()
        ptr, c, deg = _csr_adjacency(n, rows, cols)
        native = native_rcm_order(ptr, c)
        assert native is not None
        np.testing.assert_array_equal(native, _rcm_python(n, ptr, c, deg))

    def test_native_bfs_matches_python(self):
        from stormx.parallel.partition import _bfs_partition_python, _csr_adjacency
        from stormx._native import native_bfs_partition

        n, rows, cols = self._adjacency_case()
        ptr, c, deg = _csr_adjacency(n, rows, cols)
        for k in (2, 3, 8):
            native = native_bfs_partition(ptr, c, k)
            assert native is not None
            np.testing.assert_array_equal(
                native, _bfs_partition_python(n, ptr, c, deg, k)
            )

    def test_bfs_partition_balanced(self):
        from stormx.parallel import bfs_partition

        # 2D grid graph: parts must be balanced and boundaries thin.
        nx = 16
        n = nx * nx
        idx = np.arange(n)
        i, j = idx // nx, idx % nx
        r = np.concatenate([idx[i < nx - 1], idx[j < nx - 1]])
        c = np.concatenate([idx[i < nx - 1] + nx, idx[j < nx - 1] + 1])
        part = bfs_partition(n, r, c, 4)
        sizes = np.bincount(part, minlength=4)
        assert sizes.max() <= -(-n // 4)
        assert sizes.min() >= n // 4 - 1
        # Edge cut should be far below the total edge count.
        cut = int(np.sum(part[r] != part[c]))
        assert cut < len(r) // 4


@pytest.mark.parametrize("method", ["rcm-blocks", "bfs"])
def test_partition_methods_invariant_history(spd_problem, method):
    """Both layout methods reproduce the serial convergence history."""
    a, csr, b = spd_problem
    serial = solve(make_operator(csr.matvec), jnp.asarray(b), method="cg")
    res = sharded_solve(partition_csr(csr, 4, method=method), b, method="cg")
    assert bool(res.converged)
    hs = np.asarray(serial.history)
    hp = np.asarray(res.history)
    k = int(serial.num_iterations) + 1
    np.testing.assert_allclose(hp[:k], hs[:k], rtol=1e-10)


def test_bfs_method_matvec(spd_problem):
    a, csr, _ = spd_problem
    x = np.random.default_rng(2).standard_normal(a.shape[0])
    pop = partition_csr(csr, 4, method="bfs")
    mv = sharded_matvec(pop, make_device_mesh(4))
    y = unpartition_vector(pop, mv(partition_vector(pop, x)))
    np.testing.assert_allclose(y, a @ x, rtol=1e-12, atol=1e-10)


class TestBandedDistributed:
    """ppermute-halo DIA operator: the neighbor-exchange fast path."""

    def _poisson_dia(self, nx):
        from stormx.sparse import DIA

        n = nx * nx
        i = np.arange(n) // nx
        j = np.arange(n) % nx
        data = np.zeros((5, n))
        data[0] = np.where(i > 0, -1.0, 0.0)
        data[1] = np.where(j > 0, -1.0, 0.0)
        data[2] = 4.0
        data[3] = np.where(j < nx - 1, -1.0, 0.0)
        data[4] = np.where(i < nx - 1, -1.0, 0.0)
        return DIA(data=jnp.asarray(data), offsets=(-nx, -1, 0, 1, nx), shape=(n, n))

    @pytest.mark.parametrize("p", [2, 4, 8])
    def test_matvec_exact(self, p, rng):
        from stormx.parallel import partition_dia

        dia = self._poisson_dia(16)
        n = dia.shape[0]
        pdia = partition_dia(dia, p)
        x = rng.standard_normal(n)
        y_ref = np.asarray(dia @ jnp.asarray(x))

        mesh = make_device_mesh(p)
        from jax.sharding import PartitionSpec as P

        local = pdia.local_matvec("parts")
        mv = jax.jit(
            jax.shard_map(
                lambda xl, dl: local(xl[0], dl[0])[None],
                mesh=mesh,
                in_specs=(P("parts"), P("parts")),
                out_specs=P("parts"),
            )
        )
        xp = np.zeros(p * pdia.n_loc)
        xp[:n] = x
        y = np.asarray(mv(jnp.asarray(xp.reshape(p, -1)), pdia.data)).reshape(-1)[:n]
        np.testing.assert_array_equal(y, y_ref)  # bit-exact

    def test_cg_matches_serial(self):
        from stormx.parallel import partition_dia, sharded_dia_solve
        from stormx.solvers import make_operator, solve

        dia = self._poisson_dia(16)
        n = dia.shape[0]
        b = np.ones(n)
        serial = solve(make_operator(dia.matvec), jnp.asarray(b), method="cg")
        res = sharded_dia_solve(
            partition_dia(dia, 8), b, mesh=make_device_mesh(8), method="cg"
        )
        assert bool(res.converged)
        assert int(res.num_iterations) == int(serial.num_iterations)
        hs = np.asarray(serial.history)
        hp = np.asarray(res.history)
        k = int(serial.num_iterations) + 1
        np.testing.assert_allclose(hp[:k], hs[:k], rtol=1e-10)

    def test_halo_too_wide_raises(self):
        from stormx.parallel import partition_dia

        dia = self._poisson_dia(16)  # h = 16, n_loc at P=32 would be 8
        with pytest.raises(ValueError, match="halo"):
            partition_dia(dia, 32)

    @pytest.mark.parametrize("p", [2, 4, 8])
    def test_overlap_bit_identical(self, p, rng):
        """Interior/boundary split (ppermutes overlap interior FMA streams)
        must be bit-identical to the plain concat-then-slice path."""
        import jax
        from jax.sharding import PartitionSpec as PS
        from stormx.parallel import partition_dia

        dia = self._poisson_dia(16)
        n = dia.shape[0]
        pdia = partition_dia(dia, p)
        mesh = make_device_mesh(p)
        xp = np.zeros(p * pdia.n_loc)
        xp[:n] = rng.standard_normal(n)
        xp = jnp.asarray(xp.reshape(p, -1))
        ys = {}
        for overlap in (False, True):
            local = pdia.local_matvec("parts", overlap=overlap)
            mv = jax.jit(
                jax.shard_map(
                    lambda xl, dl: local(xl[0], dl[0])[None],
                    mesh=mesh,
                    in_specs=(PS("parts"), PS("parts")),
                    out_specs=PS("parts"),
                )
            )
            ys[overlap] = np.asarray(mv(xp, pdia.data))
        np.testing.assert_array_equal(ys[True], ys[False])


class TestShardedPreconditioner:
    """General shard-safe preconditioners inside sharded_solve."""

    def _problem(self, nx=16):
        n = nx * nx
        idx = np.arange(n)
        i, j = idx // nx, idx % nx
        rows, cols, vals = [idx], [idx], [np.full(n, 4.0)]
        for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            ii, jj = i + di, j + dj
            m = (ii >= 0) & (ii < nx) & (jj >= 0) & (jj < nx)
            rows.append(idx[m]); cols.append((ii * nx + jj)[m])
            vals.append(np.full(int(m.sum()), -1.0))
        rows = np.concatenate(rows); cols = np.concatenate(cols)
        vals = np.concatenate(vals)
        order = np.lexsort((cols, rows))
        rows, cols, vals = rows[order], cols[order], vals[order]
        rp = np.zeros(n + 1, dtype=np.int64); np.add.at(rp, rows + 1, 1)
        csr = CSR(
            data=jnp.asarray(vals),
            indices=jnp.asarray(cols.astype(np.int32)),
            row_ptr=jnp.asarray(np.cumsum(rp).astype(np.int32)),
            shape=(n, n),
        )
        b = np.random.default_rng(5).standard_normal(n)
        return csr, b

    @pytest.mark.slow
    def test_chebyshev_partition_invariant_and_faster(self):
        from stormx.precond import ChebyshevPreconditioner

        csr, b = self._problem()
        opts = SolverOptions(
            num_iterations=400, absolute_tolerance=1e-10, relative_tolerance=1e-10
        )

        def run(p, pre):
            return sharded_solve(
                partition_csr(csr, p), b, method="cg", options=opts, precond=pre
            )

        def make_pre():
            # Explicit bounds → no build-phase estimation → shard-safe and
            # partition-independent.
            return ChebyshevPreconditioner(degree=6, lambda_max=8.0, ratio=50.0)

        plain = sharded_solve(partition_csr(csr, 4), b, method="cg", options=opts)
        r1 = run(1, make_pre())
        r8 = run(8, make_pre())
        assert bool(r8.converged)
        assert int(r8.num_iterations) < int(plain.num_iterations)
        # Partition invariance of the preconditioned history.
        h1, h8 = np.asarray(r1.history), np.asarray(r8.history)
        k = int(r1.num_iterations)
        np.testing.assert_allclose(h8[: k + 1], h1[: k + 1], rtol=1e-10)
        # True solution.
        r = np.asarray(csr.matvec(r8.x)) - b
        assert np.abs(r).max() < 1e-8

    def test_krylov_precond_sharded_fgmres(self):
        from stormx.precond import KrylovPreconditioner

        csr, b = self._problem()
        opts = SolverOptions(
            num_iterations=200, absolute_tolerance=1e-9, relative_tolerance=1e-9
        )
        pre = KrylovPreconditioner(method="cg", num_iterations=6)
        res = sharded_solve(
            partition_csr(csr, 4), b, method="fgmres", options=opts, precond=pre
        )
        assert bool(res.converged)
        r = np.asarray(csr.matvec(res.x)) - b
        assert np.abs(r).max() < 1e-7

    @pytest.mark.slow
    def test_ras_ilu_beats_jacobi(self):
        """RAS block-ILU(0)/SGS (BASELINE north star 'ILU-class later'):
        distributed BiCGStab with per-shard ILU(0) must converge in
        measurably fewer iterations than Jacobi — and, unlike every other
        stormx preconditioner, its history DEPENDS on the partition count
        (coupling dropped at partition boundaries): expected and
        documented."""
        csr, b = self._problem(nx=24)
        opts = SolverOptions(
            num_iterations=400, absolute_tolerance=1e-9, relative_tolerance=1e-9
        )
        diag = np.asarray(csr.data)[
            np.asarray(csr.indices)
            == np.repeat(np.arange(csr.shape[0]), np.diff(np.asarray(csr.row_ptr)))
        ]
        iters = {}
        for parts in (2, 4):
            pop = partition_csr(csr, parts)
            mesh = make_device_mesh(parts)
            r_jac = sharded_solve(pop, b, mesh=mesh, method="bicgstab",
                                  options=opts, precond_diag=diag)
            r_ilu = sharded_solve(pop, b, mesh=mesh, method="bicgstab",
                                  options=opts, ras="ilu0")
            assert bool(r_jac.converged) and bool(r_ilu.converged)
            assert int(r_ilu.num_iterations) < int(r_jac.num_iterations)
            x = np.asarray(r_ilu.x)
            assert np.abs(np.asarray(csr.matvec(x)) - b).max() < 1e-7
            iters[parts] = int(r_ilu.num_iterations)
            # SGS blocks of the SPD operator stay SPD → CG-safe.
            r_sgs = sharded_solve(pop, b, mesh=mesh, method="cg",
                                  options=opts, ras="sgs")
            assert bool(r_sgs.converged)
            assert np.abs(
                np.asarray(csr.matvec(np.asarray(r_sgs.x))) - b
            ).max() < 1e-7
        # Partition-count sensitivity: more parts → weaker coupling.
        assert iters[4] >= iters[2]

    def test_overlap_bit_identical(self):
        """Halo/compute overlap (BASELINE north star; SURVEY §5): the
        interior/boundary row split must be BIT-IDENTICAL to the plain
        collective-then-compute path — per-row summation order is
        preserved, only the schedulable dependence structure changes."""
        import jax
        from jax.sharding import PartitionSpec as PS

        csr, b = self._problem()
        for parts in (2, 4, 8):
            pop = partition_csr(csr, parts)
            mesh = make_device_mesh(parts)
            xp = partition_vector(pop, b)
            y_plain = np.asarray(sharded_matvec(pop, mesh, overlap=False)(xp))
            y_over = np.asarray(sharded_matvec(pop, mesh, overlap=True)(xp))
            np.testing.assert_array_equal(y_over, y_plain)
            # Whole solves: the two variants are different XLA programs, so
            # reduction FUSION inside the CG loop may differ (XLA only
            # guarantees determinism within one compiled program) — assert
            # fp64-tolerance history/solution equality, not bitwise.
            # Disable early exit so both runs execute the same fixed
            # iteration count (a tolerance-crossing flip would misalign the
            # NaN-padded histories).
            opts = SolverOptions(
                num_iterations=40, absolute_tolerance=0.0, relative_tolerance=0.0
            )
            r0 = sharded_solve(pop, b, mesh=mesh, method="cg",
                               options=opts, overlap=False)
            r1 = sharded_solve(pop, b, mesh=mesh, method="cg",
                               options=opts, overlap=True)
            np.testing.assert_allclose(
                np.asarray(r1.x), np.asarray(r0.x), rtol=1e-10, atol=1e-12
            )
            np.testing.assert_allclose(
                np.asarray(r1.history), np.asarray(r0.history), rtol=1e-8
            )

    def test_sharded_solve_does_not_mutate_preconditioner(self):
        """Regression: sharded_solve used to set pre._axis_name in place, so
        reusing the same instance in a later SERIAL solve psum'd outside any
        shard_map and failed."""
        from stormx.precond import KrylovPreconditioner
        from stormx.solvers import fgmres, make_operator

        csr, b = self._problem()
        opts = SolverOptions(
            num_iterations=200, absolute_tolerance=1e-9, relative_tolerance=1e-9
        )
        pre = KrylovPreconditioner(method="cg", num_iterations=6)
        sharded_solve(
            partition_csr(csr, 4), b, method="fgmres", options=opts, precond=pre
        )
        assert pre._axis_name is None
        # The same instance must still work serially afterwards.
        res = fgmres(
            make_operator(csr.matvec), jnp.asarray(b),
            jnp.zeros(len(b)), precond=pre, options=opts,
        )
        assert bool(res.converged)


class TestShardedFvMarch:
    """Distributed explicit Euler march == serial march (fp64 oracle)."""

    @pytest.mark.slow
    def test_matches_serial_trajectory(self):
        import __graft_entry__ as g
        from stormx.apps.euler import initial_state
        from stormx.fvm.bc import far_field_bc, slip_bc
        from stormx.fvm.solver import FvSolver
        from stormx.parallel import partition_fv, sharded_fv_march

        mesh = g._structured_tri_mesh(6, 5)  # 60 cells — ragged over 8 parts
        dmesh = mesh.device_arrays()
        rng = np.random.default_rng(2)
        u0 = np.array(initial_state(mesh.num_cells))
        u0[:, 0] += 0.1 * rng.random(mesh.num_cells)  # perturb density
        u0 = jnp.asarray(u0)
        bcs = {1: slip_bc}
        dt, steps = 1e-3, 20

        for order in (1, 2):
            serial = FvSolver(dmesh, order=order, bcs=bcs).march(u0, dt, steps)
            for parts in (1, 4, 8):
                pfv = partition_fv(dmesh, parts)
                dist = sharded_fv_march(pfv, u0, dt, steps, bcs=bcs, order=order)
                np.testing.assert_allclose(
                    np.asarray(dist), np.asarray(serial), atol=1e-12,
                    err_msg=f"P={parts} order={order}",
                )

    def test_hllc_distributed(self):
        import __graft_entry__ as g
        from stormx.apps.euler import initial_state
        from stormx.fvm.bc import far_field_bc
        from stormx.fvm.flux import hllc_flux
        from stormx.fvm.solver import FvSolver
        from stormx.parallel import partition_fv, sharded_fv_march

        mesh = g._structured_tri_mesh(4, 4)
        dmesh = mesh.device_arrays()
        u0 = initial_state(mesh.num_cells)
        bcs = {1: far_field_bc}
        serial = FvSolver(dmesh, order=1, bcs=bcs, flux_scheme=hllc_flux).march(
            u0, 1e-3, 10
        )
        pfv = partition_fv(dmesh, 4)
        dist = sharded_fv_march(
            pfv, u0, 1e-3, 10, bcs=bcs, flux_scheme=hllc_flux
        )
        np.testing.assert_allclose(np.asarray(dist), np.asarray(serial), atol=1e-12)


class TestSlicedDistributed:
    """Distributed windowed unstructured SpMV: ppermute band halos
    (overlapped) + per-shard MXU windows (stormx.parallel.sliced)."""

    def _operator(self):
        from stormx.fvm.divgrad import assemble_laplacian
        from stormx.mesh import structured_tri_rect

        mesh = structured_tri_rect(13, 11)  # 286 cells
        ell = assemble_laplacian(mesh)
        # Shift off the constant nullspace so CG tolerances are clean.
        data = np.asarray(ell.data).copy()
        cols = np.asarray(ell.cols)
        rows = np.arange(ell.shape[0])[:, None]
        data[(cols == rows) & (np.abs(data) > 0)] += 0.1
        from stormx.sparse import ELL

        return ELL(data=jnp.asarray(data), cols=ell.cols, shape=ell.shape)

    @pytest.mark.parametrize("p", [2, 4, 8])
    @pytest.mark.parametrize("overlap", [False, True])
    def test_matvec_matches_oracle(self, p, overlap, rng):
        from jax.sharding import PartitionSpec as PS
        from stormx.parallel import partition_sliced
        from stormx.parallel.sliced import _partition_vec, _unpartition_vec

        ell = self._operator()
        n = ell.shape[0]
        ps = partition_sliced(ell.to_csr(), p)
        x = rng.standard_normal(n)
        y_ref = np.asarray(ell.matvec(jnp.asarray(x)))
        mesh = make_device_mesh(p)
        local = ps.local_matvec("parts", overlap=overlap)
        mv = jax.jit(
            jax.shard_map(
                lambda xl, bl: local(xl[0], bl[0])[None],
                mesh=mesh,
                in_specs=(PS("parts"), PS("parts")),
                out_specs=PS("parts"),
            )
        )
        y = np.asarray(
            _unpartition_vec(ps, mv(_partition_vec(ps, x), ps.dense_blocks))
        )
        np.testing.assert_allclose(y, y_ref, atol=1e-12)

    def test_overlap_matches_plain(self, rng):
        from jax.sharding import PartitionSpec as PS
        from stormx.parallel import partition_sliced
        from stormx.parallel.sliced import _partition_vec

        ell = self._operator()
        ps = partition_sliced(ell.to_csr(), 4)
        xp = _partition_vec(ps, rng.standard_normal(ell.shape[0]))
        mesh = make_device_mesh(4)
        ys = {}
        for overlap in (False, True):
            local = ps.local_matvec("parts", overlap=overlap)
            mv = jax.jit(
                jax.shard_map(
                    lambda xl, bl, local=local: local(xl[0], bl[0])[None],
                    mesh=mesh,
                    in_specs=(PS("parts"), PS("parts")),
                    out_specs=PS("parts"),
                )
            )
            ys[overlap] = np.asarray(mv(xp, ps.dense_blocks))
        np.testing.assert_allclose(ys[True], ys[False], rtol=1e-13, atol=1e-15)

    @pytest.mark.parametrize("p", [1, 4, 8])
    def test_cg_matches_serial_history(self, p, rng):
        from stormx.parallel import partition_sliced, sharded_sliced_solve
        from stormx.solvers import make_operator, solve

        ell = self._operator()
        n = ell.shape[0]
        b = rng.standard_normal(n)
        opts = SolverOptions(
            num_iterations=500, absolute_tolerance=1e-10, relative_tolerance=1e-10
        )
        serial = solve(make_operator(ell.matvec), jnp.asarray(b),
                       method="cg", options=opts)
        ps = partition_sliced(ell.to_csr(), p)
        res = sharded_sliced_solve(
            ps, b, mesh=make_device_mesh(p), method="cg", options=opts
        )
        assert bool(res.converged)
        assert int(res.num_iterations) == int(serial.num_iterations)
        k = int(serial.num_iterations)
        np.testing.assert_allclose(
            np.asarray(res.history)[: k + 1],
            np.asarray(serial.history)[: k + 1], rtol=1e-9,
        )
        np.testing.assert_allclose(
            np.asarray(res.x), np.asarray(serial.x), atol=1e-9
        )


class TestSlicedPallasDistributed:
    """mode='pallas' distributed SlicedELL: O(nnz) sharded operator state,
    per-shard window-gather kernel (interpret on CPU), same halos/psums.
    Contract: matvec matches the serial ELL oracle and solve histories
    match the dense mode bit-for-bit in structure (same halo math)."""

    def _f32_csr(self):
        from stormx.fvm.divgrad import assemble_laplacian
        from stormx.mesh import structured_tri_rect
        from stormx.sparse.formats import CSR

        mesh = structured_tri_rect(40, 32)  # 2560 cells
        csr = assemble_laplacian(mesh).to_csr()
        data = np.asarray(csr.data, dtype=np.float32).copy()
        # Shift the diagonal off the constant nullspace.
        rows = np.repeat(
            np.arange(csr.shape[0]), np.diff(np.asarray(csr.row_ptr))
        )
        data[np.asarray(csr.indices) == rows] += 0.1
        return CSR(
            data=jnp.asarray(data),
            indices=csr.indices,
            row_ptr=csr.row_ptr,
            shape=csr.shape,
        )

    @pytest.mark.parametrize("p", [2, 4])
    def test_matvec_matches_dense_mode(self, p, rng):
        from jax.sharding import PartitionSpec as PS
        from stormx.parallel import make_device_mesh, partition_sliced
        from stormx.parallel.sliced import _partition_vec, _unpartition_vec

        csr = self._f32_csr()
        n = csr.shape[0]
        x = rng.standard_normal(n).astype(np.float32)
        mesh = make_device_mesh(p)
        ys = {}
        for mode in ("dense", "pallas"):
            ps = partition_sliced(csr, p, mode=mode, block_rows=128)
            assert ps.mode == mode
            local = ps.local_matvec("parts")
            n_op = len(ps.op_arrays())
            mv = jax.jit(
                jax.shard_map(
                    lambda xl, *ops: local(xl[0], *(o[0] for o in ops))[None],
                    mesh=mesh,
                    in_specs=tuple([PS("parts")] * (1 + n_op)),
                    out_specs=PS("parts"),
                    check_vma=False,
                )
            )
            ys[mode] = np.asarray(
                _unpartition_vec(
                    ps, mv(_partition_vec(ps, jnp.asarray(x)), *ps.op_arrays())
                )
            )
        scale = np.abs(ys["dense"]).max()
        np.testing.assert_allclose(ys["pallas"], ys["dense"], atol=2e-6 * scale)
        # pallas mode must not materialize dense windows.
        ps = partition_sliced(csr, p, mode="pallas", block_rows=128)
        assert ps.dense_blocks is None and ps.ell_data is not None

    def test_solve_matches_dense_mode(self, rng):
        from stormx.parallel import (
            make_device_mesh,
            partition_sliced,
            sharded_sliced_solve,
        )
        from stormx.solvers import SolverOptions

        csr = self._f32_csr()
        n = csr.shape[0]
        b = rng.standard_normal(n).astype(np.float32)
        opts = SolverOptions(
            num_iterations=400, absolute_tolerance=0.0, relative_tolerance=1e-5
        )
        mesh = make_device_mesh(4)
        res = {}
        for mode in ("dense", "pallas"):
            ps = partition_sliced(csr, 4, mode=mode, block_rows=128)
            res[mode] = sharded_sliced_solve(ps, b, mesh=mesh, options=opts)
            assert bool(res[mode].converged), mode
        k = int(res["dense"].num_iterations)
        assert abs(int(res["pallas"].num_iterations) - k) <= 2
        np.testing.assert_allclose(
            np.asarray(res["pallas"].x), np.asarray(res["dense"].x),
            atol=5e-5 * np.abs(np.asarray(res["dense"].x)).max(),
        )


class TestCommunicationVolume:
    """Exact bytes-moved-per-apply from partition metadata (VERDICT r3
    item 6 — the single-chip proxy for BASELINE's scaling-efficiency
    target).  Halo paths must move O(boundary) per link independent of P;
    pool paths must keep the shared set O(boundary), not O(n)."""

    def _mesh_operator(self):
        from stormx.fvm import assemble_convection_diffusion
        from stormx.mesh.structured import structured_tri_rect

        mesh = structured_tri_rect(40, 40)

        def vel(r):
            c = r - 0.5
            return np.stack([-c[:, 1] - 0.4, c[:, 0] + 0.8], axis=1)

        return assemble_convection_diffusion(mesh, vel, 0.05).to_csr()

    def test_halo_paths_move_constant_per_link(self):
        from stormx.parallel.commvol import dia_halo_volume, sliced_band_volume
        from stormx.parallel.banded import partition_dia
        from stormx.parallel.sliced import partition_sliced
        from stormx.sparse.formats import dia_from_csr

        csr = self._mesh_operator()
        per_link = []
        for P in (2, 4, 8):
            rep = sliced_band_volume(partition_sliced(csr, P, mode="dense"))
            per_link.append(rep["moved_elems"] / (P - 1))
        # one halo strip per link, width set by the band alone → constant
        assert max(per_link) == min(per_link)

        from conftest import make_spd_matrix

        # banded operator for the DIA path
        n = 4096
        diags = {0: 4.0, 1: -1.0, -1: -1.0, 64: -0.5, -64: -0.5}
        rows, cols, vals = [], [], []
        for off, v in diags.items():
            i = np.arange(max(0, -off), min(n, n - off))
            rows.append(i)
            cols.append(i + off)
            vals.append(np.full(len(i), v))
        rows = np.concatenate(rows)
        cols_a = np.concatenate(cols)
        vals = np.concatenate(vals)
        order = np.lexsort((cols_a, rows))
        rp = np.zeros(n + 1, dtype=np.int64)
        np.add.at(rp, rows + 1, 1)
        dia = None
        from stormx.sparse.formats import CSR, dia_from_csr

        csr_b = CSR(
            data=jnp.asarray(vals[order]),
            indices=jnp.asarray(cols_a[order].astype(np.int32)),
            row_ptr=jnp.asarray(np.cumsum(rp).astype(np.int32)),
            shape=(n, n),
        )
        dia = dia_from_csr(csr_b)
        per_link = []
        for P in (2, 4, 8):
            rep = dia_halo_volume(partition_dia(dia, P))
            per_link.append(rep["moved_elems"] / (P - 1))
        assert max(per_link) == min(per_link)
        assert per_link[0] == 2 * 64  # h = max|offset| each way

    def test_pool_shared_set_is_boundary_not_volume(self):
        from stormx.parallel import partition_csr

        csr = self._mesh_operator()
        n = csr.shape[0]
        for P in (2, 4, 8):
            pop = partition_csr(csr, P)
            # shared slots per partition ≪ owned rows per partition
            assert pop.s_max < 0.35 * pop.n_pad, (P, pop.s_max, pop.n_pad)

    def test_volume_reports_are_consistent(self):
        from stormx.parallel import partition_csr
        from stormx.parallel.commvol import csr_pool_volume

        csr = self._mesh_operator()
        pop = partition_csr(csr, 4)
        rep = csr_pool_volume(pop)
        assert rep["moved_elems"] == 4 * 3 * pop.s_max
        assert rep["moved_bytes"] == rep["moved_elems"] * np.asarray(pop.data).dtype.itemsize
        assert 0 < rep["ratio"] < 1


def test_sharded_dia_solve_caches_program():
    """Re-solves with the same partitioned DIA operator must reuse the
    traced program (time-stepping pattern; mirrors sharded_solve's cache)."""
    import jax.numpy as jnp

    from stormx.parallel import make_device_mesh
    from stormx.parallel.banded import partition_dia, sharded_dia_solve
    from stormx.sparse.formats import DIA

    n = 512
    i = np.arange(n)
    data = np.zeros((3, n))
    data[1] = 2.0
    data[0][1:] = -1.0  # row-aligned: data[0][i] = A[i, i-1]
    data[2][: n - 1] = -1.0
    dia = DIA(data=jnp.asarray(data), offsets=(-1, 0, 1), shape=(n, n))
    pdia = partition_dia(dia, 8)
    mesh = make_device_mesh(8)
    rng = np.random.default_rng(0)
    r1 = sharded_dia_solve(pdia, jnp.asarray(rng.standard_normal(n)), mesh=mesh)
    assert len(pdia.__dict__["_solve_cache"]) == 1
    prog = next(iter(pdia.__dict__["_solve_cache"].values()))
    r2 = sharded_dia_solve(pdia, jnp.asarray(rng.standard_normal(n)), mesh=mesh)
    assert len(pdia.__dict__["_solve_cache"]) == 1
    assert next(iter(pdia.__dict__["_solve_cache"].values())) is prog
    assert bool(r1.converged) and bool(r2.converged)
    # different options -> separate entry, no collision
    from stormx.solvers import SolverOptions

    sharded_dia_solve(
        pdia, jnp.asarray(rng.standard_normal(n)), mesh=mesh,
        options=SolverOptions(num_iterations=7),
    )
    assert len(pdia.__dict__["_solve_cache"]) == 2


def test_scaling_projection_model():
    """Gate the scaling-efficiency projection (VERDICT r4 item 5): with the
    measured single-chip slopes and exact per-link halo bytes, the banded
    paths stay compute-bound through P=16 — the modeled basis for the
    BASELINE ">=80% efficiency" claim — and the model degrades monotonically
    once comm dominates."""
    from stormx.parallel.commvol import project_scaling

    # DIA 4.2M: T1 = 71.5 us (BENCH_NOTES), halo strip 2048 rows f32/link.
    for P in (2, 4, 8, 16):
        r = project_scaling(71.5e-6, 2048 * 4, P)
        assert r["efficiency"] >= 0.8, r
        assert not r["comm_bound"]
    # SlicedELL step: T1 = 30 us, band reach 260 rows.
    for P in (2, 4, 8, 16):
        r = project_scaling(30.0e-6, 260 * 4, P)
        assert r["efficiency"] >= 0.8, r
    # A comm-heavy pool: efficiency must fall below the halo layout's and
    # shrink with P (the quantitative argument for the banded BSR layout).
    effs = [
        project_scaling(3.1e-6, (P - 1) * 360 * 5 * 4, P)["efficiency"]
        for P in (4, 8, 16)
    ]
    assert effs[0] > effs[1] > effs[2]
    band = project_scaling(3.1e-6, 378 * 5 * 4, 16)["efficiency"]
    assert band > effs[2]
    # Non-overlapped projection is never better than overlapped.
    r_ov = project_scaling(71.5e-6, 2048 * 4, 8, overlap=True)
    r_no = project_scaling(71.5e-6, 2048 * 4, 8, overlap=False)
    assert r_no["efficiency"] <= r_ov["efficiency"]


def test_distributed_gmres_defaults_to_cgs2(spd_problem):
    """GMRES-family distributed solves default to CGS2 orthogonalization
    (2 psums/inner step vs MGS's k+1; single-chip tie — BENCH_NOTES r5),
    and the default must not change the converged answer."""
    from stormx.parallel.sharded import _orthog_default

    assert _orthog_default("gmres", {}) == {"orthog": "cgs2"}
    assert _orthog_default("LGMRES", {}) == {"orthog": "cgs2"}
    # Explicit choice wins; non-GMRES methods untouched.
    assert _orthog_default("gmres", {"orthog": "mgs"}) == {"orthog": "mgs"}
    assert _orthog_default("cg", {}) == {}

    _, A, b = spd_problem
    pop = partition_csr(A, 4)
    res = sharded_solve(pop, b, method="gmres", mesh=make_device_mesh(4))
    assert bool(res.converged)
    x = np.asarray(res.x)
    ref = np.asarray(
        sharded_solve(
            pop, b, method="gmres", orthog="mgs", mesh=make_device_mesh(4)
        ).x
    )
    np.testing.assert_allclose(x, ref, rtol=1e-8, atol=1e-10)
