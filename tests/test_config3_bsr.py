"""BASELINE config #3: "GMRES(30) + MGS orthogonalization and FGMRES …
matrix-free 3D unstructured-mesh operator … explicit assembly (BSR blocks)".

A 3-D tetrahedral box (Kuhn subdivision, 6 tets/cube) carries a coupled
4-variable operator  A = L ⊗ B + I ⊗ C  (L = two-point-flux Laplacian of
the mesh, B an SPD inter-variable coupling, C a nonsymmetric reaction
block) stored as :class:`stormx.sparse.BSR` with block size = n_vars.
Serial GMRES(30)/FGMRES (``SolverGmres.hpp:41-310``) and the partitioned
BSR path (``stormx.parallel.bsr``) must agree with each other and with a
dense ground truth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stormx.fvm.divgrad import assemble_laplacian
from stormx.mesh import structured_tet_box
from stormx.parallel import (
    make_device_mesh,
    partition_bsr,
    sharded_bsr_solve,
)
from stormx.sparse import BSR
from stormx.solvers import SolverOptions, fgmres, gmres, make_operator

NV = 4

OPTS = SolverOptions(
    num_iterations=600, absolute_tolerance=1e-9, relative_tolerance=1e-9
)


@pytest.fixture(scope="module")
def tet_problem():
    mesh = structured_tet_box(5, 4, 3)
    L = assemble_laplacian(mesh)
    n = mesh.num_cells
    data = np.asarray(L.data)
    cols = np.asarray(L.cols)
    K = cols.shape[1]
    rng = np.random.default_rng(3)
    # SPD inter-variable coupling + nonsymmetric reaction block.
    B = np.eye(NV) + 0.2 * np.ones((NV, NV))
    C = 6.0 * np.eye(NV) + 0.8 * np.triu(rng.standard_normal((NV, NV)), 1)
    blocks = data[:, :, None, None] * B[None, None]
    rows = np.arange(n)
    blocks += ((cols == rows[:, None]) & (data != 0))[..., None, None] * C
    bsr = BSR(
        blocks=jnp.asarray(blocks),
        cols=jnp.asarray(cols),
        shape=(n * NV, n * NV),
    )
    b = rng.standard_normal(n * NV)
    return mesh, bsr, b


@pytest.fixture(scope="module")
def dense_truth(tet_problem):
    mesh, bsr, b = tet_problem
    n = mesh.num_cells
    blocks = np.asarray(bsr.blocks)
    cols = np.asarray(bsr.cols)
    a = np.zeros((n * NV, n * NV))
    for i in range(n):
        for k in range(cols.shape[1]):
            j = int(cols[i, k])
            a[i * NV : (i + 1) * NV, j * NV : (j + 1) * NV] += blocks[i, k]
    return np.linalg.solve(a, b)


class TestConfig3:
    def test_bsr_matvec_matches_dense(self, tet_problem):
        mesh, bsr, b = tet_problem
        n = mesh.num_cells
        blocks = np.asarray(bsr.blocks)
        cols = np.asarray(bsr.cols)
        a = np.zeros((n * NV, n * NV))
        for i in range(n):
            for k in range(cols.shape[1]):
                j = int(cols[i, k])
                a[i * NV : (i + 1) * NV, j * NV : (j + 1) * NV] += blocks[i, k]
        x = np.random.default_rng(0).standard_normal(n * NV)
        np.testing.assert_allclose(
            np.asarray(bsr.matvec(jnp.asarray(x))), a @ x, atol=1e-10
        )

    @pytest.mark.parametrize("solver", [gmres, fgmres], ids=["gmres", "fgmres"])
    def test_serial_gmres30_mgs(self, tet_problem, dense_truth, solver):
        mesh, bsr, b = tet_problem
        res = solver(
            make_operator(bsr.matvec), jnp.asarray(b),
            jnp.zeros(len(b)), restart=30, orthog="mgs", options=OPTS,
        )
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.x), dense_truth, atol=1e-6)

    @pytest.mark.parametrize("parts", [1, 8])
    def test_partitioned_gmres_matches_serial(self, tet_problem, dense_truth, parts):
        mesh, bsr, b = tet_problem
        serial = gmres(
            make_operator(bsr.matvec), jnp.asarray(b),
            jnp.zeros(len(b)), restart=30, options=OPTS,
        )
        pb = partition_bsr(bsr, parts)
        res = sharded_bsr_solve(
            pb, b, mesh=make_device_mesh(parts), method="gmres",
            restart=30, options=OPTS,
        )
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.x), dense_truth, atol=1e-6)
        # Partition invariance of the history (the BSR layout reorders rows,
        # so dots regroup — fp64 tolerance, as in the scalar path).
        k = min(int(res.num_iterations), int(serial.num_iterations))
        hs = np.asarray(serial.history)[: k + 1]
        hp = np.asarray(res.history)[: k + 1]
        np.testing.assert_allclose(hp, hs, rtol=1e-8)

    def test_block_jacobi_accelerates(self, tet_problem, dense_truth):
        mesh, bsr, b = tet_problem
        pb = partition_bsr(bsr, 4)
        mesh4 = make_device_mesh(4)
        plain = sharded_bsr_solve(
            pb, b, mesh=mesh4, method="gmres", restart=30, options=OPTS
        )
        pre = sharded_bsr_solve(
            pb, b, mesh=mesh4, method="gmres", restart=30, options=OPTS,
            block_jacobi=True,
        )
        assert bool(plain.converged) and bool(pre.converged)
        assert int(pre.num_iterations) <= int(plain.num_iterations)
        np.testing.assert_allclose(np.asarray(pre.x), dense_truth, atol=1e-6)

    @pytest.mark.parametrize("parts", [2, 8])
    def test_banded_layout_matches_pool_and_serial(
        self, tet_problem, dense_truth, parts
    ):
        """Banded (neighbor-ppermute) BSR layout — same solution and
        partition-invariant history as the all-gather pool layout, with
        constant per-link comm bytes (VERDICT r4 item 6)."""
        from stormx.parallel import partition_bsr_banded
        from stormx.parallel.commvol import bsr_band_volume, bsr_pool_volume

        mesh, bsr, b = tet_problem
        serial = gmres(
            make_operator(bsr.matvec), jnp.asarray(b),
            jnp.zeros(len(b)), restart=30, options=OPTS,
        )
        pb = partition_bsr_banded(bsr, parts)
        res = sharded_bsr_solve(
            pb, b, mesh=make_device_mesh(parts), method="gmres",
            restart=30, options=OPTS,
        )
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.x), dense_truth, atol=1e-6)
        k = min(int(res.num_iterations), int(serial.num_iterations))
        np.testing.assert_allclose(
            np.asarray(res.history)[: k + 1],
            np.asarray(serial.history)[: k + 1],
            rtol=1e-8,
        )
        # Block-Jacobi works on this layout too (diag sits at h_lo + r).
        pre = sharded_bsr_solve(
            pb, b, mesh=make_device_mesh(parts), method="gmres",
            restart=30, options=OPTS, block_jacobi=True,
        )
        assert bool(pre.converged)
        np.testing.assert_allclose(np.asarray(pre.x), dense_truth, atol=1e-6)
        assert int(pre.num_iterations) <= int(res.num_iterations)
        # Comm scaling: banded layout moves a CONSTANT strip per link while
        # the pool's all_gather grows with P.
        vol_band = bsr_band_volume(pb)
        per_link = vol_band["moved_elems"] // (parts - 1)
        assert per_link == (pb.h_lo + pb.h_hi) * pb.block_size
        pool = partition_bsr(bsr, parts)
        vol_pool = bsr_pool_volume(pool)
        if parts == 8:
            assert vol_band["moved_elems"] < vol_pool["moved_elems"]

    def test_banded_matvec_matches_bsr(self, tet_problem):
        """Sharded banded matvec == serial BSR matvec (bit-exact per row:
        same block-column order within each row)."""
        from jax.sharding import PartitionSpec as P

        from stormx.parallel import partition_bsr_banded
        from stormx.parallel.bsr import partition_bsr_vector, unpartition_bsr_vector

        mesh, bsr, b = tet_problem
        n = bsr.shape[0]
        rng = np.random.default_rng(9)
        x = rng.standard_normal(n)
        y_serial = np.asarray(bsr.matvec(jnp.asarray(x)))
        for overlap in (False, True):
            pb = partition_bsr_banded(bsr, 8)
            local = pb.local_matvec("parts", overlap=overlap)
            xp = partition_bsr_vector(pb, x)
            fn = jax.shard_map(
                lambda xl, bl, cl: local(xl[0], bl[0], cl[0])[None],
                mesh=make_device_mesh(8),
                in_specs=(P("parts"), P("parts"), P("parts")),
                out_specs=P("parts"),
            )
            yp = fn(xp, pb.blocks, pb.cols)
            y = np.asarray(unpartition_bsr_vector(pb, yp))
            np.testing.assert_allclose(y, y_serial, rtol=1e-12, atol=1e-12)
