"""Sparse format tests: CSR/COO/ELL/BSR round trips and SpMV agreement."""

import jax.numpy as jnp
import numpy as np
import pytest

from stormx.sparse import BSR, COO, CSR, ELL, bsr_from_csr, csr_from_dense, ell_from_csr


@pytest.fixture
def dense(rng):
    a = rng.standard_normal((12, 12))
    a[rng.random((12, 12)) < 0.6] = 0.0
    np.fill_diagonal(a, np.arange(1.0, 13.0))
    return a


class TestCSR:
    def test_matvec(self, dense, rng):
        csr = csr_from_dense(dense)
        x = rng.standard_normal(12)
        np.testing.assert_allclose(csr @ jnp.asarray(x), dense @ x, rtol=1e-12)

    def test_diagonal(self, dense):
        csr = csr_from_dense(dense)
        np.testing.assert_allclose(csr.diagonal(), np.diag(dense))

    def test_todense(self, dense):
        csr = csr_from_dense(dense)
        np.testing.assert_allclose(csr.todense(), dense)


class TestELL:
    def test_matvec_matches_csr(self, dense, rng):
        csr = csr_from_dense(dense)
        ell = ell_from_csr(csr)
        x = jnp.asarray(rng.standard_normal(12))
        np.testing.assert_allclose(ell @ x, csr @ x, rtol=1e-12)

    def test_padded_width(self, dense, rng):
        csr = csr_from_dense(dense)
        ell = ell_from_csr(csr, row_width=csr_max_width(csr) + 3)
        x = jnp.asarray(rng.standard_normal(12))
        np.testing.assert_allclose(ell @ x, dense @ np.asarray(x), rtol=1e-12)

    def test_diagonal(self, dense):
        ell = ell_from_csr(csr_from_dense(dense))
        np.testing.assert_allclose(ell.diagonal(), np.diag(dense))


class TestCOO:
    def test_matvec_and_to_csr(self, dense, rng):
        rows, cols = np.nonzero(dense)
        coo = COO(
            data=jnp.asarray(dense[rows, cols]),
            rows=jnp.asarray(rows.astype(np.int32)),
            cols=jnp.asarray(cols.astype(np.int32)),
            shape=dense.shape,
        )
        x = jnp.asarray(rng.standard_normal(12))
        np.testing.assert_allclose(coo @ x, dense @ np.asarray(x), rtol=1e-12)
        np.testing.assert_allclose(coo.to_csr() @ x, dense @ np.asarray(x), rtol=1e-12)

    def test_duplicate_sum(self):
        coo = COO(
            data=jnp.array([1.0, 2.0, 5.0]),
            rows=jnp.array([0, 0, 1], dtype=jnp.int32),
            cols=jnp.array([1, 1, 0], dtype=jnp.int32),
            shape=(2, 2),
        )
        csr = coo.to_csr()
        np.testing.assert_allclose(csr.todense(), [[0.0, 3.0], [5.0, 0.0]])


class TestBSR:
    def test_matvec(self, rng):
        n, b = 12, 3
        dense = np.zeros((n, n))
        # Block-sparse pattern.
        for bi in range(n // b):
            for bj in range(n // b):
                if bi == bj or rng.random() < 0.4:
                    dense[bi * b : (bi + 1) * b, bj * b : (bj + 1) * b] = (
                        rng.standard_normal((b, b))
                    )
        csr = csr_from_dense(dense + np.eye(n) * 1e-12)  # keep diagonal blocks present
        bsr = bsr_from_csr(csr, block_size=b)
        x = jnp.asarray(rng.standard_normal(n))
        np.testing.assert_allclose(bsr @ x, dense @ np.asarray(x), atol=1e-10)

    def test_diagonal_blocks(self, rng):
        n, b = 6, 2
        dense = rng.standard_normal((n, n))
        bsr = bsr_from_csr(csr_from_dense(dense), block_size=b)
        blocks = bsr.diagonal_blocks()
        for i in range(n // b):
            np.testing.assert_allclose(
                blocks[i], dense[i * b : (i + 1) * b, i * b : (i + 1) * b]
            )


def csr_max_width(csr):
    return int(np.diff(np.asarray(csr.row_ptr)).max())


class TestPytreeRegistration:
    def test_jit_through_csr(self, dense, rng):
        import jax

        csr = csr_from_dense(dense)
        x = jnp.asarray(rng.standard_normal(12))

        @jax.jit
        def f(mat, x):
            return mat @ x

        np.testing.assert_allclose(f(csr, x), dense @ np.asarray(x), rtol=1e-12)

    def test_jit_through_ell(self, dense, rng):
        import jax

        ell = ell_from_csr(csr_from_dense(dense))
        x = jnp.asarray(rng.standard_normal(12))

        @jax.jit
        def f(mat, x):
            return mat @ x

        np.testing.assert_allclose(f(ell, x), dense @ np.asarray(x), rtol=1e-12)


class TestDIA:
    def test_matvec_matches_dense(self, dense, rng):
        from stormx.sparse import dia_from_csr

        dia = dia_from_csr(csr_from_dense(dense))
        x = rng.standard_normal(12)
        np.testing.assert_allclose(dia @ jnp.asarray(x), dense @ x, rtol=1e-12)

    def test_diagonal(self, dense):
        from stormx.sparse import dia_from_csr

        dia = dia_from_csr(csr_from_dense(dense))
        np.testing.assert_allclose(dia.diagonal(), np.diag(dense), rtol=1e-12)

    def test_banded_poisson(self):
        """5-point Poisson: exactly 5 diagonals, matvec == CSR oracle."""
        from stormx.sparse import dia_from_csr

        nx = 7
        n = nx * nx
        a = np.zeros((n, n))
        for i in range(nx):
            for j in range(nx):
                r = i * nx + j
                a[r, r] = 4.0
                for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    ii, jj = i + di, j + dj
                    if 0 <= ii < nx and 0 <= jj < nx:
                        a[r, ii * nx + jj] = -1.0
        csr = csr_from_dense(a)
        dia = dia_from_csr(csr)
        assert dia.offsets == (-nx, -1, 0, 1, nx)
        x = np.random.default_rng(1).standard_normal(n)
        np.testing.assert_allclose(dia @ jnp.asarray(x), csr @ jnp.asarray(x), rtol=1e-12)

    def test_max_diags_guard(self, dense):
        from stormx.sparse import dia_from_csr

        with pytest.raises(ValueError, match="diagonals"):
            dia_from_csr(csr_from_dense(dense), max_diags=2)

    def test_jit_through_dia(self, dense, rng):
        import jax

        from stormx.sparse import dia_from_csr

        dia = dia_from_csr(csr_from_dense(dense))
        x = jnp.asarray(rng.standard_normal(12))

        @jax.jit
        def f(mat, x):
            return mat @ x

        np.testing.assert_allclose(f(dia, x), dense @ np.asarray(x), rtol=1e-12)


class TestSlicedEll:
    """Uniform-stride windowed SpMV — the unstructured TPU fast path
    (gather-free; measured ~6.6x the ELL gather on the step operator)."""

    def _mesh_operator(self):
        from stormx.fvm.divgrad import assemble_laplacian
        from stormx.mesh import structured_tri_rect

        mesh = structured_tri_rect(13, 11)  # 286 cells, unstructured-ish
        return assemble_laplacian(mesh)

    @pytest.mark.parametrize("mode", ["dense", "onehot"])
    @pytest.mark.parametrize("block_rows", [8, 128])
    def test_matches_ell_oracle(self, mode, block_rows):
        from stormx.sparse import sell_from_csr

        ell = self._mesh_operator()
        n = ell.shape[0]
        sell, perm = sell_from_csr(
            ell.to_csr(), block_rows=block_rows, mode=mode
        )
        inv = np.empty(n, dtype=np.int64)
        inv[perm] = np.arange(n)
        x = np.random.default_rng(0).standard_normal(n)
        y_ref = np.asarray(ell.matvec(jnp.asarray(x)))
        y = np.asarray(sell.matvec(jnp.asarray(x[perm])))[inv]
        np.testing.assert_allclose(y, y_ref, atol=1e-12)

    def test_jits(self):
        import jax

        from stormx.sparse import sell_from_csr

        ell = self._mesh_operator()
        sell, perm = sell_from_csr(ell.to_csr())
        x = jnp.asarray(np.random.default_rng(1).standard_normal(ell.shape[0]))

        @jax.jit
        def f(s, v):
            return s.matvec(v)

        np.testing.assert_allclose(
            np.asarray(f(sell, x)), np.asarray(sell.matvec(x)), rtol=1e-12
        )

    def test_auto_operator_policy(self):
        from stormx.sparse import DIA, SlicedELL, auto_operator, csr_from_dense

        # Structured 5-point stencil → DIA (few offsets survive RCM... the
        # natural order already has 5; RCM keeps it banded).
        nx = 8
        n = nx * nx
        a = np.zeros((n, n))
        idx = np.arange(n)
        i, j = idx // nx, idx % nx
        a[idx, idx] = 4.0
        for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            ii, jj = i + di, j + dj
            m = (ii >= 0) & (ii < nx) & (jj >= 0) & (jj < nx)
            a[idx[m], (ii * nx + jj)[m]] = -1.0
        op, perm = auto_operator(csr_from_dense(a), max_diags=64)
        assert isinstance(op, DIA)
        x = np.random.default_rng(2).standard_normal(n)
        inv = np.empty(n, dtype=np.int64)
        inv[perm] = np.arange(n)
        y = np.asarray(op.matvec(jnp.asarray(x[perm])))[inv]
        np.testing.assert_allclose(y, a @ x, atol=1e-12)

        # Scattered operator → SlicedELL.
        rng = np.random.default_rng(3)
        b = np.eye(n) * 4.0
        pairs = rng.integers(0, n, size=(300, 2))
        b[pairs[:, 0], pairs[:, 1]] = 1.0
        op2, perm2 = auto_operator(csr_from_dense(b), max_diags=8)
        assert isinstance(op2, SlicedELL)
        inv2 = np.empty(n, dtype=np.int64)
        inv2[perm2] = np.arange(n)
        y2 = np.asarray(op2.matvec(jnp.asarray(x[perm2])))[inv2]
        np.testing.assert_allclose(y2, b @ x, atol=1e-12)

    def test_cg_through_sliced_ell(self):
        from stormx.solvers import SolverOptions, cg, make_operator
        from stormx.sparse import sell_from_csr

        ell = self._mesh_operator()
        n = ell.shape[0]
        sell, perm = sell_from_csr(ell.to_csr())
        rng = np.random.default_rng(4)
        rhs = rng.standard_normal(n)
        rhs -= rhs.mean()  # Laplacian nullspace consistency
        opts = SolverOptions(
            num_iterations=800, absolute_tolerance=0.0, relative_tolerance=1e-10
        )
        res = cg(make_operator(sell.matvec), jnp.asarray(rhs[perm]),
                 jnp.zeros(n), options=opts)
        assert bool(res.converged)
        r = np.asarray(sell.matvec(res.x)) - rhs[perm]
        assert np.linalg.norm(r) < 1e-9 * max(np.linalg.norm(rhs), 1.0)


def test_ell_from_csr_host_intermediate():
    """device=False keeps ELL leaves as NumPy (relay-tunnel fix, r5):
    build intermediates must not round-trip through the device."""
    import numpy as np

    from stormx.sparse.formats import csr_from_dense, ell_from_csr

    a = np.array([[2.0, -1.0, 0.0], [-1.0, 2.0, -1.0], [0.0, -1.0, 2.0]])
    csr = csr_from_dense(a)
    ell_host = ell_from_csr(csr, device=False)
    assert isinstance(ell_host.data, np.ndarray)
    assert isinstance(ell_host.cols, np.ndarray)
    ell_dev = ell_from_csr(csr)
    np.testing.assert_array_equal(np.asarray(ell_dev.data), ell_host.data)
    np.testing.assert_array_equal(np.asarray(ell_dev.cols), ell_host.cols)
