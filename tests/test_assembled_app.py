"""Assembled-operator app path: the Cahn–Hilliard linear operator
A = I − τσ·D + τγ·D² built once per mesh (ell_spgemm/ell_add) and served
through auto_operator — numerically identical to the nested matrix-free
step (reference Playground.cpp:151-167)."""

import numpy as np

import jax.numpy as jnp

from stormx.apps.cahn_hilliard import make_assembled_step, make_step
from stormx.mesh.structured import structured_tri_rect
from stormx.solvers import SolverOptions
from stormx.sparse.formats import ell_add, ell_from_csr, ell_spgemm


class TestSpgemm:
    def test_spgemm_matches_dense(self, rng):
        from stormx.fvm.divgrad import assemble_divgrad

        mesh = structured_tri_rect(9, 7)
        D = assemble_divgrad(mesh)
        n = mesh.num_cells
        Dd = np.zeros((n, n))
        dd, cc = np.asarray(D.data), np.asarray(D.cols)
        for i in range(n):
            for k in range(cc.shape[1]):
                Dd[i, cc[i, k]] += dd[i, k]
        C = ell_spgemm(D, D)
        Cd = np.zeros((n, n))
        rp, ci, dv = np.asarray(C.row_ptr), np.asarray(C.indices), np.asarray(C.data)
        rows = np.repeat(np.arange(n), np.diff(rp))
        Cd[rows, ci] = dv
        np.testing.assert_allclose(Cd, Dd @ Dd, atol=1e-11)

    def test_ell_add_identity_combo(self):
        from stormx.fvm.divgrad import assemble_divgrad

        mesh = structured_tri_rect(6, 5)
        D = assemble_divgrad(mesh)
        n = mesh.num_cells
        A = ell_add([(1.0, None), (-0.5, D)], (n, n))
        x = np.random.default_rng(1).standard_normal(n)
        y = np.asarray(ell_from_csr(A).matvec(jnp.asarray(x)))
        y_ref = x - 0.5 * np.asarray(D.matvec(jnp.asarray(x)))
        np.testing.assert_allclose(y, y_ref, atol=1e-12)


class TestAssembledCahnHilliard:
    def test_matches_matrix_free(self, rng):
        mesh = structured_tri_rect(24, 20)
        dmesh = mesh.device_arrays()
        opts = SolverOptions(
            num_iterations=2000, absolute_tolerance=0.0, relative_tolerance=1e-12
        )
        c0 = jnp.asarray(0.5 + 0.1 * rng.standard_normal(mesh.num_cells))
        s_mf = make_step(dmesh, options=opts)
        s_as = make_assembled_step(mesh, options=opts)
        c1, r1 = s_mf(c0)
        c2, r2 = s_as(c0)
        assert abs(int(r1.num_iterations) - int(r2.num_iterations)) <= 1
        np.testing.assert_allclose(np.asarray(c2), np.asarray(c1), atol=1e-12)
        for _ in range(3):
            c1, _ = s_mf(c1)
            c2, _ = s_as(c2)
        np.testing.assert_allclose(np.asarray(c2), np.asarray(c1), atol=1e-11)
