"""Tests for the beyond-reference solver set: LGMRES/LFGMRES, LSQR/LSMR
(reference ``README.md:66-69`` — all *Planned* there, implemented here).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stormx.solvers import (
    SolverOptions,
    gmres,
    lfgmres,
    lgmres,
    lsmr,
    lsqr,
    make_operator,
)

TIGHT = SolverOptions(
    num_iterations=1500, absolute_tolerance=1e-10, relative_tolerance=1e-10
)


def dense_op(a):
    aj = jnp.asarray(a)
    return make_operator(lambda x: aj @ x, lambda y: aj.T.conj() @ y)


def convdiff_matrix(nx=16, pe=40.0):
    """2D convection-diffusion (upwinded), the canonical LGMRES test family
    (Baker et al. §5): nonsymmetric, restart-sensitive, but tractable."""
    n = nx * nx
    h = 1.0 / (nx + 1)
    idx = np.arange(n)
    i, j = idx // nx, idx % nx
    a = np.zeros((n, n))
    a[idx, idx] = 4.0
    for di, dj, val in (
        (1, 0, -1.0 - pe * h / 2), (-1, 0, -1.0 + pe * h / 2),
        (0, 1, -1.0 - pe * h / 2), (0, -1, -1.0 + pe * h / 2),
    ):
        ii, jj = i + di, j + dj
        msk = (ii >= 0) & (ii < nx) & (jj >= 0) & (jj < nx)
        a[idx[msk], (ii * nx + jj)[msk]] = val
    return a


@pytest.fixture
def hard_nonsym():
    a = convdiff_matrix()
    b = np.random.default_rng(7).standard_normal(a.shape[0])
    return a, b


class TestLgmres:
    @pytest.mark.slow
    def test_beats_equal_storage_gmres_on_convdiff(self):
        # Baker et al.'s headline comparison is at equal storage:
        # LGMRES(m, k) vs GMRES(m+k).
        a = convdiff_matrix()
        b = np.random.default_rng(0).standard_normal(a.shape[0])
        opts = SolverOptions(
            num_iterations=600, absolute_tolerance=1e-9, relative_tolerance=1e-9
        )
        op = dense_op(a)
        bj = jnp.asarray(b)
        plain = gmres(op, bj, jnp.zeros_like(bj), restart=13, options=opts)
        aug = lgmres(op, bj, jnp.zeros_like(bj), restart=10, augment=3, options=opts)
        assert bool(aug.converged) and bool(plain.converged)
        assert int(aug.num_iterations) <= int(plain.num_iterations)
        r = a @ np.asarray(aug.x) - b
        assert np.abs(r).max() < 1e-7

    def test_exact_solution(self, hard_nonsym):
        a, b = hard_nonsym
        res = lgmres(
            dense_op(a), jnp.asarray(b), jnp.zeros(len(b)),
            restart=15, augment=2, options=TIGHT,
        )
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(a, b), atol=1e-6)

    def test_first_cycle_matches_gmres_m_plus_k(self, hard_nonsym):
        # With no z's yet, LGMRES(m, k) cycle 0 = GMRES(m+k): identical
        # residual history while it < m+k.
        a, b = hard_nonsym
        opts = SolverOptions(
            num_iterations=9, absolute_tolerance=1e-14, relative_tolerance=1e-14
        )
        bj = jnp.asarray(b)
        h_aug = lgmres(dense_op(a), bj, jnp.zeros_like(bj), restart=6, augment=3,
                       options=opts).history
        h_ref = gmres(dense_op(a), bj, jnp.zeros_like(bj), restart=9,
                      options=opts).history
        np.testing.assert_allclose(np.asarray(h_aug), np.asarray(h_ref), rtol=1e-10)

    def test_jits(self, hard_nonsym):
        a, b = hard_nonsym
        op = dense_op(a)

        @jax.jit
        def run(bb):
            return lgmres(op, bb, jnp.zeros_like(bb), restart=10, augment=2,
                          options=TIGHT).x

        x = run(jnp.asarray(b))
        assert np.abs(a @ np.asarray(x) - b).max() < 1e-6

    @pytest.mark.parametrize("variant", ["lgmres", "lfgmres"])
    def test_preconditioned_true_residual_matches_reported(self, variant):
        """Regression: right-preconditioned (the default side) augmented
        cycles must keep the projected residual |β_{j+1}| — the stopping
        test — synchronized with the TRUE residual of the returned x.  The
        old code applied 𝓟 to the Krylov part of the correction only (and
        the flexible path stored the raw augmented direction), giving a
        13–30× projected/true gap after two cycles."""
        from stormx.precond import JacobiPreconditioner

        rng = np.random.default_rng(11)
        n = 60
        a = rng.standard_normal((n, n)) * 0.5 + np.diag(
            np.linspace(3.0, 3.0 * n, n)
        )
        b = rng.standard_normal(n)
        pre = JacobiPreconditioner(diag=jnp.asarray(np.diag(a)))
        solver = {"lgmres": lgmres, "lfgmres": lfgmres}[variant]
        # Small restart forces ≥ 2 augmented cycles before convergence.
        opts = SolverOptions(
            num_iterations=60, absolute_tolerance=1e-8, relative_tolerance=0.0
        )
        res = solver(
            dense_op(a), jnp.asarray(b), jnp.zeros(n),
            precond=pre, restart=6, augment=2, options=opts,
        )
        assert int(res.num_iterations) > 8  # really went past cycle 1
        true_r = np.linalg.norm(a @ np.asarray(res.x) - b)
        reported = float(res.absolute_error)
        assert np.isclose(true_r, reported, rtol=1e-3, atol=1e-12), (
            f"true residual {true_r} vs reported {reported}"
        )
        assert bool(res.converged) and true_r < 1.1e-8

    def test_flexible_with_varying_preconditioner(self, hard_nonsym):
        from stormx.precond import KrylovPreconditioner

        a, b = hard_nonsym
        op = dense_op(a)
        pre = KrylovPreconditioner(op, method="gmres", num_iterations=5)
        bj = jnp.asarray(b)
        res = lfgmres(op, bj, jnp.zeros_like(bj), precond=pre, restart=10,
                      augment=2, options=TIGHT)
        assert bool(res.converged)
        assert np.abs(a @ np.asarray(res.x) - b).max() < 1e-6


class TestLsqr:
    def test_square_system(self):
        rng = np.random.default_rng(0)
        n = 60
        a = rng.standard_normal((n, n)) + n * np.eye(n)
        b = rng.standard_normal(n)
        res = lsqr(dense_op(a), jnp.asarray(b), jnp.zeros(n), options=TIGHT)
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(a, b), atol=1e-6)

    def test_overdetermined_least_squares(self):
        rng = np.random.default_rng(1)
        m, n = 100, 40
        a = rng.standard_normal((m, n))
        b = rng.standard_normal(m)
        opts = SolverOptions(
            num_iterations=300, absolute_tolerance=0.0, relative_tolerance=0.0
        )
        res = lsqr(dense_op(a), jnp.asarray(b), jnp.zeros(n), options=opts)
        x_ref, *_ = np.linalg.lstsq(a, b, rcond=None)
        np.testing.assert_allclose(np.asarray(res.x), x_ref, atol=1e-8)

    def test_underdetermined_min_norm(self):
        rng = np.random.default_rng(2)
        m, n = 30, 80
        a = rng.standard_normal((m, n))
        b = rng.standard_normal(m)
        opts = SolverOptions(
            num_iterations=200, absolute_tolerance=1e-12, relative_tolerance=1e-12
        )
        res = lsqr(dense_op(a), jnp.asarray(b), jnp.zeros(n), options=opts)
        x_ref, *_ = np.linalg.lstsq(a, b, rcond=None)  # min-norm solution
        np.testing.assert_allclose(np.asarray(res.x), x_ref, atol=1e-8)

    def test_requires_adjoint(self):
        a = np.eye(3)
        op = make_operator(lambda x: jnp.asarray(a) @ x)  # no conj_mul
        with pytest.raises(Exception):
            lsqr(op, jnp.ones(3), jnp.zeros(3))


class TestLsmr:
    def test_square_system(self):
        rng = np.random.default_rng(3)
        n = 60
        a = rng.standard_normal((n, n)) + n * np.eye(n)
        b = rng.standard_normal(n)
        res = lsmr(dense_op(a), jnp.asarray(b), jnp.zeros(n), options=TIGHT)
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(a, b), atol=1e-6)

    def test_overdetermined_least_squares(self):
        rng = np.random.default_rng(4)
        m, n = 100, 40
        a = rng.standard_normal((m, n))
        b = rng.standard_normal(m)
        opts = SolverOptions(
            num_iterations=300, absolute_tolerance=0.0, relative_tolerance=0.0
        )
        res = lsmr(dense_op(a), jnp.asarray(b), jnp.zeros(n), options=opts)
        x_ref, *_ = np.linalg.lstsq(a, b, rcond=None)
        np.testing.assert_allclose(np.asarray(res.x), x_ref, atol=1e-8)

    def test_residual_history_tracks_true_norm(self):
        # The §5.1 recurrence must estimate ‖b − 𝓐x‖ accurately.
        rng = np.random.default_rng(5)
        n = 40
        a = rng.standard_normal((n, n)) + n * np.eye(n)
        b = rng.standard_normal(n)
        opts = SolverOptions(
            num_iterations=25, absolute_tolerance=1e-14, relative_tolerance=1e-14
        )
        res = lsmr(dense_op(a), jnp.asarray(b), jnp.zeros(n), options=opts)
        hist = np.asarray(res.history)
        it = int(res.num_iterations)
        true_r = np.linalg.norm(a @ np.asarray(res.x) - b)
        assert abs(hist[it] - true_r) / max(true_r, 1e-30) < 1e-6 or abs(
            hist[it] - true_r
        ) < 1e-9

    def test_jits_and_vmaps(self):
        rng = np.random.default_rng(6)
        m, n = 50, 20
        a = rng.standard_normal((m, n))
        op = dense_op(a)
        bs = jnp.asarray(rng.standard_normal((4, m)))
        opts = SolverOptions(
            num_iterations=120, absolute_tolerance=0.0, relative_tolerance=0.0
        )

        @jax.jit
        @jax.vmap
        def run(b):
            return lsmr(op, b, jnp.zeros(n), options=opts).x

        xs = np.asarray(run(bs))
        for i in range(4):
            x_ref, *_ = np.linalg.lstsq(a, np.asarray(bs[i]), rcond=None)
            np.testing.assert_allclose(xs[i], x_ref, atol=1e-7)
