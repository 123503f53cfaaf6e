"""Complex-dtype parity (VERDICT r3 item 7).

The reference is templated over ``complex_t`` with a conjugating
``dot_product`` (``Crow/MathUtils.hpp:93-99``) and ``Conj/Real/Imag``
functors (``Crow/FunctionalUtils.hpp:431-472``), but its complex solver
path is real-only in practice: ``safe_divide`` is constrained to
``std::floating_point`` (``MathUtils.hpp:49-52``) and ``sym_ortho`` calls
``hypot``, which has no complex overload — neither instantiates for
``complex_t``.  stormx closes that gap: ``safe_divide`` is elementwise on
any dtype, ``sym_ortho`` has a documented complex branch (unitary
rotation), and the ENTIRE solver catalog — CG (Hermitian), the
transpose-free general solvers (CGS/BiCGStab/BiCGStab(l)/TFQMR/TFQMR1/
IDR(s)/GMRES/FGMRES/LGMRES), the least-squares pair (LSQR/LSMR, via the
conjugate product), and Richardson — solves complex operators end-to-end,
verified here against dense solves.

Convention notes (all bit-identical for real dtypes):
* ``v.dot(a, c)`` conjugates the SECOND argument.
* BiCG-family shadow products put the fixed shadow vector in the
  conjugated slot (``dot(r, r̃)``) so the pairing is linear in the
  evolving vector — the polynomial recurrences rely on bilinearity.
* Norm-surrogate scalars (CG's √γ, TFQMR's τ, GMRES' |β|) are kept real.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from stormx.ops import safe_divide, sym_ortho
from stormx.ops.vector import dot, norm_2
from stormx.solvers import (
    SolverOptions,
    bicgstab,
    bicgstab_l,
    cg,
    cgs,
    fgmres,
    gmres,
    idrs,
    lgmres,
    lsmr,
    lsqr,
    make_operator,
    richardson,
    tfqmr,
    tfqmr1,
)

OPTS = SolverOptions(
    num_iterations=500, absolute_tolerance=0.0, relative_tolerance=1e-10
)


def _rng(seed=0):
    return np.random.default_rng(seed)


def _crandn(rng, *shape):
    return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)


class TestComplexScalarOps:
    def test_dot_conjugates_second_argument(self):
        rng = _rng(1)
        x, y = _crandn(rng, 8), _crandn(rng, 8)
        got = complex(dot(jnp.asarray(x), jnp.asarray(y)))
        assert got == pytest.approx(np.sum(x * np.conj(y)))

    def test_norm_is_real_and_positive(self):
        x = _crandn(_rng(2), 16)
        got = norm_2(jnp.asarray(x))
        assert not jnp.iscomplexobj(got)
        assert float(got) == pytest.approx(np.linalg.norm(x))

    def test_safe_divide_complex(self):
        num = jnp.asarray([1 + 2j, 3.0 + 0j, 1j])
        den = jnp.asarray([2.0 + 0j, 0.0 + 0j, 1 - 1j])
        out = np.asarray(safe_divide(num, den))
        assert out[0] == pytest.approx((1 + 2j) / 2)
        assert out[1] == 0.0  # breakdown guard: exact zero, no NaN
        assert out[2] == pytest.approx(1j / (1 - 1j))

    def test_sym_ortho_complex_is_unitary_rotation(self):
        rng = _rng(3)
        for _ in range(5):
            a, b = complex(_crandn(rng)), complex(_crandn(rng))
            cs, sn, rr = sym_ortho(jnp.asarray(a), jnp.asarray(b))
            cs, sn, rr = complex(cs), complex(sn), complex(rr)
            assert rr.imag == 0.0 and rr.real > 0
            # unit modulus of the rotation
            assert abs(cs) ** 2 + abs(sn) ** 2 == pytest.approx(1.0)
            # [[conj(cs), conj(sn)], [-sn, cs]] @ [a, b] = [rr, 0]
            assert np.conj(cs) * a + np.conj(sn) * b == pytest.approx(rr.real)
            assert -sn * a + cs * b == pytest.approx(0.0, abs=1e-12)

    def test_sym_ortho_real_path_unchanged(self):
        cs, sn, rr = sym_ortho(jnp.asarray(3.0), jnp.asarray(4.0))
        assert float(rr) == pytest.approx(5.0)
        assert float(cs) == pytest.approx(0.6)
        assert float(sn) == pytest.approx(0.8)
        cs0, sn0, rr0 = sym_ortho(jnp.asarray(0.0), jnp.asarray(0.0))
        assert (float(cs0), float(sn0), float(rr0)) == (1.0, 0.0, 0.0)


class TestComplexSolves:
    def _hermitian(self, n=40, seed=4):
        rng = _rng(seed)
        b_mat = _crandn(rng, n, n)
        a = b_mat @ b_mat.conj().T + n * np.eye(n)
        assert np.allclose(a, a.conj().T)
        return jnp.asarray(a), jnp.asarray(_crandn(rng, n))

    def _general(self, n=40, seed=5):
        rng = _rng(seed)
        a = _crandn(rng, n, n) + 3 * n ** 0.5 * np.eye(n)
        return jnp.asarray(a), jnp.asarray(_crandn(rng, n))

    def test_cg_hermitian(self):
        a, b = self._hermitian()
        res = cg(
            make_operator(lambda x: a @ x), b, jnp.zeros_like(b), options=OPTS
        )
        assert bool(res.converged)
        x_ref = np.linalg.solve(np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(np.asarray(res.x), x_ref, atol=1e-8)
        # histories are real ‖r‖ values
        h = np.asarray(res.history)
        assert not np.iscomplexobj(h)

    @pytest.mark.parametrize(
        "method",
        [bicgstab, bicgstab_l, cgs, tfqmr, tfqmr1, idrs, gmres, fgmres, lgmres],
    )
    def test_general_complex(self, method):
        """Every transpose-free solver in the catalog on a complex general
        operator.  The BiCG-family recurrences require the shadow pairing to
        be LINEAR in the evolving vector (shadow vector in the conjugated
        slot) — this is the regression test for that convention."""
        a, b = self._general()
        res = method(
            make_operator(lambda x: a @ x), b, jnp.zeros_like(b), options=OPTS
        )
        assert bool(res.converged)
        r = np.asarray(a) @ np.asarray(res.x) - np.asarray(b)
        assert np.linalg.norm(r) <= 1e-9 * np.linalg.norm(np.asarray(b))

    @pytest.mark.parametrize("method", [lsqr, lsmr])
    def test_least_squares_complex(self, method):
        """LSQR/LSMR need the conjugate product 𝓐ᴴ (reference
        ``Operator.hpp:120-127``); Golub–Kahan α/β stay real for complex
        operators, so the shared real `sym_ortho` path applies as-is."""
        a, b = self._general(seed=6)
        ah = jnp.asarray(np.asarray(a).conj().T)
        res = method(
            make_operator(lambda x: a @ x, lambda x: ah @ x),
            b,
            jnp.zeros_like(b),
            options=OPTS,
        )
        assert bool(res.converged)
        r = np.asarray(a) @ np.asarray(res.x) - np.asarray(b)
        assert np.linalg.norm(r) <= 1e-8 * np.linalg.norm(np.asarray(b))

    def test_richardson_complex_contractive(self):
        """Richardson with ω sized to the operator (the reference's fixed
        default 1e-4 is for stiff FVM operators) on a contractive complex
        perturbation of the identity."""
        rng = _rng(8)
        n = 40
        c = np.eye(n) - 0.02 * _crandn(rng, n, n)
        b = _crandn(rng, n)
        res = richardson(
            make_operator(lambda x: jnp.asarray(c) @ x),
            jnp.asarray(b),
            jnp.zeros(n, dtype=complex),
            relaxation_factor=1.0,
            options=SolverOptions(
                num_iterations=500, absolute_tolerance=0.0,
                relative_tolerance=1e-10,
            ),
        )
        assert bool(res.converged)
        r = c @ np.asarray(res.x) - b
        assert np.linalg.norm(r) <= 1e-9 * np.linalg.norm(b)

    def test_gmres_residual_estimate_tracks_true_residual(self):
        """The Givens residual estimate |β(k+1)| only equals the true
        residual norm if the rotations stay UNITARY for complex data —
        this is the regression test for the conjugate-correct apply."""
        a, b = self._general(seed=7)
        opts = SolverOptions(
            num_iterations=25, absolute_tolerance=0.0, relative_tolerance=0.0
        )
        res = gmres(
            make_operator(lambda x: a @ x), b, jnp.zeros_like(b), options=opts
        )
        r = np.asarray(a) @ np.asarray(res.x) - np.asarray(b)
        est = float(np.asarray(res.history)[int(res.num_iterations)])
        true = float(np.linalg.norm(r))
        assert est == pytest.approx(true, rel=1e-6)
