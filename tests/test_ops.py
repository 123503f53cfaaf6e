"""Unit tests for ops: safe_divide/sym_ortho semantics and pytree vector ops.

Mirrors the reference's Bittern reduction tests
(``tests/unit/BitternReductions.cpp``) including the golden ``norm_2``
value 5.47723 (``:69-75``).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from stormx.ops import safe_divide, safe_inverse, sym_ortho
from stormx.ops import vector as v


class TestSafeDivide:
    def test_regular(self):
        assert safe_divide(6.0, 3.0) == 2.0

    def test_zero_denominator(self):
        # Crow/MathUtils.hpp:49-52: zero denominator → zero, not inf/NaN.
        assert safe_divide(6.0, 0.0) == 0.0
        assert safe_inverse(0.0) == 0.0

    def test_elementwise(self):
        x = jnp.array([1.0, 2.0, 3.0])
        y = jnp.array([2.0, 0.0, 3.0])
        np.testing.assert_allclose(safe_divide(x, y), [0.5, 0.0, 1.0])

    def test_no_nan(self):
        out = safe_divide(jnp.array([0.0]), jnp.array([0.0]))
        assert not jnp.isnan(out).any()


class TestSymOrtho:
    def test_pythagorean(self):
        cs, sn, rr = sym_ortho(3.0, 4.0)
        np.testing.assert_allclose([cs, sn, rr], [0.6, 0.8, 5.0])

    def test_zero(self):
        # rr == 0 → cs = 1, sn = 0 (Crow/MathUtils.hpp:173-176).
        cs, sn, rr = sym_ortho(0.0, 0.0)
        np.testing.assert_allclose([cs, sn, rr], [1.0, 0.0, 0.0])

    def test_rotation_eliminates(self):
        a, b = 1.7, -2.3
        cs, sn, rr = sym_ortho(a, b)
        np.testing.assert_allclose(-sn * a + cs * b, 0.0, atol=1e-14)
        np.testing.assert_allclose(cs * a + sn * b, rr)


class TestVectorOps:
    def test_norm2_golden(self):
        # BitternReductions.cpp:69-75 golden value: ‖[[1,2],[3,4]]‖₂ = 5.47723.
        x = jnp.array([[1.0, 2.0], [3.0, 4.0]])
        np.testing.assert_allclose(v.norm_2(x), 5.47723, atol=1e-5)

    def test_dot_pytree(self):
        x = {"a": jnp.array([1.0, 2.0]), "b": jnp.array([3.0])}
        y = {"a": jnp.array([4.0, 5.0]), "b": jnp.array([6.0])}
        np.testing.assert_allclose(v.dot(x, y), 1 * 4 + 2 * 5 + 3 * 6)

    def test_dot_complex_convention(self):
        # <a⋅b> = Σ a·conj(b) (Crow/MathUtils.hpp:96-99).
        a = jnp.array([1.0 + 2.0j])
        b = jnp.array([3.0 - 1.0j])
        got = v.dot(a, b)
        np.testing.assert_allclose(got, (1 + 2j) * np.conj(3 - 1j))

    def test_norms(self):
        x = jnp.array([1.0, -2.0, 3.0])
        np.testing.assert_allclose(v.norm_1(x), 6.0)
        np.testing.assert_allclose(v.norm_inf(x), 3.0)
        np.testing.assert_allclose(v.norm_p(x, 3), (1 + 8 + 27) ** (1 / 3))

    def test_axpy_family(self):
        x = jnp.array([1.0, 2.0])
        y = jnp.array([10.0, 20.0])
        np.testing.assert_allclose(v.axpy(2.0, x, y), [12.0, 24.0])
        np.testing.assert_allclose(v.xpay(x, 2.0, y), [21.0, 42.0])
        np.testing.assert_allclose(v.lincomb([2.0, 3.0], [x, y]), [32.0, 64.0])

    def test_stacked_helpers(self):
        x = jnp.array([1.0, 2.0, 3.0])
        st = v.stacked_zeros(x, 4)
        st = v.set_stacked(st, 2, x)
        np.testing.assert_allclose(v.get_stacked(st, 2), x)
        np.testing.assert_allclose(v.get_stacked(st, 0), 0.0 * x)
        dots = v.dots_stacked(st, x)
        np.testing.assert_allclose(dots, [0.0, 0.0, 14.0, 0.0])
        combo = v.lincomb_stacked(jnp.array([0.0, 0.0, 2.0, 0.0]), st)
        np.testing.assert_allclose(combo, 2 * x)

    def test_tree_where(self):
        a = {"u": jnp.array([1.0])}
        b = {"u": jnp.array([2.0])}
        np.testing.assert_allclose(v.tree_where(True, a, b)["u"], [1.0])
        np.testing.assert_allclose(v.tree_where(False, a, b)["u"], [2.0])


class TestDenseHelpers:
    def test_aabb(self, rng):
        from stormx.ops import aabb_of

        pts = rng.standard_normal((50, 3))
        box = aabb_of(pts)
        np.testing.assert_array_equal(box.min, pts.min(axis=0))
        np.testing.assert_array_equal(box.max, pts.max(axis=0))
        grown = box.extend(jnp.asarray([10.0, 0.0, 0.0]))
        assert float(grown.max[0]) == 10.0
        np.testing.assert_allclose(box.center, (pts.min(0) + pts.max(0)) / 2)

    def test_cross_product(self, rng):
        from stormx.ops import cross_product

        a3, b3 = rng.standard_normal((2, 3))
        np.testing.assert_allclose(cross_product(a3, b3), np.cross(a3, b3), rtol=1e-12)
        a2, b2 = rng.standard_normal((2, 2))
        np.testing.assert_allclose(
            cross_product(a2, b2), a2[0] * b2[1] - a2[1] * b2[0], rtol=1e-12
        )

    def test_lu_solve_inverse(self, rng):
        from stormx.ops import inverse_lu, solve_lu

        a = rng.standard_normal((6, 6)) + 6 * np.eye(6)
        b = rng.standard_normal(6)
        np.testing.assert_allclose(solve_lu(a, b), np.linalg.solve(a, b), rtol=1e-10)
        np.testing.assert_allclose(inverse_lu(a), np.linalg.inv(a), rtol=1e-10)


class TestPermutations:
    """Reference Utils/Permutations.hpp (is_permutation aborts for n>2
    there — completed here)."""

    def test_is_permutation(self):
        import jax.numpy as jnp

        from stormx.ops import is_permutation

        assert bool(is_permutation(jnp.array([2, 0, 1, 3])))
        assert not bool(is_permutation(jnp.array([0, 0, 2, 3])))
        assert not bool(is_permutation(jnp.array([0, 1, 4, 2])))

    def test_invert_roundtrip(self):
        import jax

        import jax.numpy as jnp

        from stormx.ops import invert_permutation, inverse_permute, permute

        rng = np.random.default_rng(0)
        perm = jnp.asarray(rng.permutation(257))
        iperm = invert_permutation(perm)
        np.testing.assert_array_equal(np.asarray(iperm[perm]), np.arange(257))
        v = jnp.asarray(rng.standard_normal(257))
        np.testing.assert_allclose(
            np.asarray(permute(inverse_permute(v, perm), perm)), np.asarray(v)
        )
        # jit-safe
        out = jax.jit(lambda p: invert_permutation(p))(perm)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(iperm))
