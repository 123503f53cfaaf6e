"""Laplace2D golden-error parity with the reference benchmark.

Golden values from ``tests/benchmark/BitternLaplace2D.cpp:403-422``
(double, 1000 iterations, tolerance 1e-4).
"""

import pytest

from stormx.apps.laplace2d import laplace2d_error

GOLDEN = {100: 0.0069143, 150: 0.00994008, 200: 0.0121789}


@pytest.mark.parametrize("n", sorted(GOLDEN))
def test_golden_error(n):
    err = laplace2d_error(n, num_iterations=1000)
    assert err == pytest.approx(GOLDEN[n], abs=1e-4)
