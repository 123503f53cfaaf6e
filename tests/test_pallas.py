"""Pallas DIA kernel correctness in interpret mode (CPU).

Compiled-mode validation runs on the real chip via
``scripts/perf_pallas.py`` (a Mosaic fault can wedge the remote TPU pool,
so compiled kernel tests stay out of the default suite — CLAUDE.md).
The interpret-mode oracle here checks the same code path XLA-free:
windows, halo padding, lane rotations, SMEM dot accumulation.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from stormx.ops.pallas_dia import cg_fused_update, cg_step, dia_spmv, dia_spmv_dots
from stormx.sparse import DIA


def banded(n, offsets, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    data = np.zeros((len(offsets), n), dtype=dtype)
    for d, off in enumerate(offsets):
        lo, hi = max(0, -off), min(n, n - off)
        data[d, lo:hi] = rng.standard_normal(hi - lo)
    return DIA(data=jnp.asarray(data), offsets=tuple(offsets), shape=(n, n))


# Small tiles so multiple grid steps (and the DMA pipeline) are exercised.
TILE = 8  # rows of 128 lanes → 1024 elements per tile


class TestDiaSpmv:
    @pytest.mark.parametrize(
        "n,offsets",
        [
            (4096, (-128, -1, 0, 1, 128)),   # aligned ± multiple-of-LANE
            (4096, (-130, -7, 0, 3, 257)),   # unaligned lane rotations
            (5000, (-64, 0, 64)),            # ragged n (padding rows)
            (1024, (0,)),                    # single tile, diagonal only
        ],
    )
    def test_matches_xla_matvec(self, n, offsets):
        dia = banded(n, offsets)
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal(n).astype(np.float32)
        )
        z_ref = np.asarray(dia.matvec(x))
        z = np.asarray(_spmv(dia, x))
        np.testing.assert_allclose(z, z_ref, atol=1e-4)

    def test_dots_fused(self):
        n = 4096
        dia = banded(n, (-128, -1, 0, 1, 128))
        p = jnp.asarray(
            np.random.default_rng(2).standard_normal(n).astype(np.float32)
        )
        from stormx.ops import pallas_dia as pd

        z, pz = pd._spmv_call(dia, p, with_dot=True, tile_rows=TILE)
        z_ref = np.asarray(dia.matvec(p))
        np.testing.assert_allclose(np.asarray(z)[:n], z_ref, atol=1e-4)
        assert abs(float(pz) - float(np.vdot(np.asarray(p), z_ref))) < 1e-2 * max(
            1.0, abs(float(np.vdot(np.asarray(p), z_ref)))
        )


def _spmv(dia, x):
    from stormx.ops import pallas_dia as pd

    z, _ = pd._spmv_call(dia, x, with_dot=False, tile_rows=TILE)
    return z


class TestCgStep:
    def test_fused_update(self):
        n = 3000
        rng = np.random.default_rng(3)
        x, r, p, z = (
            jnp.asarray(rng.standard_normal(n).astype(np.float32)) for _ in range(4)
        )
        alpha = 0.37
        x2, r2, rr = cg_fused_update(alpha, x, r, p, z, tile_rows=TILE)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x) + alpha * np.asarray(p), atol=1e-5)
        r_ref = np.asarray(r) - alpha * np.asarray(z)
        np.testing.assert_allclose(np.asarray(r2), r_ref, atol=1e-5)
        assert abs(float(rr) - float(r_ref @ r_ref)) < 1e-2 * float(r_ref @ r_ref)

    @pytest.mark.slow
    def test_cg_iterations_reduce_residual(self):
        # A few fused CG steps on an SPD banded operator must reproduce the
        # textbook recurrence (oracle: plain numpy CG on the dense matrix).
        n = 2048
        offsets = (-128, -1, 0, 1, 128)
        rng = np.random.default_rng(4)
        data = np.zeros((5, n), dtype=np.float32)
        for d, off in enumerate(offsets):
            lo, hi = max(0, -off), min(n, n - off)
            mag = 4.0 if off == 0 else -0.9
            data[d, lo:hi] = mag
        dia = DIA(data=jnp.asarray(data), offsets=offsets, shape=(n, n))
        b = rng.standard_normal(n).astype(np.float32)
        x = jnp.zeros(n, dtype=jnp.float32)
        r = jnp.asarray(b)
        p = r
        gamma = jnp.vdot(r, r)
        g0 = float(gamma)
        for _ in range(10):
            x, r, p, gamma = cg_step(dia, x, r, p, gamma)
        assert float(gamma) < 1e-4 * g0
        # True residual agrees with the recurrence residual.
        r_true = b - np.asarray(dia.matvec(x))
        np.testing.assert_allclose(
            float(np.linalg.norm(r_true)), float(jnp.linalg.norm(r)), rtol=1e-2
        )
