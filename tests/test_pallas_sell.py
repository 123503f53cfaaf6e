"""Pallas SlicedELL window-gather kernel (VERDICT r2 #1): interpret-mode
semantics on CPU; compiled correctness + the measured ≥3× win live in
scripts/perf_sell_pallas.py (TPU, slope protocol — see BENCH_NOTES.md).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from stormx.fvm.divgrad import assemble_laplacian
from stormx.mesh.structured import structured_tri_rect
from stormx.ops.pallas_sell import sell_matvec_pallas, supports_pallas
from stormx.sparse.formats import CSR, ell_from_csr
from stormx.sparse.windowed import auto_operator, sell_from_csr


def f32_csr(mesh):
    csr = assemble_laplacian(mesh).to_csr()
    return CSR(
        data=jnp.asarray(np.asarray(csr.data, dtype=np.float32)),
        indices=csr.indices,
        row_ptr=csr.row_ptr,
        shape=csr.shape,
    )


class TestPallasSell:
    @pytest.mark.parametrize("block_rows", [128, 256])
    def test_matches_ell_oracle(self, block_rows):
        mesh = structured_tri_rect(40, 32)  # 2560 cells
        csr = f32_csr(mesh)
        sell, perm = sell_from_csr(csr, mode="pallas", block_rows=block_rows)
        assert supports_pallas(sell)
        n = csr.shape[0]
        inv = np.empty(n, dtype=np.int64)
        inv[perm] = np.arange(n)

        rng = np.random.default_rng(0)
        x = rng.standard_normal(n).astype(np.float32)
        # Oracle: plain ELL gather on the unpermuted operator.
        ell = ell_from_csr(csr)
        y_oracle = np.asarray(ell.matvec(jnp.asarray(x)))
        # Kernel works in permuted space (interpret mode on CPU).
        y_pal = np.asarray(sell.matvec(jnp.asarray(x[perm])))[inv]
        rel = np.abs(y_pal - y_oracle).max() / np.abs(y_oracle).max()
        assert rel < 1e-5

    def test_mode_dispatch_through_matvec(self):
        mesh = structured_tri_rect(16, 16)
        csr = f32_csr(mesh)
        s_pal, perm = sell_from_csr(csr, mode="pallas")
        s_dense, _ = sell_from_csr(csr, mode="dense")
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal(csr.shape[0]).astype(np.float32)
        )
        xp = x[jnp.asarray(perm)]
        np.testing.assert_allclose(
            np.asarray(s_pal.matvec(xp)),
            np.asarray(s_dense.matvec(xp)),
            rtol=2e-5,
            atol=1e-6,
        )

    def test_supports_pallas_gates(self):
        mesh = structured_tri_rect(16, 16)
        csr64 = assemble_laplacian(mesh).to_csr()  # fp64 on CPU suite
        sell, _ = sell_from_csr(csr64, mode="dense")
        assert not supports_pallas(sell)
        with pytest.raises(ValueError):
            sell_matvec_pallas(sell, jnp.zeros(csr64.shape[0]))

    def test_auto_operator_resolves_off_tpu(self):
        # On CPU, mode="auto" must NOT pick the pallas path (interpret mode
        # is a test vehicle, not a production path); with few diagonals the
        # structured mesh resolves to DIA regardless.
        mesh = structured_tri_rect(16, 16)
        op, _ = auto_operator(f32_csr(mesh), max_diags=1)  # force non-DIA
        from stormx.sparse.windowed import SlicedELL

        if isinstance(op, SlicedELL):
            assert op.mode == "dense"

    def test_coords_ordering_shrinks_window(self):
        # bandwidth_order picks the best of RCM and coordinate sorts; on
        # the long-thin structured strip the x-sort must win or tie, and
        # the matvec must still match the oracle.
        from stormx.mesh.structured import structured_tri_rect

        mesh = structured_tri_rect(96, 8)  # long in x
        csr = f32_csr(mesh)
        s_rcm, _ = sell_from_csr(csr, mode="dense")
        s_xy, perm = sell_from_csr(
            csr, mode="dense", coords=np.asarray(mesh.cell_centers)
        )
        assert s_xy.window <= s_rcm.window
        n = csr.shape[0]
        inv = np.empty(n, dtype=np.int64)
        inv[perm] = np.arange(n)
        x = np.random.default_rng(5).standard_normal(n).astype(np.float32)
        ell = ell_from_csr(csr)
        y_oracle = np.asarray(ell.matvec(jnp.asarray(x)))
        y = np.asarray(s_xy.matvec(jnp.asarray(x[perm])))[inv]
        np.testing.assert_allclose(
            y, y_oracle, atol=2e-6 * np.abs(y_oracle).max()
        )
