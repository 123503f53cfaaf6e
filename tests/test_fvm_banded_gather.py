"""FVM ops through the Pallas banded gathers (interpret mode on CPU):
outputs must be BIT-IDENTICAL to the XLA-gather path — gather is pure
selection, so any difference is a wiring bug."""

import numpy as np
import pytest

import jax.numpy as jnp

from stormx.fvm.bc import far_field_bc, slip_bc
from stormx.fvm.convection import linear_upwind_convection, upwind_convection
from stormx.fvm.divgrad import div_grad
from stormx.fvm.gradient import lsq_gradients
from stormx.fvm.limiter import compute_limiters
from stormx.mesh.structured import structured_tri_rect


@pytest.fixture(scope="module")
def meshes():
    m = structured_tri_rect(24, 20).optimize_for_tpu()
    return m.device_arrays(), m.device_arrays(banded_gather=True)


class TestBandedGatherFvm:
    def test_optimize_preserves_geometry(self):
        m0 = structured_tri_rect(24, 20)
        m1 = m0.optimize_for_tpu()
        assert np.isclose(m1.cell_volumes.sum(), m0.cell_volumes.sum())
        assert m1.num_faces == m0.num_faces
        np.testing.assert_array_equal(
            np.sort(m1.face_labels), np.sort(m0.face_labels)
        )

    def test_div_grad_bit_identical(self, meshes, rng):
        dm, dmb = meshes
        c = jnp.asarray(rng.standard_normal(dm.num_cells))
        u = jnp.asarray(rng.standard_normal(dm.num_cells))
        y0 = np.asarray(div_grad(dm, u, 0.1, c))
        y1 = np.asarray(div_grad(dmb, u, 0.1, c))
        assert (y0 == y1).all()
        # vector-valued field
        cv = jnp.asarray(rng.standard_normal((dm.num_cells, 3)))
        uv = jnp.zeros_like(cv)
        assert (
            np.asarray(div_grad(dm, uv, 0.1, cv))
            == np.asarray(div_grad(dmb, uv, 0.1, cv))
        ).all()

    def test_gradients_and_limiters_bit_identical(self, meshes, rng):
        dm, dmb = meshes
        u = jnp.asarray(rng.standard_normal((dm.num_cells, 4)))
        g0, g1 = lsq_gradients(dm, u), lsq_gradients(dmb, u)
        assert (np.asarray(g0) == np.asarray(g1)).all()
        l0 = compute_limiters(dm, u, g0)
        l1 = compute_limiters(dmb, u, g1)
        assert (np.asarray(l0) == np.asarray(l1)).all()

    @pytest.mark.parametrize("order", [1, 2])
    def test_convection_bit_identical(self, meshes, rng, order):
        from stormx.apps.euler import initial_state

        dm, dmb = meshes
        n = dm.num_cells
        u0 = np.asarray(initial_state(n))
        u = jnp.asarray(u0 * (1.0 + 0.02 * rng.random(u0.shape)))
        bcs = {
            L: (far_field_bc if L % 2 else slip_bc)
            for L in range(1, len(dm.face_label_ranges) - 1)
        }
        fn = upwind_convection if order == 1 else linear_upwind_convection
        y0 = np.asarray(fn(dm, u, bcs))
        y1 = np.asarray(fn(dmb, u, bcs))
        assert (y0 == y1).all()


def test_device_arrays_default_is_auto(monkeypatch):
    """banded_gather=None resolves by backend+dtype: plans on for TPU f32,
    off elsewhere (VERDICT r3 item 3 — fast path as default, opt-out)."""
    import jax

    m = structured_tri_rect(8, 6)
    # On the CPU test backend the auto default must stay off…
    dm = m.device_arrays(dtype=np.float32)
    assert dm.bg_face_inner is None
    # …and flip on when the backend reports TPU.
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    dm_tpu = m.device_arrays(dtype=np.float32)
    assert dm_tpu.bg_face_inner is not None
    # f64 never picks the f32-only plans.
    dm64 = m.device_arrays(dtype=np.float64)
    assert dm64.bg_face_inner is None
    # Explicit opt-out wins.
    dm_off = m.device_arrays(dtype=np.float32, banded_gather=False)
    assert dm_off.bg_face_inner is None
