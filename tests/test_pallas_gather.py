"""BandedGatherPlan: scalar-prefetched per-block-window Pallas gather —
bit-exact vs ``x[idx]`` (interpret mode on CPU; hardware validation +
measurement in scripts/perf_fvm_gather.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from stormx.ops.pallas_gather import BandedGatherPlan


@pytest.fixture
def x(rng):
    return rng.standard_normal(5000).astype(np.float32)


class TestBandedGather:
    def test_sorted_rectangular(self, rng, x):
        idx = np.sort(rng.integers(0, 5000, 11000))
        plan = BandedGatherPlan(idx, 5000)
        assert plan.window <= 1024  # locally narrow
        y = np.asarray(plan(jnp.asarray(x)))
        assert (y == x[idx]).all()

    def test_outliers_go_to_fixup(self, rng, x):
        idx = np.sort(rng.integers(0, 5000, 11000))
        idx[::977] = rng.integers(0, 5000, len(idx[::977]))
        plan = BandedGatherPlan(idx, 5000)
        assert plan.window <= 1024
        assert 0 < int(plan.fix_pos.size) <= 0.01 * len(idx)
        assert (np.asarray(plan(jnp.asarray(x))) == x[idx]).all()

    def test_vector_field(self, rng, x):
        idx = np.sort(rng.integers(0, 5000, 7000))
        xv = rng.standard_normal((5000, 4)).astype(np.float32)
        plan = BandedGatherPlan(idx, 5000)
        assert (np.asarray(plan(jnp.asarray(xv))) == xv[idx]).all()

    def test_random_idx_still_exact(self, rng, x):
        # Worst case: no band at all — wide window + fixups, still exact.
        idx = rng.integers(0, 5000, 3000)
        plan = BandedGatherPlan(idx, 5000)
        assert (np.asarray(plan(jnp.asarray(x))) == x[idx]).all()

    def test_tiny_and_edge(self, rng, x):
        for mm in (1, 127, 129):
            idx = np.sort(rng.integers(0, 5000, mm))
            plan = BandedGatherPlan(idx, 5000)
            assert (np.asarray(plan(jnp.asarray(x))) == x[idx]).all(), mm

    def test_mesh_face_maps(self):
        # The motivating maps: face→inner-cell and cell←face on a real mesh
        # with faces sorted by inner cell (label-stable).
        from stormx.mesh.structured import structured_tri_rect

        m = structured_tri_rect(40, 32)
        perm = np.arange(m.num_faces)
        r = m.face_label_ranges
        for L in range(len(r) - 1):
            blk = slice(r[L], r[L + 1])
            perm[blk] = perm[blk][np.argsort(m.face_cells[blk, 0], kind="stable")]
        ms = m.permute("face", perm)
        x = np.random.default_rng(3).standard_normal(ms.num_cells).astype(np.float32)
        plan = BandedGatherPlan(ms.face_cells[:, 0], ms.num_cells)
        assert (np.asarray(plan(jnp.asarray(x))) == x[ms.face_cells[:, 0]]).all()

    def test_bad_inputs(self):
        with pytest.raises(ValueError):
            BandedGatherPlan(np.array([[1, 2]]), 10)
        with pytest.raises(ValueError):
            BandedGatherPlan(np.array([10]), 10)
        with pytest.raises(ValueError):
            BandedGatherPlan(np.array([1]), 10, block_rows=100)


def test_wide_map_falls_back_to_xla_gather():
    """A map too wide for the chunk budget must degrade to the plain XLA
    gather (bit-exact) instead of building a kernel with hundreds of window
    refs (round-3 advisor finding)."""
    rng = np.random.default_rng(5)
    idx = rng.integers(0, 100_000, 20_000)
    plan = BandedGatherPlan(idx, 100_000, fixup_frac=0.0001)
    assert plan.xla_fallback
    x = rng.standard_normal(100_000).astype(np.float32)
    assert np.array_equal(np.asarray(plan(x, interpret=True)), x[idx])
    # 2-component arrays ride the same path
    x2 = rng.standard_normal((100_000, 2)).astype(np.float32)
    assert np.array_equal(np.asarray(plan(x2, interpret=True)), x2[idx])
