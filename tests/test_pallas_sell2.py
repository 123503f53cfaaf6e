"""Chunk-packed SlicedELL kernel (v2) — interpret-mode correctness.

The v2 kernels are RETIRED reference implementations (the v1 masked-chunk
kernel measures faster on TPU, and Mosaic cannot lower the gather
variant's cross-vreg sublane gathers — see the module docstring and
BENCH_NOTES.md), but the packing transform and both kernel formulations
stay correctness-gated so they remain usable baselines for future
toolchains.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stormx.ops.pallas_sell2 import PackedSELL, pack_sell, supports_pallas2
from stormx.sparse.formats import CSR
from stormx.sparse.windowed import sell_from_csr


def _banded_csr(n=1000, band=40, seed=0):
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    for i in range(n):
        nnz = rng.integers(2, 8)
        c = np.unique(np.clip(i + rng.integers(-band, band + 1, nnz), 0, n - 1))
        rows += [i] * len(c)
        cols += list(c)
        vals += list(rng.standard_normal(len(c)))
    rows, cols, vals = map(np.asarray, (rows, cols, vals))
    rp = np.zeros(n + 1, np.int32)
    np.add.at(rp, rows + 1, 1)
    return CSR(
        data=jnp.asarray(vals.astype(np.float32)),
        indices=jnp.asarray(cols.astype(np.int32)),
        row_ptr=jnp.asarray(np.cumsum(rp).astype(np.int32)),
        shape=(n, n),
    )


@pytest.mark.parametrize("block_rows", [128, 256, 512])
@pytest.mark.parametrize("variant", ["matmul", "gather"])
def test_packed_matches_oracle(block_rows, variant):
    csr = _banded_csr()
    sell, _ = sell_from_csr(csr, block_rows=block_rows, mode="onehot", reorder=False)
    packed = pack_sell(sell, variant)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(csr.shape[0]).astype(np.float32))
    y_ref = np.asarray(sell.matvec(x))
    y2 = np.asarray(packed.matvec(x, interpret=True))
    rel = np.abs(y2 - y_ref).max() / np.abs(y_ref).max()
    assert rel < 1e-6


def test_packing_invariants():
    """Host packing: chunk constant per tile row, lanes preserved, every
    live nnz represented exactly once, guaranteed-zero last row."""
    csr = _banded_csr(seed=5)
    sell, _ = sell_from_csr(csr, block_rows=256, mode="onehot", reorder=False)
    packed = pack_sell(sell)
    idx = np.asarray(packed.idx)
    vals = np.asarray(packed.vals)
    chunk = (idx >> 7) & 31
    assert (chunk == chunk[:, :, :1]).all()  # constant per row
    assert (vals[:, -1, :] == 0).all()  # zero slot for dead srcrow targets
    # value multiset per (block, lane) matches the ELL arrays
    data = np.asarray(sell.data)
    nb, R, K = data.shape
    for b in (0, nb // 2, nb - 1):
        for lane in (0, 17, 127):
            ell_vals = data[b, lane::128, :].ravel()
            ell_vals = np.sort(ell_vals[ell_vals != 0])
            got = np.sort(vals[b, :, lane][vals[b, :, lane] != 0])
            assert np.array_equal(ell_vals, got)


def test_pack_rejects_unsupported():
    csr = _banded_csr()
    sell, _ = sell_from_csr(csr, block_rows=128, mode="onehot", reorder=False)
    assert supports_pallas2(sell)
    bad = sell.__class__(
        data=sell.data.astype(jnp.float64),
        local_cols=sell.local_cols,
        shape=sell.shape,
        window=sell.window,
        pad_lo=sell.pad_lo,
        mode=sell.mode,
        dense_blocks=None,
    )
    with pytest.raises(ValueError, match="f32"):
        pack_sell(bad)


def test_pytree_roundtrip():
    csr = _banded_csr()
    sell, _ = sell_from_csr(csr, block_rows=128, mode="onehot", reorder=False)
    packed = pack_sell(sell, "gather")
    leaves, td = jax.tree_util.tree_flatten(packed)
    packed2 = jax.tree_util.tree_unflatten(td, leaves)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(csr.shape[0]).astype(np.float32))
    assert np.array_equal(
        np.asarray(packed.matvec(x, interpret=True)),
        np.asarray(packed2.matvec(x, interpret=True)),
    )
