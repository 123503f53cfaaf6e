"""Cheap on-chip Pallas correctness gate (VERDICT r3 item 8).

Asserts the two production Mosaic kernels — the SlicedELL window-gather
SpMV (`stormx.ops.pallas_sell`) and the banded-gather index map
(`stormx.ops.pallas_gather.BandedGatherPlan`) — agree with their XLA
oracles ON THE REAL CHIP at tiny size, so a Mosaic/toolchain regression
fails loudly in seconds instead of wedging a 10-minute bench.

Run standalone (`timeout 300 python scripts/verify_tpu.py`) or via
``verify_pallas_on_chip()`` — called by bench.py before timing.  Both
programs are tiny and land in the persistent compile cache.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def verify_pallas_on_chip() -> None:
    """Raise AssertionError if either Pallas kernel disagrees with XLA."""
    import jax
    import jax.numpy as jnp

    from stormx.ops.pallas_gather import BandedGatherPlan
    from stormx.ops.pallas_sell import sell_matvec_pallas
    from stormx.sparse.formats import CSR
    from stormx.sparse.windowed import sell_from_csr

    interpret = jax.default_backend() != "tpu"
    rng = np.random.default_rng(11)

    # SlicedELL kernel vs the XLA dense-window einsum, n=512 tridiagonal-ish.
    n = 512
    rows, cols, vals = [], [], []
    for i in range(n):
        for j in (i - 2, i, i + 1):
            if 0 <= j < n:
                rows.append(i), cols.append(j), vals.append(rng.standard_normal())
    rows, cols, vals = map(np.asarray, (rows, cols, vals))
    rp = np.zeros(n + 1, np.int32)
    np.add.at(rp, rows + 1, 1)
    csr = CSR(
        data=jnp.asarray(vals.astype(np.float32)),
        indices=jnp.asarray(cols.astype(np.int32)),
        row_ptr=jnp.asarray(np.cumsum(rp).astype(np.int32)),
        shape=(n, n),
    )
    sell, _ = sell_from_csr(csr, mode="dense", reorder=False)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    y_ref = np.asarray(sell.matvec(x))
    y_pal = np.asarray(sell_matvec_pallas(sell, x, interpret=interpret))
    rel = np.abs(y_pal - y_ref).max() / max(np.abs(y_ref).max(), 1e-30)
    assert rel < 1e-5, f"pallas_sell on-chip mismatch: rel err {rel:.3e}"

    # BandedGatherPlan vs x[idx] — bit-exact contract.
    idx = np.clip(np.arange(2048) + rng.integers(-30, 31, 2048), 0, 1023)
    plan = BandedGatherPlan(idx, 1024, block_rows=512)
    src = jnp.asarray(rng.standard_normal(1024).astype(np.float32))
    got = np.asarray(plan(src, interpret=interpret))
    want = np.asarray(src)[idx]
    assert np.array_equal(got, want), "BandedGatherPlan on-chip mismatch"


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    verify_pallas_on_chip()
    print("TPU PALLAS VERIFY OK", flush=True)


if __name__ == "__main__":
    main()
