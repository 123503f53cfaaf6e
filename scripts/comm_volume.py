"""Communication-volume scaling table (BASELINE ">=80% scaling" proxy).

Exact bytes-moved-per-apply vs owned-operator-bytes for all four
distributed operator paths at P ∈ {2, 4, 8, 16}, computed from partition
metadata alone (no device execution — run anywhere).

    python scripts/comm_volume.py

Paths × operators:
* CSR shared-pool, SlicedELL band, BSR pool — the 79,672-cell step-mesh
  convection-diffusion operator (the unstructured flagship);
* DIA halo — the 4.19M-row 5-diagonal headline operator.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from stormx.fvm import assemble_convection_diffusion
    from stormx.mesh import read_tetgen
    from stormx.parallel import partition_csr
    from stormx.parallel.banded import partition_dia
    from stormx.parallel.bsr import partition_bsr
    from stormx.parallel.commvol import (
        bsr_pool_volume,
        csr_pool_volume,
        dia_halo_volume,
        sliced_band_volume,
    )
    from stormx.parallel.sliced import partition_sliced
    from stormx.sparse.formats import bsr_from_csr, dia_from_csr
    from stormx.sparse.windowed import sell_from_csr

    mesh = read_tetgen("/root/reference/tests/_data/mesh/step.1.")

    def vel(r):
        c = r - 0.5
        return np.stack([-c[:, 1] - 0.4, c[:, 0] + 0.8], axis=1)

    step_csr = assemble_convection_diffusion(mesh, vel, 0.05).to_csr()

    # 4.19M-row 5-point Poisson (the DIA headline operator).
    nx = 2048
    n = nx * nx
    idx = np.arange(n)
    i, j = idx // nx, idx % nx
    rows, cols, vals = [idx], [idx], [np.full(n, 4.0)]
    for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        ii, jj = i + di, j + dj
        m = (ii >= 0) & (ii < nx) & (jj >= 0) & (jj < nx)
        rows.append(idx[m])
        cols.append((ii * nx + jj)[m])
        vals.append(np.full(int(m.sum()), -1.0))
    rows = np.concatenate(rows)
    cols_a = np.concatenate(cols)
    vals = np.concatenate(vals)
    order = np.lexsort((cols_a, rows))
    from stormx.sparse.formats import CSR

    rp = np.zeros(n + 1, dtype=np.int64)
    np.add.at(rp, rows + 1, 1)
    big_csr = CSR(
        data=jnp.asarray(vals[order]),
        indices=jnp.asarray(cols_a[order].astype(np.int32)),
        row_ptr=jnp.asarray(np.cumsum(rp).astype(np.int32)),
        shape=(n, n),
    )
    big_dia = dia_from_csr(big_csr)

    print(f"{'path':26s} {'P':>3s} {'moved/apply':>12s} {'owned':>12s} {'ratio':>9s}")
    for P in (2, 4, 8, 16):
        rep = csr_pool_volume(partition_csr(step_csr, P))
        print(f"{'step CSR pool':26s} {P:3d} {rep['moved_bytes']:12d} "
              f"{rep['owned_bytes']:12d} {rep['ratio']:9.4f}")
    for P in (2, 4, 8, 16):
        rep = sliced_band_volume(partition_sliced(step_csr, P, mode="dense"))
        print(f"{'step SlicedELL band':26s} {P:3d} {rep['moved_bytes']:12d} "
              f"{rep['owned_bytes']:12d} {rep['ratio']:9.4f}")
    for P in (2, 4, 8, 16):
        rep = bsr_pool_volume(partition_bsr(bsr_from_csr(step_csr, 4), P))
        print(f"{'step BSR pool (b=4)':26s} {P:3d} {rep['moved_bytes']:12d} "
              f"{rep['owned_bytes']:12d} {rep['ratio']:9.4f}")
    for P in (2, 4, 8, 16):
        rep = dia_halo_volume(partition_dia(big_dia, P))
        print(f"{'4.2M DIA halo':26s} {P:3d} {rep['moved_bytes']:12d} "
              f"{rep['owned_bytes']:12d} {rep['ratio']:9.4f}")


if __name__ == "__main__":
    main()
