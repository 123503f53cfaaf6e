"""Two-point flux div-grad operator — the Cahn–Hilliard building block.

Reference: ``stormDivGrad`` (``source_apps/playground/Playground.cpp:116-131``):

    for each interior face:
        flux = dt·(c[outer] − c[inner]) / ‖center_outer − center_inner‖
        u[inner] += (area/vol_inner)·flux
        u[outer] −= (area/vol_outer)·flux

TPU-native formulation: the per-face flux is one vectorized gather pass, and
the per-cell accumulation uses the cell←face ELL incidence table — a second
gather — so **no scatter** appears (SURVEY §7 hard-part 1: TPU gathers
vectorize, scatters serialize).  The same code path doubles as the SpMV of
the implicitly-assembled weighted-Laplacian; ``assemble_divgrad`` produces
the equivalent explicit ELL matrix for preconditioning/benchmarks.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from stormx.ops import safe_divide

__all__ = [
    "div_grad",
    "face_flux_coefficients",
    "assemble_divgrad",
    "assemble_laplacian",
    "assemble_divgrad_dia",
]


def face_flux_coefficients(dmesh):
    """Per-face coefficient area/dist for interior faces, 0 on boundary."""
    return safe_divide(dmesh.face_areas, dmesh.face_dist)


def div_grad(dmesh, u, dt, c):
    """u += dt·∇·(∇c) in the reference's discrete form (no-flux boundary).

    ``u``/``c`` are cell fields ``(num_cells,)`` or ``(num_cells, nv)``.
    """
    coef = face_flux_coefficients(dmesh)  # (num_faces,)
    if getattr(dmesh, "bg_face_inner", None) is not None:
        # Pallas banded gathers (bit-exact; boundary outer→inner clamp is
        # equivalent to the 0-clamp since coef = 0 there).
        c_inner = dmesh.bg_face_inner(c)
        c_outer = dmesh.bg_face_outer(c)
    else:
        c_inner = c[dmesh.face_inner]
        c_outer = c[jnp.maximum(dmesh.face_outer, 0)]  # clamp; coef=0 on bdry
    diff = c_outer - c_inner
    flux = dt * coef[..., None] * diff if c.ndim == 2 else dt * coef * diff

    # Gather-accumulate: Σ_k sign·flux[face_k] / volume.
    if getattr(dmesh, "bg_cell_face", None) is not None:
        K = dmesh.cell_face_ell.shape[1]
        g = dmesh.bg_cell_face(flux).reshape(
            (dmesh.num_cells, K) + flux.shape[1:]
        )
    else:
        g = flux[dmesh.cell_face_ell]  # (num_cells, K[, nv])
    sgn = dmesh.cell_face_sign
    vol = dmesh.cell_volumes
    if c.ndim == 2:
        acc = jnp.sum(sgn[..., None] * g, axis=1) / vol[:, None]
    else:
        acc = jnp.sum(sgn * g, axis=1) / vol
    return u + acc


def assemble_divgrad(mesh, scale=1.0):
    """Explicitly assemble the div-grad operator as an ELL matrix.

    Row i: Σ_f (area_f/dist_f)·(c_adj − c_i)·scale / vol_i — symmetric up to
    the volume weighting; with unit volumes it is the graph Laplacian.
    Host-side (NumPy), returns :class:`stormx.sparse.ELL`.
    """
    from stormx.sparse import COO

    interior = mesh.interior_faces()
    inner = mesh.face_cells[interior, 0]
    outer = mesh.face_cells[interior, 1]
    dist = np.linalg.norm(
        mesh.cell_centers[outer] - mesh.cell_centers[inner], axis=1
    )
    w = scale * mesh.face_areas[interior] / dist

    vol = mesh.cell_volumes
    rows = np.concatenate([inner, outer, inner, outer])
    cols = np.concatenate([outer, inner, inner, outer])
    data = np.concatenate(
        [w / vol[inner], w / vol[outer], -w / vol[inner], -w / vol[outer]]
    )
    coo = COO(
        data=jnp.asarray(data),
        rows=jnp.asarray(rows.astype(np.int32)),
        cols=jnp.asarray(cols.astype(np.int32)),
        shape=(mesh.num_cells, mesh.num_cells),
    )
    from stormx.sparse import ell_from_csr

    return ell_from_csr(coo.to_csr())


def assemble_laplacian(mesh, scale=1.0):
    """Assemble the SYMMETRIC two-point-flux Laplacian L (no 1/volume row
    weighting): diag Σ_f w_f, off-diag −w_f with w_f = area_f/dist_f.

    L is SPD up to the constant nullspace (pure-Neumann closure), so CG is
    safe on ANY mesh — the volume-weighted ``assemble_divgrad`` form
    V⁻¹L is what the reference applies (``Playground.cpp:116-131``); the two
    solve the same problem via L·x = V·rhs.  Returns an ELL operator.
    """
    from stormx.sparse import COO, ell_from_csr

    interior = mesh.interior_faces()
    inner = mesh.face_cells[interior, 0]
    outer = mesh.face_cells[interior, 1]
    dist = np.linalg.norm(
        mesh.cell_centers[outer] - mesh.cell_centers[inner], axis=1
    )
    w = scale * mesh.face_areas[interior] / dist

    rows = np.concatenate([inner, outer, inner, outer])
    cols = np.concatenate([outer, inner, inner, outer])
    data = np.concatenate([-w, -w, w, w])
    coo = COO(
        data=jnp.asarray(data),
        rows=jnp.asarray(rows.astype(np.int32)),
        cols=jnp.asarray(cols.astype(np.int32)),
        shape=(mesh.num_cells, mesh.num_cells),
    )
    return ell_from_csr(coo.to_csr())


def assemble_divgrad_dia(mesh, scale=1.0, *, reorder=False, max_diags=64):
    """Assemble div-grad as a banded :class:`stormx.sparse.DIA` operator.

    The gather-free TPU fast path: on (quasi-)structured meshes the cell
    adjacency has a handful of distinct index offsets and the banded SpMV
    streams at HBM roofline (no gather).  On fully unstructured meshes RCM
    (``reorder=True``) minimizes the bandwidth but the *number of distinct
    offsets* stays O(bandwidth) — ``max_diags`` guards against paying
    O(num_diags·n) traffic; fall back to :func:`assemble_divgrad` (ELL)
    above that.

    Returns ``(dia, perm)`` with ``perm[new] = old`` cell order (identity
    when ``reorder=False``); solve in permuted space and scatter back with
    ``x[perm] = x_permuted`` … i.e. ``x_old = x_new[inv]``.
    """
    from stormx.sparse import dia_from_csr

    ell = assemble_divgrad(mesh, scale)
    n = mesh.num_cells
    cols = np.asarray(ell.cols)
    data = np.asarray(ell.data)
    rows = np.repeat(np.arange(n), cols.shape[1])
    flat_cols = cols.reshape(-1)
    flat_data = data.reshape(-1)
    keep = flat_data != 0.0
    rows, flat_cols, flat_data = rows[keep], flat_cols[keep], flat_data[keep]

    if reorder:
        from stormx.parallel import rcm_order

        perm = rcm_order(n, rows, flat_cols.astype(np.int64))
    else:
        perm = np.arange(n, dtype=np.int64)
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n)
    rows = inv[rows]
    flat_cols = inv[flat_cols]

    order = np.lexsort((flat_cols, rows))
    rows, flat_cols, flat_data = rows[order], flat_cols[order], flat_data[order]
    row_ptr = np.zeros(n + 1, dtype=np.int32)
    np.add.at(row_ptr, rows.astype(np.int64) + 1, 1)

    from stormx.sparse import CSR

    csr = CSR(
        data=jnp.asarray(flat_data),
        indices=jnp.asarray(flat_cols.astype(np.int32)),
        row_ptr=jnp.asarray(np.cumsum(row_ptr).astype(np.int32)),
        shape=(n, n),
    )
    return dia_from_csr(csr, max_diags=max_diags), perm
