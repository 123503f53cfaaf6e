"""Scalar upwind convection–diffusion operator — BASELINE config #2's
"nonsymmetric convection-diffusion CSR operator", assembled from the mesh.

The operator is the genuine FVM discretization the reference's scheme
catalog produces for a passively-advected scalar:

    A·u = div(v·u) − ε·∇²u        (volume-weighted rows)

* convection: 1st-order upwind flux per face (the scalar specialization of
  ``UpwindConvectionScheme``, ``Feathers/ConvectionScheme.hpp:57-109``) —
  ``flux_f = (v·n)⁺·u_inner + (v·n)⁻·u_outer``; boundary closure is
  zero-value inflow / free outflow (a scalar far-field with farfield value
  0, ``Feathers/SkunkFvBC.hpp:71-90``).
* diffusion: the two-point flux of ``stormDivGrad``
  (``Playground.cpp:116-131``) on interior faces (no-flux boundary), i.e.
  exactly :func:`stormx.fvm.divgrad.div_grad`.

Two forms are provided and tested against each other:

* :func:`convection_diffusion_operator` — the matrix-free device operator
  composed from the repo's own FVM ops (``upwind_convection`` with a scalar
  flux closure + ``div_grad``);
* :func:`assemble_convection_diffusion` — the same operator assembled
  host-side into an explicit sparse matrix (→ CSR/ELL), which is what the
  partitioned BiCGStab+Jacobi config solves.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "face_normal_velocity",
    "scalar_upwind_flux",
    "zero_farfield_bc",
    "convection_diffusion_operator",
    "assemble_convection_diffusion",
]


def face_normal_velocity(mesh, velocity):
    """Per-face normal velocity v(face_center)·n (host NumPy).

    ``velocity``: callable ``r -> (m, dim)`` or a constant ``(dim,)`` array.
    """
    centers = np.asarray(mesh.face_centers)
    normals = np.asarray(mesh.face_normals)
    if callable(velocity):
        vel = np.asarray(velocity(centers))
    else:
        vel = np.broadcast_to(np.asarray(velocity), centers.shape)
    return np.einsum("fd,fd->f", vel, normals)


def scalar_upwind_flux(vn):
    """Flux-scheme closure for :func:`stormx.fvm.convection.upwind_convection`
    advecting a scalar with per-face normal velocity ``vn``:
    flux = (v·n)⁺·u_in + (v·n)⁻·u_out (upwind selection)."""
    vn = jnp.asarray(vn)

    def flux(n, u_out, u_in):
        v = vn[:, None]
        return jnp.where(v > 0, v * u_in, v * u_out)

    return flux


def zero_farfield_bc(n, r, u_inner):
    """Scalar far-field with value 0: inflow faces advect 0 in; outflow
    faces never read the ghost (upwind selects the inner state)."""
    return jnp.zeros_like(u_inner)


def convection_diffusion_operator(dmesh, vn, eps, bcs=None):
    """Matrix-free A·u = div(v·u) − ε·∇²u from the repo's own FVM ops.

    ``vn``: per-face normal velocity (see :func:`face_normal_velocity`).
    Returns a callable on (num_cells,) cell fields.
    """
    from stormx.fvm.convection import upwind_convection
    from stormx.fvm.divgrad import div_grad

    if bcs is None:
        bcs = {
            label: zero_farfield_bc
            for label in range(1, len(dmesh.face_label_ranges) - 1)
        }
    flux = scalar_upwind_flux(vn)

    def apply(u):
        conv = upwind_convection(dmesh, u[:, None], bcs, flux_scheme=flux)[:, 0]
        return div_grad(dmesh, conv, -eps, u)

    return apply


def assemble_convection_diffusion(mesh, velocity, eps):
    """Host-side assembly of the upwind convection–diffusion operator.

    Row stencil (volume-weighted, matching the matrix-free form exactly):

    interior face f = (i → o), a = area_f, w = ε·a/dist_f, c = a·(v·n)_f:
        row i:  u_i · (c⁺ + w)/vol_i  +  u_o · (c⁻ − w)/vol_i
        row o:  u_o · (−c⁻ + w)/vol_o +  u_i · (−c⁺ − w)/vol_o
    boundary face of cell i (zero-value inflow / free outflow; diffusion is
    no-flux as in ``div_grad``):
        row i:  u_i · c⁺/vol_i

    Returns a :class:`stormx.sparse.ELL` (convert with ``.to_csr()``).
    """
    from stormx.sparse import COO, ell_from_csr

    vn = face_normal_velocity(mesh, velocity)
    vol = np.asarray(mesh.cell_volumes)
    area = np.asarray(mesh.face_areas)

    interior = mesh.interior_faces()
    inner = mesh.face_cells[interior, 0]
    outer = mesh.face_cells[interior, 1]
    dist = np.linalg.norm(
        mesh.cell_centers[outer] - mesh.cell_centers[inner], axis=1
    )
    w = eps * area[interior] / dist
    c = area[interior] * vn[interior]
    c_pos = np.maximum(c, 0.0)
    c_neg = np.minimum(c, 0.0)

    boundary = mesh.boundary_faces()
    b_inner = mesh.face_cells[boundary, 0]
    cb_pos = np.maximum(area[boundary] * vn[boundary], 0.0)

    rows = np.concatenate([inner, inner, outer, outer, b_inner])
    cols = np.concatenate([inner, outer, outer, inner, b_inner])
    data = np.concatenate(
        [
            (c_pos + w) / vol[inner],
            (c_neg - w) / vol[inner],
            (-c_neg + w) / vol[outer],
            (-c_pos - w) / vol[outer],
            cb_pos / vol[b_inner],
        ]
    )
    coo = COO(
        data=jnp.asarray(data),
        rows=jnp.asarray(rows.astype(np.int32)),
        cols=jnp.asarray(cols.astype(np.int32)),
        shape=(mesh.num_cells, mesh.num_cells),
    )
    return ell_from_csr(coo.to_csr())
