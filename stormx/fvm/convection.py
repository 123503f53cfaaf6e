"""Upwind convection schemes: 1st-order and limited 2nd-order (linear).

Reference: ``Feathers/ConvectionScheme.hpp:57-198``.  The reference's two
serial face loops (interior flux scatter + per-label boundary loop) become:

  1. one vectorized flux evaluation over ALL faces (interior + per-label
     ghost states, each label a *static* slice thanks to label-sorted faces),
  2. one gather-accumulate over the signed cell←face ELL table,

so the whole operator is gathers + VPU math — the same structure as ELL SpMV
(SURVEY §3.5).  ``div_f`` carries the (area/vol) weights of
``ConvectionScheme.hpp:165-174``.
"""

from __future__ import annotations

import jax.numpy as jnp

from stormx.fvm.flux import lax_friedrichs_flux
from stormx.fvm.gradient import lsq_gradient_matrices, lsq_gradients
from stormx.fvm.limiter import compute_limiters, cubic_limiter, cubic_second_limiter

__all__ = ["upwind_convection", "linear_upwind_convection"]


def _accumulate(dmesh, face_flux):
    """div_f[c] = Σ_f sign·(area_f/vol_c)·flux_f via the gather table."""
    af = face_flux * dmesh.face_areas[:, None]  # (num_faces, nv)
    if getattr(dmesh, "bg_cell_face", None) is not None:
        K = dmesh.cell_face_ell.shape[1]
        g = dmesh.bg_cell_face(af).reshape(dmesh.num_cells, K, af.shape[1])
    else:
        g = af[dmesh.cell_face_ell]  # (n, K, nv)
    acc = jnp.sum(dmesh.cell_face_sign[..., None] * g, axis=1)
    return acc / dmesh.cell_volumes[:, None]


def _face_states(dmesh, u):
    """(u[face_inner], u[face_outer clamped]) via the fast gathers when
    available (bit-exact)."""
    if getattr(dmesh, "bg_face_inner", None) is not None:
        return dmesh.bg_face_inner(u), dmesh.bg_face_outer(u)
    return u[dmesh.face_inner], u[jnp.maximum(dmesh.face_outer, 0)]


def _boundary_ghosts(dmesh, u_face_inner, bcs):
    """Ghost states for every boundary face, per label group (static slices).

    ``u_face_inner``: (num_faces, nv) reconstructed inner-side states.
    Returns the full outer-side state array (interior entries untouched —
    caller overwrites them with actual outer values first).

    Every boundary label that actually has faces MUST have a BC entry — the
    reference wires an explicit BC per label (``SkunkFvSolver.hpp:73-74``);
    silently treating an unhandled label as zero-gradient would be wrong
    physics with no error.
    """
    ranges = dmesh.face_label_ranges
    missing = [
        label
        for label in range(1, len(ranges) - 1)
        if ranges[label + 1] > ranges[label] and label not in bcs
    ]
    if missing:
        from stormx.core.exceptions import StormError

        raise StormError(
            f"boundary labels {missing} have faces but no boundary condition;"
            " pass a BC for every label (reference SkunkFvSolver.hpp:73-74)"
        )
    ghosts = u_face_inner
    for label, bc in bcs.items():
        lo, hi = ranges[label], ranges[label + 1]
        if hi <= lo:
            continue
        n = dmesh.face_normals[lo:hi]
        r = dmesh.face_centers[lo:hi]
        g = bc(n, r, u_face_inner[lo:hi])
        ghosts = ghosts.at[lo:hi].set(g)
    return ghosts


def upwind_convection(dmesh, u, bcs, flux_scheme=lax_friedrichs_flux):
    """1st-order upwind convection (ConvectionScheme.hpp:57-109).

    ``u``: (num_cells, nv) conserved states; ``bcs``: {label: bc_fn}.
    Returns div_f (num_cells, nv).
    """
    n_int = dmesh.face_label_ranges[1]  # interior faces sorted first
    u_inner, u_out_raw = _face_states(dmesh, u)  # (num_faces, nv)
    ghosts = _boundary_ghosts(dmesh, u_inner, bcs)
    u_outer = jnp.concatenate([u_out_raw[:n_int], ghosts[n_int:]])
    flux = flux_scheme(dmesh.face_normals, u_outer, u_inner)
    return _accumulate(dmesh, flux)


def linear_upwind_convection(
    dmesh,
    u,
    bcs,
    flux_scheme=lax_friedrichs_flux,
    *,
    g_mats=None,
    slope_limiter=cubic_limiter,
    second_limiter=cubic_second_limiter,
):
    """2nd-order limited upwind convection (ConvectionScheme.hpp:113-198).

    Gradients (LSQ) → limiters → limited linear face reconstruction →
    flux → gather-accumulate.
    """
    if g_mats is None:
        g_mats = lsq_gradient_matrices(dmesh)
    grad_u = lsq_gradients(dmesh, u, g_mats)  # (n, nv, d)
    lim_u = compute_limiters(
        dmesh, u, grad_u, slope_limiter=slope_limiter, second_limiter=second_limiter
    )
    grad_u = grad_u * lim_u[..., None]  # :146-148

    # Face reconstruction u ± ∇u·dr (:161-169).
    if getattr(dmesh, "bg_face_inner", None) is not None:
        cc_inner = dmesh.bg_face_inner(dmesh.cell_centers)
        cc_outer = dmesh.bg_face_outer(dmesh.cell_centers)
        gi = dmesh.bg_face_inner(grad_u.reshape(dmesh.num_cells, -1))
        go = dmesh.bg_face_outer(grad_u.reshape(dmesh.num_cells, -1))
        grad_i = gi.reshape((-1,) + grad_u.shape[1:])
        grad_o = go.reshape((-1,) + grad_u.shape[1:])
        ui0, uo0 = _face_states(dmesh, u)
    else:
        outer_idx = jnp.maximum(dmesh.face_outer, 0)
        cc_inner = dmesh.cell_centers[dmesh.face_inner]
        cc_outer = dmesh.cell_centers[outer_idx]
        grad_i = grad_u[dmesh.face_inner]
        grad_o = grad_u[outer_idx]
        ui0, uo0 = u[dmesh.face_inner], u[outer_idx]
    dr_inner = dmesh.face_centers - cc_inner
    dr_outer = dmesh.face_centers - cc_outer
    u_inner = ui0 + jnp.einsum("fvd,fd->fv", grad_i, dr_inner)
    u_outer = uo0 + jnp.einsum("fvd,fd->fv", grad_o, dr_outer)

    # Boundary ghosts from the *reconstructed* inner state (:177-189).
    n_int = dmesh.face_label_ranges[1]
    ghosts = _boundary_ghosts(dmesh, u_inner, bcs)
    u_outer = jnp.concatenate([u_outer[:n_int], ghosts[n_int:]])

    flux = flux_scheme(dmesh.face_normals, u_outer, u_inner)
    return _accumulate(dmesh, flux)
