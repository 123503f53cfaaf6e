"""Slope limiters (Barth–Jespersen/minmod, Venkatakrishnan, Michalak cubic)
and second limiters.

Reference: ``Feathers/GradientLimiterScheme.hpp:44-253``.  Each scalar
limiter λ(du_min, du_max, du_face, ε²) becomes a branch-free ``jnp.where``
chain evaluated for every (cell, face, var) at once; the per-cell min-reduce
over faces (``:236-244``) is a masked min over the cell_all_faces gather.
ε² = (0.1·V)³ (``:230-231``).
"""

from __future__ import annotations

import jax.numpy as jnp

from stormx.fvm.gradient import lsq_gradients

__all__ = [
    "minmod_limiter",
    "venkatakrishnan_limiter",
    "cubic_limiter",
    "dummy_second_limiter",
    "cubic_second_limiter",
    "compute_limiters",
]


def _deltas(du_min, du_max, du_face):
    """delta_pos selection (GradientLimiterScheme.hpp:55-64 et al.)."""
    return jnp.where(du_face < 0.0, du_min, du_max)


def minmod_limiter(du_min, du_max, du_face, eps_sqr):
    """min(1, Δ⁺/Δ⁻); 1 when Δ⁻ = 0 (:44-69)."""
    delta_pos = _deltas(du_min, du_max, du_face)
    safe = jnp.where(du_face == 0.0, 1.0, du_face)
    y = delta_pos / safe
    return jnp.where(du_face == 0.0, 1.0, jnp.minimum(1.0, y))


def venkatakrishnan_limiter(du_min, du_max, du_face, eps_sqr):
    """Differentiable limiter (:72-102)."""
    delta_pos = _deltas(du_min, du_max, du_face)
    dp2 = delta_pos**2
    dn2 = du_face**2
    dpn = delta_pos * du_face
    lim = (dp2 + 2.0 * dpn + eps_sqr) / (dp2 + 2.0 * dn2 + dpn + eps_sqr)
    return jnp.where(du_face == 0.0, 1.0, lim)


def cubic_limiter(du_min, du_max, du_face, eps_sqr):
    """Michalak Ollivier-Gooch cubic (:105-137)."""
    delta_pos = _deltas(du_min, du_max, du_face)
    safe = jnp.where(du_face == 0.0, 1.0, du_face)
    y = delta_pos / safe
    y_thr = 1.75
    y_div = y / y_thr
    cub = y + y_div**2 * (3.0 - 2.0 * y_thr + (y_thr - 2.0) * y_div)
    lim = jnp.where(y < y_thr, cub, 1.0)
    return jnp.where(du_face == 0.0, 1.0, lim)


def dummy_second_limiter(limiter, du_min, du_max, eps_sqr):
    """Identity second limiter (:142-157)."""
    return limiter


def cubic_second_limiter(limiter, du_min, du_max, eps_sqr):
    """Disable limiting in smooth regions (:160-183)."""
    du_sqr = (du_max - du_min) ** 2
    dy = (du_sqr - eps_sqr) / eps_sqr
    weight = (2.0 * dy - 3.0) * dy**2 + 1.0
    blended = weight + (1.0 - weight) * limiter
    return jnp.where(
        du_sqr <= eps_sqr, 1.0, jnp.where(du_sqr >= 2.0 * eps_sqr, limiter, blended)
    )


def compute_limiters(
    dmesh,
    u,
    grad_u,
    *,
    slope_limiter=cubic_limiter,
    second_limiter=cubic_second_limiter,
):
    """Per-cell limiter coefficients (GradientLimiterScheme.hpp:213-250).

    ``u``: (n,) or (n, nv); ``grad_u``: matching (n[, nv], dim).
    """
    scalar = u.ndim == 1
    if scalar:
        u = u[:, None]
        grad_u = grad_u[:, None, :]

    from stormx.fvm.gradient import gather_adjacent

    u_adj = gather_adjacent(dmesh, u)  # (n, K, nv)
    du_min = jnp.minimum(0.0, jnp.min(u_adj, axis=1) - u)  # (n, nv)
    du_max = jnp.maximum(0.0, jnp.max(u_adj, axis=1) - u)

    k = 0.1
    eps_sqr = (k * dmesh.cell_volumes) ** 3  # (n,) — :230-231
    eps_sqr = eps_sqr[:, None]

    faces = dmesh.cell_face_ell  # (n, K) all incident faces
    mask = dmesh.cell_face_sign != 0
    if getattr(dmesh, "bg_cell_face", None) is not None:
        fc = dmesh.bg_cell_face(dmesh.face_centers).reshape(
            dmesh.num_cells, faces.shape[1], -1
        )
    else:
        fc = dmesh.face_centers[faces]
    dr = fc - dmesh.cell_centers[:, None, :]  # (n, K, d)
    du_face = jnp.einsum("nvd,nfd->nfv", grad_u, dr)  # (n, Kf, nv)
    lim_face = slope_limiter(
        du_min[:, None, :], du_max[:, None, :], du_face, eps_sqr[:, None, :]
    )
    lim_face = jnp.where(mask[..., None], lim_face, 1.0)
    lim = jnp.minimum(1.0, jnp.min(lim_face, axis=1))  # (n, nv)

    lim = second_limiter(lim, du_min, du_max, eps_sqr)
    return lim[:, 0] if scalar else lim
