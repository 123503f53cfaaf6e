"""Least-squares cell-centered gradients.

Reference: ``Feathers/GradientScheme.hpp:37-85`` — precompute per cell the
inverse LSQ matrix G = (εI + Σ_adj dr⊗dr)⁻¹ with ε = 1e-14 (``:56-60``),
then ∇u = G·Σ_adj (u_adj − u)·dr.

TPU-native: the adjacency loop is the cell_adj_ell gather (padding = self ⇒
dr = 0 contributes nothing); G is a batched dim×dim inverse computed once;
the gradient apply is one gather + two einsums.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["lsq_gradient_matrices", "lsq_gradients"]

_EPS = 1e-14  # GradientScheme.hpp:58


def lsq_gradient_matrices(dmesh):
    """(num_cells, dim, dim) inverse LSQ matrices (GradientScheme.hpp:50-62).

    Regularization is the reference's absolute 1e-14 PLUS a dtype-aware
    relative term: corner cells with < dim independent neighbors make
    Σ dr⊗dr rank-deficient, and in float32 an absolute 1e-14 underflows
    against O(h²) entries — the inverse then carries inf and the whole
    order-2 scheme goes NaN.  Scaling by the trace keeps the inverse finite
    in every dtype (the damping is ~100·ε_machine relative — below the
    gradient's own rounding error).
    """
    centers = dmesh.cell_centers  # (n, dim)
    adj = dmesh.cell_adj_ell  # (n, K)
    dr = centers[adj] - centers[:, None, :]  # (n, K, dim)
    outer = jnp.einsum("nki,nkj->nij", dr, dr)
    dim = centers.shape[1]
    tr = jnp.trace(outer, axis1=-2, axis2=-1)
    eps = _EPS + 100.0 * jnp.finfo(centers.dtype).eps * tr
    return jnp.linalg.inv(
        outer + eps[:, None, None] * jnp.eye(dim, dtype=centers.dtype)
    )


def gather_adjacent(dmesh, v):
    """v[cell_adj_ell] via the Pallas banded gather when present
    (bit-exact); v is (n,) or (n, c)."""
    adj = dmesh.cell_adj_ell
    if getattr(dmesh, "bg_cell_adj", None) is not None:
        return dmesh.bg_cell_adj(v).reshape(
            (dmesh.num_cells, adj.shape[1]) + v.shape[1:]
        )
    return v[adj]


def lsq_gradients(dmesh, u, g_mats=None):
    """∇u per cell: (num_cells, dim) or (num_cells, nv, dim)
    (GradientScheme.hpp:64-84)."""
    if g_mats is None:
        g_mats = lsq_gradient_matrices(dmesh)
    centers = dmesh.cell_centers
    dr = gather_adjacent(dmesh, centers) - centers[:, None, :]  # (n, K, dim)
    du = gather_adjacent(dmesh, u) - u[:, None]  # (n, K) or (n, K, nv)
    if u.ndim == 2:
        rhs = jnp.einsum("nkv,nkd->nvd", du, dr)
        return jnp.einsum("nij,nvj->nvi", g_mats, rhs)
    rhs = jnp.einsum("nk,nkd->nd", du, dr)
    return jnp.einsum("nij,nj->ni", g_mats, rhs)
