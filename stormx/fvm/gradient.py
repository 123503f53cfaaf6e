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
    """(num_cells, dim, dim) inverse LSQ matrices (GradientScheme.hpp:50-62)."""
    centers = dmesh.cell_centers  # (n, dim)
    adj = dmesh.cell_adj_ell  # (n, K)
    dr = centers[adj] - centers[:, None, :]  # (n, K, dim)
    outer = jnp.einsum("nki,nkj->nij", dr, dr)
    dim = centers.shape[1]
    return jnp.linalg.inv(outer + _EPS * jnp.eye(dim, dtype=centers.dtype))


def lsq_gradients(dmesh, u, g_mats=None):
    """∇u per cell: (num_cells, dim) or (num_cells, nv, dim)
    (GradientScheme.hpp:64-84)."""
    if g_mats is None:
        g_mats = lsq_gradient_matrices(dmesh)
    centers = dmesh.cell_centers
    adj = dmesh.cell_adj_ell
    dr = centers[adj] - centers[:, None, :]  # (n, K, dim)
    du = u[adj] - u[:, None]  # (n, K) or (n, K, nv)
    if u.ndim == 2:
        rhs = jnp.einsum("nkv,nkd->nvd", du, dr)
        return jnp.einsum("nij,nvj->nvi", g_mats, rhs)
    rhs = jnp.einsum("nk,nkd->nd", du, dr)
    return jnp.einsum("nij,nj->ni", g_mats, rhs)
