"""Vector-space operations over pytrees of arrays.

The reference's ``Vector`` template parameter (any ``legacy_vector_like``,
e.g. ``CellField``) becomes *any pytree of arrays* here.  Krylov solvers only
need a handful of vector-space primitives — this module is the complete list:

  * ``dot(x, y)``       ≙ ``dot_product`` (``Bittern/MatrixAlgorithms.hpp:312``)
  * ``norm_2 / norm_1 / norm_inf / norm_p``  (``:246-303``)
  * ``add / sub / scale / axpy / fill / zeros_like`` — functional updates in
    place of the reference's expression-template compound assignment
    (``Bittern/MatrixTarget.hpp:110``); XLA fuses these into single kernels,
    replacing expression templates entirely.

Distribution: every reduction accepts ``axis_name``.  Inside a
``shard_map``-ped solver the local partial reduction is followed by a
``lax.psum`` over the mesh axis — the only two communication points of a
Krylov iteration (SURVEY §3.1: reduction psum + halo exchange in the
operator).  Reduction order (leaf-order local sum, then psum) is fixed, so
convergence histories are deterministic for a fixed partition.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

PyTree = Any

__all__ = [
    "dot",
    "norm_1",
    "norm_2",
    "norm_inf",
    "norm_p",
    "add",
    "sub",
    "scale",
    "axpy",
    "xpay",
    "fill",
    "zeros_like",
    "copy",
    "lincomb",
    "stacked_zeros",
    "get_stacked",
    "set_stacked",
    "dots_stacked",
    "lincomb_stacked",
    "tree_where",
]


def _leaves(x: PyTree):
    return jax.tree_util.tree_leaves(x)


def _maybe_psum(val, axis_name):
    if axis_name is None:
        return val
    return lax.psum(val, axis_name)


def dot(x: PyTree, y: PyTree, axis_name: str | None = None):
    """<x ⋅ y> = Σ xᵢ·conj(yᵢ), matching the reference convention
    ``dot_product(a, b) = a * conj(b)`` (``Crow/MathUtils.hpp:93-99``)."""
    parts = [
        jnp.vdot(yl, xl)  # vdot conjugates its first argument
        for xl, yl in zip(_leaves(x), _leaves(y), strict=True)
    ]
    total = sum(parts[1:], start=parts[0])
    return _maybe_psum(total, axis_name)


def norm_2(x: PyTree, axis_name: str | None = None):
    """Euclidean norm ‖x‖₂ (``Bittern/MatrixAlgorithms.hpp:264-270``)."""
    return jnp.sqrt(jnp.real(dot(x, x, axis_name=axis_name)))


def norm_1(x: PyTree, axis_name: str | None = None):
    parts = [jnp.sum(jnp.abs(l)) for l in _leaves(x)]
    return _maybe_psum(sum(parts[1:], start=parts[0]), axis_name)


def norm_inf(x: PyTree, axis_name: str | None = None):
    parts = [jnp.max(jnp.abs(l)) for l in _leaves(x)]
    m = parts[0]
    for p in parts[1:]:
        m = jnp.maximum(m, p)
    if axis_name is None:
        return m
    return lax.pmax(m, axis_name)


def norm_p(x: PyTree, p, axis_name: str | None = None):
    parts = [jnp.sum(jnp.abs(l) ** p) for l in _leaves(x)]
    total = _maybe_psum(sum(parts[1:], start=parts[0]), axis_name)
    return total ** (1.0 / p)


def add(x: PyTree, y: PyTree) -> PyTree:
    return jax.tree_util.tree_map(jnp.add, x, y)


def sub(x: PyTree, y: PyTree) -> PyTree:
    return jax.tree_util.tree_map(jnp.subtract, x, y)


def scale(a, x: PyTree) -> PyTree:
    return jax.tree_util.tree_map(lambda l: a * l, x)


def axpy(a, x: PyTree, y: PyTree) -> PyTree:
    """a·x + y (XLA fuses this into one kernel)."""
    return jax.tree_util.tree_map(lambda xl, yl: a * xl + yl, x, y)


def xpay(x: PyTree, a, y: PyTree) -> PyTree:
    """x + a·y."""
    return jax.tree_util.tree_map(lambda xl, yl: xl + a * yl, x, y)


def fill(x: PyTree, value) -> PyTree:
    return jax.tree_util.tree_map(lambda l: jnp.full_like(l, value), x)


def zeros_like(x: PyTree) -> PyTree:
    return jax.tree_util.tree_map(jnp.zeros_like, x)


def copy(x: PyTree) -> PyTree:
    return jax.tree_util.tree_map(lambda l: l, x)


def lincomb(coeffs, vecs) -> PyTree:
    """Σᵢ coeffs[i]·vecs[i] over a list of pytree vectors."""
    out = scale(coeffs[0], vecs[0])
    for c, v in zip(coeffs[1:], vecs[1:], strict=True):
        out = axpy(c, v, out)
    return out


# ---------------------------------------------------------------------------
# Stacked Krylov bases.
#
# GMRES/IDR(s)/BiCGStab(l) hold small *sets* of vectors (q₀..q_m, the shadow
# space, ...).  We stack them per-leaf along a new leading axis so that
# (a) dynamic index k (a traced value inside lax.while_loop) selects a basis
# vector via lax.dynamic_index_in_dim, and (b) "dot with every basis vector"
# becomes one matvec per leaf — a dense (m+1, n) @ (n,) product that XLA maps
# straight onto the TPU MXU/VPU instead of m+1 separate reductions.
# ---------------------------------------------------------------------------


def stacked_zeros(template: PyTree, m: int) -> PyTree:
    """A stack of m zero vectors shaped like ``template``.

    The zeros are derived from the template (``+ 0·template``) rather than
    created fresh: under ``shard_map``, fresh ``jnp.zeros`` are typed as
    replicated, but solver basis buffers get device-varying vectors written
    into them inside ``lax.while_loop``/``lax.cond``, whose carries require
    matching varying-axes types.  Deriving from the (varying) template makes
    the buffer varying-typed from the start; under plain jit this folds away.
    """
    return jax.tree_util.tree_map(
        lambda l: jnp.zeros((m,) + l.shape, dtype=l.dtype) + 0 * l, template
    )


def get_stacked(stacked: PyTree, k) -> PyTree:
    """stacked[k] with a possibly-traced k."""
    return jax.tree_util.tree_map(
        lambda l: lax.dynamic_index_in_dim(l, k, axis=0, keepdims=False), stacked
    )


def set_stacked(stacked: PyTree, k, vec: PyTree) -> PyTree:
    """stacked[k] = vec with a possibly-traced k."""
    return jax.tree_util.tree_map(
        lambda sl, vl: lax.dynamic_update_index_in_dim(sl, vl, k, axis=0),
        stacked,
        vec,
    )


def dots_stacked(stacked: PyTree, vec: PyTree, axis_name: str | None = None):
    """[<vec ⋅ stackedᵢ>]ᵢ — all basis dot products in one matvec per leaf.

    Matches the ``dot`` convention <a⋅b> = Σ a·conj(b).
    """
    parts = []
    for sl, vl in zip(_leaves(stacked), _leaves(vec), strict=True):
        m = sl.shape[0]
        parts.append(jnp.conj(sl.reshape(m, -1)) @ vl.reshape(-1))
    total = sum(parts[1:], start=parts[0])
    return _maybe_psum(total, axis_name)


def lincomb_stacked(coeffs, stacked: PyTree) -> PyTree:
    """Σᵢ coeffs[i]·stacked[i] — one (m,) @ (m, n) product per leaf."""
    return jax.tree_util.tree_map(
        lambda sl: jnp.tensordot(coeffs, sl, axes=1), stacked
    )


def roll_stacked(stacked: PyTree, shift: int) -> PyTree:
    """Circularly shift the stack axis (slot 0 ← slot m−1 for shift=1) —
    used by LGMRES to age out the oldest augmentation direction."""
    return jax.tree_util.tree_map(lambda sl: jnp.roll(sl, shift, axis=0), stacked)


def tree_where(pred, a: PyTree, b: PyTree) -> PyTree:
    """Select between two pytrees on a scalar predicate (branch-free merge
    for masked loops over static ranges inside traced solver bodies)."""
    return jax.tree_util.tree_map(lambda al, bl: jnp.where(pred, al, bl), a, b)
