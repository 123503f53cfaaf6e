"""Mesh-attached fields.

Reference: ``Feathers/Field.hpp:60-154`` — ``Field<Mesh, Index, Value,
NumVars>`` participates in Bittern expressions.  TPU-native: a field is just
a jnp array of shape ``(num_entities,)`` or ``(num_entities, num_vars)``;
XLA fusion replaces expression templates, and solver pytree-vectors accept
fields directly.  Only tiny constructors live here.
"""

from __future__ import annotations

import jax.numpy as jnp

from stormx.core.config import default_real_dtype

__all__ = ["cell_field", "face_field", "node_field"]


def cell_field(mesh, num_vars: int | None = None, fill=0.0, dtype=None):
    dtype = dtype or default_real_dtype()
    shape = (mesh.num_cells,) if num_vars is None else (mesh.num_cells, num_vars)
    return jnp.full(shape, fill, dtype=dtype)


def face_field(mesh, num_vars: int | None = None, fill=0.0, dtype=None):
    dtype = dtype or default_real_dtype()
    shape = (mesh.num_faces,) if num_vars is None else (mesh.num_faces, num_vars)
    return jnp.full(shape, fill, dtype=dtype)


def node_field(mesh, num_vars: int | None = None, fill=0.0, dtype=None):
    dtype = dtype or default_real_dtype()
    n = getattr(mesh, "num_nodes", None)
    shape = (n,) if num_vars is None else (n, num_vars)
    return jnp.full(shape, fill, dtype=dtype)
