"""Distributed explicit FVM: the forward (time-marching) pass over a
cell-partitioned mesh.

The reference's FVM forward pass is a serial face loop
(``Feathers/ConvectionScheme.hpp:57-109``); stormx's single-chip form is a
vectorized flux + segment-sum (:mod:`stormx.fvm.convection`).  This module
scales *mesh size* across a device mesh (SURVEY §2.9/§5 "long-context
analog"): cells are block-partitioned, each shard owns every face touching
its cells (faces on block boundaries are duplicated by the two shards —
O(surface) redundancy), and one ``lax.all_gather`` per step exchanges the
partitioned state.  Flux evaluation, BC ghost construction, and the
scatter-accumulate are all shard-local; the whole multi-step march is one
``lax.fori_loop`` inside one ``shard_map`` region.

The all-gather exchanges the full state (simple and robust); a
neighbor-only ``ppermute`` halo is the same optimization the banded solver
path already implements (``stormx.parallel.banded``) and can replace it
without changing this module's host-side tables.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from stormx.fvm.flux import lax_friedrichs_flux
from stormx.ops.segment import segment_sum
from stormx.parallel.sharded import AXIS, make_device_mesh

__all__ = ["partition_fv", "sharded_fv_march", "PartitionedFv"]


class PartitionedFv:
    """Host-frozen per-shard face tables for the explicit FVM update.

    All arrays carry a leading partition axis (P, F_max, ...); padding
    faces have zero area, gather from cell 0 (valid state, so fluxes stay
    finite before the ×0), and scatter into the local dump slot ``n_loc``.
    """

    def __init__(self, dmesh, num_parts: int):
        n = dmesh.num_cells
        self.num_parts = num_parts
        self.n_loc = -(-n // num_parts)
        self.n_global = n
        n_loc = self.n_loc

        fc = np.stack(
            [np.asarray(dmesh.face_inner), np.asarray(dmesh.face_outer)], axis=1
        )
        # Faces are label-sorted; recover per-face labels from the ranges.
        ranges = np.asarray(dmesh.face_label_ranges)
        labels = (
            np.searchsorted(ranges[1:], np.arange(len(fc)), side="right")
        ).astype(np.int64)
        normals = np.asarray(dmesh.face_normals)
        areas = np.asarray(dmesh.face_areas)
        centers = np.asarray(dmesh.face_centers)
        vols = np.asarray(dmesh.cell_volumes)

        part_of = fc // n_loc  # (num_faces, 2); boundary outer −1 → part −1
        sel = [
            np.where((part_of[:, 0] == p) | ((fc[:, 1] >= 0) & (part_of[:, 1] == p)))[0]
            for p in range(num_parts)
        ]
        f_max = max(len(s) for s in sel)
        dim = normals.shape[1]

        def padded(build, shape_tail, dtype, fill=0):
            out = np.full((num_parts, f_max) + shape_tail, fill, dtype=dtype)
            for p, s in enumerate(sel):
                out[p, : len(s)] = build(p, s)
            return out

        self.normals = padded(lambda p, s: normals[s], (dim,), normals.dtype)
        # Dummy faces keep a unit normal so state decomposition stays finite.
        zero_rows = self.normals == 0.0
        dummy = np.all(zero_rows, axis=-1)
        self.normals[dummy, 0] = 1.0
        self.areas = padded(lambda p, s: areas[s], (), areas.dtype)
        self.centers = padded(lambda p, s: centers[s], (dim,), centers.dtype)
        self.labels = padded(lambda p, s: labels[s], (), np.int32)
        self.g_inner = padded(lambda p, s: fc[s, 0], (), np.int32)
        self.g_outer = padded(lambda p, s: np.maximum(fc[s, 1], 0), (), np.int32)

        def loc_target(p, s, col):
            cell = fc[s, col]
            mine = (cell >= 0) & (cell // n_loc == p)
            return np.where(mine, cell - p * n_loc, n_loc)

        # Padding faces scatter into the dump slot (n_loc) and carry unit
        # volumes — with zero area their contribution is exactly 0, not 0/0.
        self.loc_inner = padded(lambda p, s: loc_target(p, s, 0), (), np.int32, n_loc)
        self.loc_outer = padded(lambda p, s: loc_target(p, s, 1), (), np.int32, n_loc)
        self.vol_inner = padded(lambda p, s: vols[fc[s, 0]], (), vols.dtype, 1)
        self.vol_outer = padded(
            lambda p, s: vols[np.maximum(fc[s, 1], 0)], (), vols.dtype, 1
        )
        self.unique_labels = sorted(int(l) for l in np.unique(labels) if l > 0)

    def tables(self):
        return tuple(
            jnp.asarray(a)
            for a in (
                self.normals, self.areas, self.centers, self.labels,
                self.g_inner, self.g_outer, self.loc_inner, self.loc_outer,
                self.vol_inner, self.vol_outer,
            )
        )


def partition_fv(dmesh, num_parts: int) -> PartitionedFv:
    """Block-partition the cells of a device mesh for distributed marching."""
    return PartitionedFv(dmesh, num_parts)


def sharded_fv_march(
    pfv: PartitionedFv,
    u0,
    dt: float,
    num_steps: int,
    *,
    bcs,
    flux_scheme=lax_friedrichs_flux,
    mesh=None,
):
    """March ``num_steps`` forward-Euler steps of 1st-order upwind
    convection with the state partitioned over the device mesh.

    ``u0``: global (num_cells, nv) conserved state; returns the global
    marched state.  ≙ serial ``FvSolver.march`` (``SkunkFvSolver.hpp:91-99``)
    — oracle: identical trajectories (tests compare to fp64 tolerance).
    """
    mesh = mesh or make_device_mesh(pfv.num_parts)
    n, nv = u0.shape
    n_loc, parts = pfv.n_loc, pfv.num_parts
    pad = parts * n_loc - n
    u_p = jnp.asarray(np.pad(np.asarray(u0), ((0, pad), (0, 0)))).reshape(
        parts, n_loc, nv
    )
    if pad:
        # Padding cells must hold a valid state (they are never referenced
        # by real faces, but NaN-free math keeps checkify clean).
        u_p = u_p.at[-1, n_loc - pad :].set(u_p[0, 0])
    missing = [label for label in pfv.unique_labels if label not in bcs]
    if missing:
        from stormx.core.exceptions import StormError

        raise StormError(
            f"boundary labels {missing} have faces but no boundary condition;"
            " pass a BC for every label (reference SkunkFvSolver.hpp:73-74)"
        )
    bc_items = tuple((label, bcs[label]) for label in pfv.unique_labels)

    def local_march(u_loc, normals, areas, centers, labels, g_in, g_out,
                    l_in, l_out, v_in, v_out):
        (u_loc, normals, areas, centers, labels, g_in, g_out, l_in, l_out,
         v_in, v_out) = (
            a[0] for a in (u_loc, normals, areas, centers, labels, g_in,
                           g_out, l_in, l_out, v_in, v_out)
        )

        def step(_, u):
            u_glob = lax.all_gather(u, AXIS, axis=0, tiled=True)
            ui = u_glob[g_in]
            uo = u_glob[g_out]
            for label, bc in bc_items:
                ghost = bc(normals, centers, ui)
                uo = jnp.where((labels == label)[:, None], ghost, uo)
            flux = flux_scheme(normals, uo, ui) * areas[:, None]
            contrib = jnp.concatenate(
                [flux / v_in[:, None], -flux / v_out[:, None]]
            )
            targets = jnp.concatenate([l_in, l_out])
            div = segment_sum(contrib, targets, n_loc + 1)[:n_loc]
            return u - dt * div

        return lax.fori_loop(0, num_steps, step, u_loc)[None]

    sharded = jax.shard_map(
        local_march,
        mesh=mesh,
        in_specs=tuple([P(AXIS)] * 11),
        out_specs=P(AXIS),
    )
    out = jax.jit(sharded)(u_p, *pfv.tables())
    return out.reshape(parts * n_loc, nv)[:n]
