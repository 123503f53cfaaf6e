"""Distributed FVM: halo-based cell partitioning for 1st- AND 2nd-order
schemes with O(boundary) communication.

The reference's FVM forward pass is a serial face loop
(``Feathers/ConvectionScheme.hpp:57-198``); stormx's single-chip form is a
vectorized flux + gather-accumulate (:mod:`stormx.fvm.convection`).  This
module scales *mesh size* across a device mesh (SURVEY §2.9/§5
"long-context analog"):

* cells are block-partitioned; each shard owns ``n_loc`` cells plus a
  TWO-DEEP halo (graph distance ≤ 2 through interior faces) — exactly what
  the 2nd-order scheme needs: LSQ gradients and limiters of the 1-halo
  cells (which feed the face reconstruction at owned-incident faces) read
  the 2-halo state;
* ONE ``lax.all_gather`` per step moves only the shared boundary pool —
  each owner exports the cells any other shard needs (O(total boundary),
  NOT O(N·P) like a full-state gather);
* per-shard local face/cell tables are global-id-ordered so every owned
  cell's flux accumulation runs in the same per-row order as the serial
  marcher (fp64 trajectories match to ~1e-12, tested at P ∈ {1, 4, 8});
* gradients/limiters reuse the SERIAL modules (they consume only geometry
  + adjacency arrays); only the boundary-ghost application is mask-based
  (per-part label slices are not static under shard_map).

The whole multi-step march is one ``lax.fori_loop`` inside one
``shard_map`` region.
"""

from __future__ import annotations

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from stormx.fvm.flux import lax_friedrichs_flux
from stormx.fvm.gradient import lsq_gradient_matrices, lsq_gradients
from stormx.fvm.limiter import (
    compute_limiters,
    cubic_limiter,
    cubic_second_limiter,
)
from stormx.parallel.sharded import AXIS, make_device_mesh

__all__ = ["partition_fv", "sharded_fv_march", "PartitionedFv"]


class PartitionedFv:
    """Host-frozen per-shard tables: owned block + 2-deep halo + local faces.

    Local cell ids: [0, n_loc) owned, [n_loc, n_loc + h_max) halo slots
    (global-id-sorted, padded), c_max−1 = dump slot.  Local faces are all
    faces incident to owned ∪ 1-halo cells, global-id-sorted and padded
    with zero-area faces targeting the dump slot.
    """

    def __init__(self, dmesh, num_parts: int, *, halo_depth: int = 2):
        n = dmesh.num_cells
        self.num_parts = num_parts
        self.n_loc = n_loc = -(-n // num_parts)
        self.n_global = n
        self.halo_depth = halo_depth

        fc = np.stack(
            [np.asarray(dmesh.face_inner), np.asarray(dmesh.face_outer)], axis=1
        )
        ranges = np.asarray(dmesh.face_label_ranges)
        labels = np.searchsorted(
            ranges[1:], np.arange(len(fc)), side="right"
        ).astype(np.int64)
        normals = np.asarray(dmesh.face_normals)
        areas = np.asarray(dmesh.face_areas)
        fcenters = np.asarray(dmesh.face_centers)
        vols = np.asarray(dmesh.cell_volumes)
        ccenters = np.asarray(dmesh.cell_centers)
        dim = normals.shape[1]
        self.unique_labels = sorted(int(l) for l in np.unique(labels) if l > 0)

        # Symmetric interior-face adjacency (edge list) for halo growth.
        interior = fc[:, 1] >= 0
        e0, e1 = fc[interior, 0], fc[interior, 1]
        rows_exp = np.concatenate([e0, e1])
        adj_flat = np.concatenate([e1, e0])

        owner = np.minimum(np.arange(n) // n_loc, num_parts - 1)

        halos, ring1_masks = [], []
        for p in range(num_parts):
            owned_mask = np.zeros(n, dtype=bool)
            owned_mask[p * n_loc : min((p + 1) * n_loc, n)] = True
            seen = owned_mask.copy()
            frontier = owned_mask
            halo_masks = []
            for _ in range(halo_depth):
                ring = np.zeros(n, dtype=bool)
                ring[adj_flat[frontier[rows_exp]]] = True
                ring &= ~seen
                seen |= ring
                halo_masks.append(ring)
                frontier = ring
            ring1_masks.append(owned_mask | halo_masks[0])
            halos.append(np.nonzero(seen & ~owned_mask)[0])
        h_max = max(max((len(h) for h in halos), default=0), 1)
        self.h_max = h_max
        c_max = n_loc + h_max + 1
        self.c_max = c_max
        dump = c_max - 1

        # Shared export pool: for each owner, the sorted union of its cells
        # any other part's halo needs.
        need_by_owner = [set() for _ in range(num_parts)]
        for p in range(num_parts):
            for g in halos[p]:
                need_by_owner[owner[g]].add(int(g))
        exports = [np.sort(np.array(sorted(s), dtype=np.int64)) for s in need_by_owner]
        s_max = max(max((len(e) for e in exports), default=0), 1)
        self.s_max = s_max
        send = np.zeros((num_parts, s_max), dtype=np.int32)
        pool_pos = {}
        for p, e in enumerate(exports):
            send[p, : len(e)] = (e - p * n_loc).astype(np.int32)
            for i, g in enumerate(e):
                pool_pos[int(g)] = p * s_max + i
        self.send_slots = send

        halo_src = np.zeros((num_parts, h_max), dtype=np.int32)
        for p, h in enumerate(halos):
            for i, g in enumerate(h):
                halo_src[p, i] = pool_pos[int(g)]
        self.halo_src = halo_src

        # Local faces per part: incident to owned ∪ 1-halo.
        sel = []
        for p in range(num_parts):
            r1 = ring1_masks[p]
            m = r1[fc[:, 0]] | ((fc[:, 1] >= 0) & r1[np.maximum(fc[:, 1], 0)])
            sel.append(np.nonzero(m)[0])
        f_max = max(max((len(s) for s in sel), default=0), 1)
        self.f_max = f_max

        # Global → local cell id per part.
        loc_of = np.full((num_parts, n), dump, dtype=np.int64)
        for p in range(num_parts):
            owned = np.arange(p * n_loc, min((p + 1) * n_loc, n))
            loc_of[p, owned] = owned - p * n_loc
            loc_of[p, halos[p]] = n_loc + np.arange(len(halos[p]))

        def pad_faces(build, tail, dtype, fill=0):
            out = np.full((num_parts, f_max) + tail, fill, dtype=dtype)
            for p, s in enumerate(sel):
                out[p, : len(s)] = build(p, s)
            return out

        self.f_normals = pad_faces(lambda p, s: normals[s], (dim,), normals.dtype)
        dummy = np.all(self.f_normals == 0.0, axis=-1)
        self.f_normals[dummy, 0] = 1.0  # keep flux decomposition finite
        self.f_areas = pad_faces(lambda p, s: areas[s], (), areas.dtype)
        self.f_centers = pad_faces(lambda p, s: fcenters[s], (dim,), fcenters.dtype)
        self.f_labels = pad_faces(lambda p, s: labels[s], (), np.int32)
        self.l_inner = pad_faces(
            lambda p, s: loc_of[p, fc[s, 0]], (), np.int32, dump
        )
        # Boundary faces: outer ← inner (the serial path's pre-ghost base).
        self.l_outer = pad_faces(
            lambda p, s: np.where(
                fc[s, 1] >= 0, loc_of[p, np.maximum(fc[s, 1], 0)], loc_of[p, fc[s, 0]]
            ),
            (), np.int32, dump,
        )

        # Per-part cell tables (owned + halo slots + dump), geometry padded
        # to stay finite.
        self.c_vols = np.ones((num_parts, c_max), dtype=vols.dtype)
        self.c_centers = np.zeros((num_parts, c_max, dim), dtype=ccenters.dtype)
        Ka = np.asarray(dmesh.cell_adj_ell).shape[1]
        Kf = np.asarray(dmesh.cell_face_ell).shape[1]
        self.adj = np.tile(
            np.arange(c_max, dtype=np.int32)[None, :, None], (num_parts, 1, Ka)
        )
        self.cf_ell = np.zeros((num_parts, c_max, Kf), dtype=np.int32)
        self.cf_sign = np.zeros((num_parts, c_max, Kf), dtype=vols.dtype)

        g_adj = np.asarray(dmesh.cell_adj_ell)
        for p in range(num_parts):
            locs = np.nonzero(loc_of[p] != dump)[0]  # global ids present
            lids = loc_of[p, locs]
            self.c_vols[p, lids] = vols[locs]
            self.c_centers[p, lids] = ccenters[locs]
            # Adjacency for owned + 1-halo cells only (2-halo keeps self ⇒
            # zero gradient there; never consumed at owned-incident faces).
            # With halo_depth < 2 only owned cells get full adjacency
            # (enough for order-1 marching, which never reads it).
            core_mask = ring1_masks[p] if halo_depth >= 2 else (
                loc_of[p] < n_loc
            )
            core = np.nonzero(core_mask)[0].astype(np.int64)
            core_l = loc_of[p, core]
            a = loc_of[p, g_adj[core]]  # (|core|, Ka); missing → dump
            # Self-padded slots in the global table map to the cell itself.
            self_mask = g_adj[core] == core[:, None]
            a = np.where(self_mask, core_l[:, None], a)
            # Any adjacency outside the local set would be a halo-depth bug.
            if (a == dump).any():
                raise AssertionError("halo too shallow for adjacency")
            self.adj[p, core_l] = a
            # Face incidence for owned + 1-halo (faces all present locally).
            gsel = sel[p]
            gpos = np.full(len(fc), -1, dtype=np.int64)
            gpos[gsel] = np.arange(len(gsel))
            g_cf = np.asarray(dmesh.cell_face_ell)[core]
            g_sign = np.asarray(dmesh.cell_face_sign)[core]
            lf = gpos[g_cf]
            if (lf[g_sign != 0] < 0).any():
                raise AssertionError("incident face missing from local set")
            self.cf_ell[p, core_l] = np.where(g_sign != 0, lf, 0).astype(np.int32)
            self.cf_sign[p, core_l] = g_sign

    def tables(self):
        return tuple(
            jnp.asarray(a)
            for a in (
                self.f_normals, self.f_areas, self.f_centers, self.f_labels,
                self.l_inner, self.l_outer, self.c_vols, self.c_centers,
                self.adj, self.cf_ell, self.cf_sign, self.send_slots,
                self.halo_src,
            )
        )


def partition_fv(dmesh, num_parts: int, *, halo_depth: int = 2) -> PartitionedFv:
    """Block-partition the cells of a device mesh for distributed marching."""
    return PartitionedFv(dmesh, num_parts, halo_depth=halo_depth)


def sharded_fv_march(
    pfv: PartitionedFv,
    u0,
    dt: float,
    num_steps: int,
    *,
    bcs,
    flux_scheme=lax_friedrichs_flux,
    mesh=None,
    order: int = 1,
    slope_limiter=cubic_limiter,
    second_limiter=cubic_second_limiter,
):
    """March ``num_steps`` forward-Euler steps of 1st- or 2nd-order upwind
    convection with the state partitioned over the device mesh.

    ``u0``: global (num_cells, nv) conserved state; returns the global
    marched state.  ≙ serial ``FvSolver(order=order).march``
    (``SkunkFvSolver.hpp:91-99``) — oracle: identical trajectories to fp64
    tolerance (tested).  Per step, communication is ONE all_gather of the
    shared boundary pool (O(boundary) cells).
    """
    if order == 2 and pfv.halo_depth < 2:
        raise ValueError("order-2 march needs partition_fv(..., halo_depth=2)")
    mesh = mesh or make_device_mesh(pfv.num_parts)
    n, nv = u0.shape
    n_loc, parts = pfv.n_loc, pfv.num_parts
    pad = parts * n_loc - n
    u_p = jnp.asarray(np.pad(np.asarray(u0), ((0, pad), (0, 0)))).reshape(
        parts, n_loc, nv
    )
    if pad:
        # Padding cells hold a valid state (never referenced by real faces).
        u_p = u_p.at[-1, n_loc - pad :].set(u_p[0, 0])
    missing = [label for label in pfv.unique_labels if label not in bcs]
    if missing:
        from stormx.core.exceptions import StormError

        raise StormError(
            f"boundary labels {missing} have faces but no boundary condition;"
            " pass a BC for every label (reference SkunkFvSolver.hpp:73-74)"
        )
    bc_items = tuple((label, bcs[label]) for label in pfv.unique_labels)

    def local_march(u_loc, *tabs):
        (f_n, f_a, f_c, f_l, l_in, l_out, c_v, c_c, adj, cf, cs, send,
         hsrc) = (t[0] for t in tabs)
        u_loc = u_loc[0]
        lm = SimpleNamespace(
            cell_centers=c_c,
            cell_volumes=c_v,
            cell_adj_ell=adj,
            cell_face_ell=cf,
            cell_face_sign=cs,
            face_centers=f_c,
        )
        g_mats = lsq_gradient_matrices(lm) if order == 2 else None

        def ghosts(u_in, u_out):
            for label, bc in bc_items:
                g = bc(f_n, f_c, u_in)
                u_out = jnp.where((f_l == label)[:, None], g, u_out)
            return u_out

        def divergence(u_full):
            if order == 1:
                u_in = u_full[l_in]
                u_out = ghosts(u_in, u_full[l_out])
            else:
                grad = lsq_gradients(lm, u_full, g_mats)  # (c_max, nv, d)
                lim = compute_limiters(
                    lm, u_full, grad,
                    slope_limiter=slope_limiter, second_limiter=second_limiter,
                )
                grad = grad * lim[..., None]
                dr_in = f_c - c_c[l_in]
                dr_out = f_c - c_c[l_out]
                u_in = u_full[l_in] + jnp.einsum("fvd,fd->fv", grad[l_in], dr_in)
                u_rec_out = u_full[l_out] + jnp.einsum(
                    "fvd,fd->fv", grad[l_out], dr_out
                )
                # Boundary ghosts act on the RECONSTRUCTED inner state
                # (ConvectionScheme.hpp:177-189); interior faces keep the
                # reconstructed outer value (labels are 0 there).
                u_out = ghosts(u_in, u_rec_out)
            flux = flux_scheme(f_n, u_out, u_in) * f_a[:, None]
            g = flux[cf]  # (c_max, Ka, nv)
            acc = jnp.sum(cs[..., None] * g, axis=1) / c_v[:, None]
            return acc

        def step(_, u):
            contrib = u[send]  # (s_max, nv)
            pool = lax.all_gather(contrib, AXIS)  # (P, s_max, nv)
            u_halo = pool.reshape(-1, nv)[hsrc]  # (h_max, nv)
            u_full = jnp.concatenate([u, u_halo, u[:1]])  # dump = u[0] copy
            div = divergence(u_full)
            return u - dt * div[:n_loc]

        return lax.fori_loop(0, num_steps, step, u_loc)[None]

    tabs = pfv.tables()
    sharded = jax.shard_map(
        local_march,
        mesh=mesh,
        in_specs=tuple([P(AXIS)] * (1 + len(tabs))),
        out_specs=P(AXIS),
    )
    out = jax.jit(sharded)(u_p, *tabs)
    return out.reshape(parts * n_loc, nv)[:n]
