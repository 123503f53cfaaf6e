"""Distributed BSR operators — BASELINE config #3's partitioned path.

"GMRES(30)/FGMRES … 3D unstructured-mesh operator, BSR blocks": the block
rows drop into the same layout machinery as the scalar ELL partitioner
(``stormx.parallel.partition``) with BLOCK columns — each device owns a
contiguous (RCM-ordered) range of block rows, the shared set S is the union
of block columns referenced across partition boundaries, and one
``lax.all_gather`` of the per-partition export pool serves as the halo.
Vectors travel as (nb_pad, b) block layouts, which every pytree vector op
already supports.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from stormx.parallel.partition import bfs_partition, rcm_order
from stormx.parallel.sharded import AXIS, make_device_mesh
from stormx.solvers import SOLVERS, SolverOptions, make_operator

__all__ = [
    "PartitionedBSR",
    "PartitionedBandedBSR",
    "partition_bsr",
    "partition_bsr_banded",
    "partition_bsr_vector",
    "unpartition_bsr_vector",
    "sharded_bsr_solve",
]


@dataclass(frozen=True)
class PartitionedBSR:
    """A BSR operator split into P device-local block-ELL blocks."""

    num_parts: int
    nb_global: int  # true block-row count
    nb_pad: int  # owned block-row slots per partition
    s_max: int  # shared block slots per partition
    block_size: int
    blocks: jnp.ndarray  # (P, nb_pad, K, b, b)
    cols: jnp.ndarray  # (P, nb_pad, K) local block-column ids
    send_slots: jnp.ndarray  # (P, s_max)
    perm: np.ndarray  # perm[new] = old block-row id
    fill_slots: np.ndarray

    def op_arrays(self) -> tuple:
        return (self.blocks, self.cols, self.send_slots)

    def extract_diag_inv(self) -> jnp.ndarray:
        """(P, nb_pad, b, b) inverted diagonal blocks (block-Jacobi)."""
        bsz = self.block_size
        blocks = np.asarray(self.blocks)
        rows = np.arange(self.nb_pad)
        cols = np.asarray(self.cols)
        diag = np.zeros((self.num_parts, self.nb_pad, bsz, bsz), blocks.dtype)
        for p in range(self.num_parts):
            mask = cols[p] == rows[:, None]
            diag[p] = (blocks[p] * mask[..., None, None]).sum(axis=1)
            empty = np.abs(diag[p]).max(axis=(1, 2)) == 0
            diag[p][empty] = np.eye(bsz, dtype=blocks.dtype)
        return jnp.asarray(np.linalg.inv(diag))

    def local_matvec(self, axis_name: str):
        """(nb_pad, b) → (nb_pad, b) block SpMV: one all_gather halo + one
        block gather + one MXU block contraction."""
        from jax import lax

        b = self.block_size

        def matvec(x_loc, blocks_loc, cols_loc, send_loc):
            contrib = x_loc[send_loc]  # (s_max, b)
            shared = lax.all_gather(contrib, axis_name)  # (P, s_max, b)
            x_ext = jnp.concatenate([x_loc, shared.reshape(-1, b)])
            g = x_ext[cols_loc]  # (nb_pad, K, b)
            # HIGHEST: default MXU precision truncates f32 → bf16 (CLAUDE.md);
            # bandwidth-bound, so full precision is ~free.
            return jnp.einsum(
                "rkij,rkj->ri", blocks_loc, g,
                preferred_element_type=x_loc.dtype,
                precision=lax.Precision.HIGHEST,
            )

        return matvec


@dataclass(frozen=True)
class PartitionedBandedBSR:
    """A BSR operator split into P contiguous RCM-ordered block-row slabs
    with NEIGHBOR-ONLY halos (VERDICT r4 item 6).

    The all-gather pool of :class:`PartitionedBSR` moves O(P²·s_max·b)
    elements per apply — the one distributed path that is comm-bound by
    design (``stormx.parallel.commvol``: 2.23 MB/apply at P=8 on the config
    #3 operator).  After RCM the block bandwidth h ≪ nb, so a contiguous
    slab partition needs only h-deep block strips of its two neighbors: two
    ``lax.ppermute`` shifts whose per-link bytes are CONSTANT in P — the
    same layout the scalar banded/sliced paths use
    (``stormx.parallel.banded``/``sliced``).

    Local block columns are extended-layout indices into
    ``[left h_lo | owned nb_pad | right h_hi]``; outer edges zero-fill
    (ppermute default), which is correct because out-of-range columns are
    never referenced by live blocks.  Dead (padding) blocks keep column 0.
    """

    num_parts: int
    nb_global: int
    nb_pad: int  # owned block rows per partition
    h_lo: int  # lower block bandwidth (left-halo depth)
    h_hi: int  # upper block bandwidth (right-halo depth)
    block_size: int
    blocks: jnp.ndarray  # (P, nb_pad, K, b, b)
    cols: jnp.ndarray  # (P, nb_pad, K) extended-local block cols
    perm: np.ndarray  # perm[new] = old block-row id
    fill_slots: np.ndarray

    def op_arrays(self) -> tuple:
        return (self.blocks, self.cols)

    def extract_diag_inv(self) -> jnp.ndarray:
        bsz = self.block_size
        blocks = np.asarray(self.blocks)
        cols = np.asarray(self.cols)
        # Diagonal block of owned row r sits at extended column h_lo + r.
        rows = np.arange(self.nb_pad) + self.h_lo
        diag = np.zeros((self.num_parts, self.nb_pad, bsz, bsz), blocks.dtype)
        for p in range(self.num_parts):
            mask = cols[p] == rows[:, None]
            diag[p] = (blocks[p] * mask[..., None, None]).sum(axis=1)
            empty = np.abs(diag[p]).max(axis=(1, 2)) == 0
            diag[p][empty] = np.eye(bsz, dtype=blocks.dtype)
        return jnp.asarray(np.linalg.inv(diag))

    def local_matvec(self, axis_name: str, *, overlap: bool = True):
        """ppermute block-row halos; interior block rows (whose band stays
        inside the owned slab) overlap the transfers, same contract as the
        scalar banded path — per-row block sums keep identical order, so the
        result is bit-identical to the unoverlapped path."""
        from jax import lax

        h_lo, h_hi, nb_pad = self.h_lo, self.h_hi, self.nb_pad

        def permutes(x_loc):
            p = lax.axis_size(axis_name)
            fwd = [(i, i + 1) for i in range(p - 1)]
            bwd = [(i + 1, i) for i in range(p - 1)]
            left = (
                lax.ppermute(x_loc[nb_pad - h_lo :], axis_name, fwd)
                if h_lo
                else jnp.zeros((0,) + x_loc.shape[1:], x_loc.dtype)
            )
            right = (
                lax.ppermute(x_loc[:h_hi], axis_name, bwd)
                if h_hi
                else jnp.zeros((0,) + x_loc.shape[1:], x_loc.dtype)
            )
            return left, right

        def contract(blocks_rows, g):
            return jnp.einsum(
                "rkij,rkj->ri", blocks_rows, g,
                preferred_element_type=g.dtype,
                precision=lax.Precision.HIGHEST,
            )

        lo_b, hi_b = h_lo, nb_pad - h_hi  # interior owned rows [lo_b, hi_b)
        if not overlap or hi_b <= lo_b:
            def matvec(x_loc, blocks_loc, cols_loc):
                left, right = permutes(x_loc)
                x_ext = jnp.concatenate([left, x_loc, right])
                return contract(blocks_loc, x_ext[cols_loc])

            return matvec

        def matvec(x_loc, blocks_loc, cols_loc):
            left, right = permutes(x_loc)  # issued before interior compute
            # Interior rows reference extended cols in [h_lo, h_lo+nb_pad)
            # ⇒ x_loc alone.
            cols_mid = lax.slice_in_dim(cols_loc, lo_b, hi_b, axis=0) - h_lo
            y_mid = contract(
                lax.slice_in_dim(blocks_loc, lo_b, hi_b, axis=0),
                x_loc[cols_mid],
            )
            x_ext = jnp.concatenate([left, x_loc, right])
            y_head = contract(
                lax.slice_in_dim(blocks_loc, 0, lo_b, axis=0),
                x_ext[lax.slice_in_dim(cols_loc, 0, lo_b, axis=0)],
            )
            y_tail = contract(
                lax.slice_in_dim(blocks_loc, hi_b, nb_pad, axis=0),
                x_ext[lax.slice_in_dim(cols_loc, hi_b, nb_pad, axis=0)],
            )
            return jnp.concatenate([y_head, y_mid, y_tail])

        return matvec


def partition_bsr_banded(bsr, num_parts: int) -> PartitionedBandedBSR:
    """RCM-order block rows and split into P contiguous slabs with
    neighbor-halo (banded) layout.  Requires the block bandwidth after RCM
    to fit one neighbor each way (h ≤ nb_pad) — true for mesh-ordered block
    operators at any reasonable P."""
    blocks = np.asarray(bsr.blocks)  # (nb, K, b, b)
    cols = np.asarray(bsr.cols)
    nb, K, b, _ = blocks.shape
    live = np.abs(blocks).max(axis=(2, 3)) != 0  # (nb, K)
    rows_e = np.repeat(np.arange(nb), K)[live.reshape(-1)]
    cols_e = cols.reshape(-1)[live.reshape(-1)].astype(np.int64)

    Pn = num_parts
    nb_pad = -(-nb // Pn)
    perm = rcm_order(nb, rows_e, cols_e)
    inv = np.empty(nb, dtype=np.int64)
    inv[perm] = np.arange(nb)
    d = inv[cols_e] - inv[rows_e]
    h_lo = int(max(-(d.min(initial=0)), 0))
    h_hi = int(max(d.max(initial=0), 0))
    if max(h_lo, h_hi) > nb_pad:
        raise ValueError(
            f"block band ({h_lo}/{h_hi}) exceeds slab rows {nb_pad}; "
            "use fewer parts or the pooled layout (partition_bsr)"
        )

    blocks_l = np.zeros((Pn, nb_pad, K, b, b), dtype=blocks.dtype)
    cols_l = np.zeros((Pn, nb_pad, K), dtype=np.int32)
    new_rows = inv  # new_rows[old] = new slab-ordered row
    for old in range(nb):
        s = new_rows[old]
        p, w = divmod(s, nb_pad)
        blocks_l[p, w] = blocks[old]
        sc = new_rows[cols[old]]
        lc = sc - p * nb_pad + h_lo  # extended-local
        cols_l[p, w] = np.where(live[old], lc, 0).astype(np.int32)
    assert (cols_l >= 0).all() and (cols_l < h_lo + nb_pad + h_hi).all()

    return PartitionedBandedBSR(
        num_parts=Pn,
        nb_global=nb,
        nb_pad=nb_pad,
        h_lo=h_lo,
        h_hi=h_hi,
        block_size=b,
        blocks=jnp.asarray(blocks_l),
        cols=jnp.asarray(cols_l),
        perm=perm,
        fill_slots=np.arange(nb, dtype=np.int64),
    )


def partition_bsr(
    bsr, num_parts: int, *, method: str = "rcm-blocks", reorder: bool = True
) -> PartitionedBSR:
    """Partition a :class:`stormx.sparse.BSR` into P local block-ELL blocks."""
    blocks = np.asarray(bsr.blocks)  # (nb, K, b, b)
    cols = np.asarray(bsr.cols)
    nb, K, b, _ = blocks.shape
    live = np.abs(blocks).max(axis=(2, 3)) != 0  # (nb, K)
    rows_e = np.repeat(np.arange(nb), K)[live.reshape(-1)]
    cols_e = cols.reshape(-1)[live.reshape(-1)].astype(np.int64)

    Pn = num_parts
    nb_pad = -(-nb // Pn)
    if not reorder:
        perm = np.arange(nb, dtype=np.int64)
        fill_slots = np.arange(nb, dtype=np.int64)
    elif method == "rcm-blocks":
        perm = rcm_order(nb, rows_e, cols_e)
        fill_slots = np.arange(nb, dtype=np.int64)
    elif method == "bfs":
        part_of_old = bfs_partition(nb, rows_e, cols_e, Pn)
        rcm = rcm_order(nb, rows_e, cols_e)
        rcm_pos = np.empty(nb, dtype=np.int64)
        rcm_pos[rcm] = np.arange(nb)
        perm = np.lexsort((rcm_pos, part_of_old))
        part_sorted = part_of_old[perm]
        sizes = np.bincount(part_sorted, minlength=Pn)
        if sizes.max() > nb_pad:
            raise ValueError("bfs_partition produced an oversized part")
        starts = np.zeros(Pn + 1, dtype=np.int64)
        np.cumsum(sizes, out=starts[1:])
        fill_slots = part_sorted * nb_pad + (np.arange(nb) - starts[part_sorted])
    else:
        raise ValueError(f"unknown partition method {method!r}")

    slot_of_old = np.empty(nb, dtype=np.int64)
    slot_of_old[perm] = fill_slots
    srow_of = slot_of_old  # per old block row

    # Shared block set: columns referenced across a partition boundary.
    srow = srow_of[rows_e]
    scol = srow_of[cols_e]
    cross = (srow // nb_pad) != (scol // nb_pad)
    S = np.unique(scol[cross])
    s_part = S // nb_pad
    s_counts = np.bincount(s_part, minlength=Pn)
    s_max = int(s_counts.max()) if len(S) else 1
    s_starts = np.zeros(Pn + 1, dtype=np.int64)
    np.cumsum(s_counts, out=s_starts[1:])
    s_pos = np.arange(len(S)) - s_starts[s_part]
    shared_lookup = np.full(Pn * nb_pad, -1, dtype=np.int64)
    shared_lookup[S] = s_part * s_max + s_pos
    send_slots = np.zeros((Pn, s_max), dtype=np.int32)
    send_slots[s_part, s_pos] = (S % nb_pad).astype(np.int32)

    blocks_l = np.zeros((Pn, nb_pad, K, b, b), dtype=blocks.dtype)
    cols_l = np.zeros((Pn, nb_pad, K), dtype=np.int32)
    for old in range(nb):
        s = srow_of[old]
        p, w = divmod(s, nb_pad)
        blocks_l[p, w] = blocks[old]
        sc = srow_of[cols[old]]
        same = (sc // nb_pad) == p
        lc = np.where(same, sc % nb_pad, nb_pad + shared_lookup[sc])
        # Dead (all-zero) blocks keep column 0.
        cols_l[p, w] = np.where(live[old], lc, 0).astype(np.int32)

    return PartitionedBSR(
        num_parts=Pn,
        nb_global=nb,
        nb_pad=nb_pad,
        s_max=s_max,
        block_size=b,
        blocks=jnp.asarray(blocks_l),
        cols=jnp.asarray(cols_l),
        send_slots=jnp.asarray(send_slots),
        perm=perm,
        fill_slots=fill_slots,
    )


def partition_bsr_vector(pb: PartitionedBSR, x) -> jnp.ndarray:
    """Global (n,) → (P, nb_pad, b) block layout (jit-traceable)."""
    b = pb.block_size
    xb = jnp.asarray(x).reshape(pb.nb_global, b)
    out = jnp.zeros((pb.num_parts * pb.nb_pad, b), dtype=xb.dtype)
    out = out.at[pb.fill_slots].set(xb[pb.perm])
    return out.reshape(pb.num_parts, pb.nb_pad, b)


def unpartition_bsr_vector(pb: PartitionedBSR, xp) -> jnp.ndarray:
    flat = jnp.asarray(xp).reshape(-1, pb.block_size)
    inv = np.empty(pb.nb_global, dtype=np.int64)
    inv[pb.perm] = np.arange(pb.nb_global)
    return flat[pb.fill_slots][inv].reshape(-1)


def sharded_bsr_solve(
    pb,
    b_vec,
    x0=None,
    *,
    mesh=None,
    method: str = "gmres",
    options: SolverOptions | None = None,
    block_jacobi: bool = False,
    **solver_kw,
):
    """Krylov solve with the BSR operator partitioned over the device mesh
    (BASELINE config #3).  ``pb`` is either layout — :class:`PartitionedBSR`
    (all-gather pool) or :class:`PartitionedBandedBSR` (neighbor ppermute
    halos, constant per-link bytes).  ``block_jacobi=True`` preconditions
    with the inverted diagonal blocks (shard-local, partition-invariant)."""
    mesh = mesh or make_device_mesh(pb.num_parts)
    opts = options or SolverOptions()
    from stormx.parallel.sharded import _orthog_default

    solver_kw = _orthog_default(method, solver_kw)
    solver_fn = SOLVERS[method.lower()]
    local_mv = pb.local_matvec(AXIS)
    op_arrs = pb.op_arrays()

    bp = partition_bsr_vector(pb, b_vec)
    xp0 = partition_bsr_vector(pb, x0) if x0 is not None else jnp.zeros_like(bp)

    extras = {}
    if block_jacobi:
        extras["dinv"] = pb.extract_diag_inv()
    extra_keys = tuple(extras)

    def local_solve(b_loc, x0_loc, *rest):
        b_loc, x0_loc = b_loc[0], x0_loc[0]
        ops_loc = tuple(o[0] for o in rest[: len(op_arrs)])
        extra_vals = rest[len(op_arrs):]
        op = make_operator(lambda v: local_mv(v, *ops_loc))
        pre = None
        for key, val in zip(extra_keys, extra_vals):
            if key == "dinv":
                dinv = val[0]
                from stormx.solvers.preconditioner import FunctionPreconditioner

                pre = FunctionPreconditioner(
                    lambda r, dinv=dinv: jnp.einsum(
                        "rij,rj->ri", dinv, r,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                )
        res = solver_fn(
            op, b_loc, x0_loc, precond=pre, options=opts, axis_name=AXIS,
            **solver_kw,
        )
        return res._replace(x=res.x[None])

    from stormx.solvers.base import SolveResult

    out_specs = SolveResult(
        x=P(AXIS), converged=P(), num_iterations=P(),
        absolute_error=P(), relative_error=P(), history=P(),
    )
    args = (bp, xp0) + op_arrs + tuple(extras[k] for k in extra_keys)
    sharded = jax.shard_map(
        local_solve,
        mesh=mesh,
        in_specs=tuple([P(AXIS)] * len(args)),
        out_specs=out_specs,
    )
    res = jax.jit(sharded)(*args)
    return res._replace(x=unpartition_bsr_vector(pb, res.x))
