"""Mesh/operator partitioning for multi-chip execution.

The reference intended METIS partitioning but never wired it
(``CMakeLists.txt:377-383`` — detection commented out as broken).  Per
BASELINE.md the rebuild uses **row/block partitioning**: cells are reordered
by reverse Cuthill–McKee (bandwidth-minimizing, so partition boundaries are
thin strips) and split into equal contiguous blocks, one per device.

Halo model: the union S of all cells referenced across a partition boundary
("shared cells") is laid out in a fixed per-partition-padded order.  At each
operator application every device contributes its owned shared cells and an
``all_gather`` over the mesh axis materializes S everywhere; local ELL
columns point either at owned slots [0, n_pad) or at S slots
[n_pad, n_pad + P·s_max).  With RCM ordering S is O(boundary), so the
all-gather moves only strip cells, riding ICI.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

__all__ = ["rcm_order", "PartitionedOperator", "partition_csr", "partition_vector", "unpartition_vector"]


def rcm_order(n: int, rows: np.ndarray, cols: np.ndarray) -> np.ndarray:
    """Reverse Cuthill–McKee ordering from an edge list (symmetrized).

    Returns ``order`` with ``order[new] = old``.  Pure NumPy BFS with
    degree-sorted neighbor visits.
    """
    rows = np.concatenate([rows, cols])
    cols_sym = np.concatenate([cols, rows[: len(cols)]])
    # Build CSR adjacency.
    mask = rows != cols_sym
    r, c = rows[mask], cols_sym[mask]
    order_rc = np.lexsort((c, r))
    r, c = r[order_rc], c[order_rc]
    keep = np.ones(len(r), dtype=bool)
    keep[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
    r, c = r[keep], c[keep]
    deg = np.bincount(r, minlength=n)
    ptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(deg, out=ptr[1:])

    visited = np.zeros(n, dtype=bool)
    result = np.empty(n, dtype=np.int64)
    pos = 0
    order_by_degree = np.argsort(deg, kind="stable")
    for seed in order_by_degree:
        if visited[seed]:
            continue
        # BFS from the lowest-degree unvisited node.
        visited[seed] = True
        queue = [seed]
        result[pos] = seed
        pos += 1
        head = pos - 1
        while head < pos:
            u = result[head]
            head += 1
            nbrs = c[ptr[u] : ptr[u + 1]]
            nbrs = nbrs[~visited[nbrs]]
            if len(nbrs):
                nbrs = nbrs[np.argsort(deg[nbrs], kind="stable")]
                visited[nbrs] = True
                result[pos : pos + len(nbrs)] = nbrs
                pos += len(nbrs)
    return result[::-1].copy()  # reverse


@dataclass(frozen=True)
class PartitionedOperator:
    """A sparse operator split into P device-local ELL blocks.

    Stacked leading axis = mesh axis; feed each field to shard_map with
    ``P('parts')`` sharding on axis 0.
    """

    num_parts: int
    n_global: int  # true (unpadded) size
    n_pad: int  # owned rows per partition (padded)
    s_max: int  # shared-cells slots per partition (padded)
    data: jnp.ndarray  # (P, n_pad, K)
    cols: jnp.ndarray  # (P, n_pad, K) local column ids
    send_slots: jnp.ndarray  # (P, s_max) local owned slots exported to S
    perm: np.ndarray  # global RCM order: perm[new] = old
    inv_perm: np.ndarray

    def local_matvec(self, axis_name: str):
        """Per-device SpMV closure for use inside shard_map.

        x_loc: (n_pad,) owned values → (n_pad,) result rows.
        One all_gather (halo) + one gather + row reduction.
        """
        from jax import lax

        def matvec(x_loc, data_loc, cols_loc, send_loc):
            contrib = x_loc[send_loc]  # (s_max,)
            shared = lax.all_gather(contrib, axis_name)  # (P, s_max)
            x_ext = jnp.concatenate([x_loc, shared.reshape(-1)])
            return jnp.sum(data_loc * x_ext[cols_loc], axis=1)

        return matvec


def partition_csr(csr, num_parts: int, *, reorder: bool = True) -> PartitionedOperator:
    """Partition a CSR operator into P local ELL blocks (host-side).

    Rows are RCM-reordered (unless ``reorder=False``) and split into equal
    contiguous blocks of ``n_pad = ceil(n/P)``; padding rows are zero.
    """
    n = csr.shape[0]
    row_ptr = np.asarray(csr.row_ptr)
    indices = np.asarray(csr.indices)
    data = np.asarray(csr.data)
    counts = np.diff(row_ptr)
    rows = np.repeat(np.arange(n), counts)

    if reorder:
        perm = rcm_order(n, rows, indices.astype(np.int64))
    else:
        perm = np.arange(n, dtype=np.int64)
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n)

    # Renumber: new row/col ids.
    new_rows = inv[rows]
    new_cols = inv[indices]

    P = num_parts
    n_pad = -(-n // P)

    def part_of(g):
        return g // n_pad

    def slot_of(g):
        return g % n_pad

    # Shared set S: columns referenced across a partition boundary.
    cross = part_of(new_rows) != part_of(new_cols)
    S = np.unique(new_cols[cross])
    s_part = part_of(S)
    s_counts = np.bincount(s_part, minlength=P)
    s_max = int(s_counts.max()) if len(S) else 1
    # Position of each shared cell inside its partition's contribution.
    s_starts = np.zeros(P + 1, dtype=np.int64)
    np.cumsum(s_counts, out=s_starts[1:])
    s_pos_within = np.arange(len(S)) - s_starts[s_part]
    shared_slot = s_part * s_max + s_pos_within  # position in flat S buffer
    shared_lookup = np.full(n, -1, dtype=np.int64)
    shared_lookup[S] = shared_slot

    send_slots = np.zeros((P, s_max), dtype=np.int32)
    send_slots[s_part, s_pos_within] = slot_of(S).astype(np.int32)

    # Local ELL: row width K = global max row count.
    K = int(counts.max()) if n else 0
    data_l = np.zeros((P, n_pad, K), dtype=data.dtype)
    cols_l = np.zeros((P, n_pad, K), dtype=np.int32)
    within = np.arange(len(rows)) - row_ptr[:-1].astype(np.int64)[rows]
    p_r = part_of(new_rows)
    slot_r = slot_of(new_rows)
    # Column mapping: owned → slot; foreign → n_pad + shared position.
    same = part_of(new_cols) == p_r
    local_col = np.where(
        same, slot_of(new_cols), n_pad + shared_lookup[new_cols]
    ).astype(np.int32)
    # Row-local nonzero position: order nonzeros by (new_row, within-original).
    order_nz = np.lexsort((within, new_rows))
    nr, wi = new_rows[order_nz], None
    starts_r = np.searchsorted(nr, np.arange(n))
    pos_in_row = np.arange(len(nr)) - starts_r[nr]
    data_l[p_r[order_nz], slot_r[order_nz], pos_in_row] = data[order_nz]
    cols_l[p_r[order_nz], slot_r[order_nz], pos_in_row] = local_col[order_nz]

    return PartitionedOperator(
        num_parts=P,
        n_global=n,
        n_pad=n_pad,
        s_max=s_max,
        data=jnp.asarray(data_l),
        cols=jnp.asarray(cols_l),
        send_slots=jnp.asarray(send_slots),
        perm=perm,
        inv_perm=inv,
    )


def partition_vector(pop: PartitionedOperator, x) -> jnp.ndarray:
    """Global (n,) vector → (P, n_pad) partitioned layout (RCM order)."""
    x = np.asarray(x)
    out = np.zeros((pop.num_parts * pop.n_pad,), dtype=x.dtype)
    out[: pop.n_global] = x[pop.perm]
    return jnp.asarray(out.reshape(pop.num_parts, pop.n_pad))


def unpartition_vector(pop: PartitionedOperator, xp) -> np.ndarray:
    """(P, n_pad) partitioned layout → global (n,) vector."""
    flat = np.asarray(xp).reshape(-1)[: pop.n_global]
    out = np.empty_like(flat)
    out[pop.perm] = flat
    return out
