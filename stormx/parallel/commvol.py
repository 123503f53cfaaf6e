"""Exact communication-volume accounting for the partitioned operators.

BASELINE.md targets ">=80% SpMV scaling efficiency 1→N chips", which needs
hardware this environment doesn't have (one chip).  The honest single-chip
proxy (VERDICT r3 item 6): the bytes each operator application MOVES over
the interconnect are exactly computable from partition metadata, and
scaling efficiency is bounded by comm/compute overlap — so we publish
bytes-moved-per-apply vs owned-operator-bytes for every distributed path
at P ∈ {2, 4, 8, 16} and gate the O(boundary) growth in a test.

Conventions (per operator application):

* ``moved`` — values crossing device boundaries, summed over devices, in
  elements.  all-gather pools move the PADDED buffer (that is the real
  traffic): each device receives (P−1)·s_max foreign elements.  ppermute
  halos move a fixed strip each way.
* ``owned`` — operator values read locally, summed over devices (the
  compute-side traffic the communication must hide under).
* ``ratio`` — moved / owned: the figure of merit; scaling is
  communication-bound once it approaches the compute:bandwidth ratio.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "csr_pool_volume",
    "dia_halo_volume",
    "sliced_band_volume",
    "bsr_pool_volume",
]


def _report(moved: int, owned: int, itemsize: int = 4) -> dict:
    return {
        "moved_elems": int(moved),
        "owned_elems": int(owned),
        "moved_bytes": int(moved) * itemsize,
        "owned_bytes": int(owned) * itemsize,
        "ratio": float(moved) / max(owned, 1),
    }


def csr_pool_volume(pop) -> dict:
    """CSR shared-pool path (:class:`stormx.parallel.partition
    .PartitionedOperator`): one ``all_gather`` of the (P, s_max) contribution
    buffer per apply — each device receives (P−1)·s_max foreign elements.
    Owned = the (P, n_pad, K) operator values actually read."""
    P, s_max = pop.num_parts, pop.s_max
    moved = P * (P - 1) * s_max
    owned = int(np.count_nonzero(np.asarray(pop.data)))
    return _report(moved, owned, np.asarray(pop.data).dtype.itemsize)


def dia_halo_volume(pdia) -> dict:
    """Banded DIA path (:class:`stormx.parallel.banded.PartitionedDIA`):
    two ``ppermute`` halo strips of h rows each per apply (ends zero-fill —
    count the (P−1) live links each way)."""
    P, h = pdia.num_parts, pdia.h
    moved = 2 * (P - 1) * h
    owned = int(np.count_nonzero(np.asarray(pdia.data)))
    return _report(moved, owned, np.asarray(pdia.data).dtype.itemsize)


def sliced_band_volume(psell) -> dict:
    """SlicedELL band path (:class:`stormx.parallel.sliced.PartitionedSliced
    `-style shards): ppermute halos of h_lo (left) and h_hi (right) rows."""
    P = psell.num_parts
    moved = (P - 1) * (psell.h_lo + psell.h_hi)
    if psell.mode == "dense":
        owned = int(np.count_nonzero(np.asarray(psell.dense_blocks)))
    else:
        owned = int(np.count_nonzero(np.asarray(psell.ell_data)))
    return _report(moved, owned)


def bsr_pool_volume(pb) -> dict:
    """BSR shared-pool path (:class:`stormx.parallel.bsr.PartitionedBSR`):
    one ``all_gather`` of (P, s_max, b) block-row contributions per apply."""
    P, s_max, b = pb.num_parts, pb.s_max, pb.block_size
    moved = P * (P - 1) * s_max * b
    owned = int(np.count_nonzero(np.asarray(pb.blocks)))
    return _report(moved, owned, np.asarray(pb.blocks).dtype.itemsize)
