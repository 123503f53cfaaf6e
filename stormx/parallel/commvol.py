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
    "bsr_band_volume",
    "project_scaling",
    "V5E_ICI_LINK_BW",
    "V5E_ICI_LATENCY_S",
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


def bsr_band_volume(pb) -> dict:
    """Banded BSR path (:class:`stormx.parallel.bsr.PartitionedBandedBSR`):
    two ppermute halo strips of (h_lo + h_hi) block rows × b per apply —
    constant per link, O(P) total."""
    P, b = pb.num_parts, pb.block_size
    moved = (P - 1) * (pb.h_lo + pb.h_hi) * b
    owned = int(np.count_nonzero(np.asarray(pb.blocks)))
    return _report(moved, owned, np.asarray(pb.blocks).dtype.itemsize)


# -- Scaling-efficiency projection (VERDICT r4 item 5) -----------------------
#
# The >=80% 1→N SpMV scaling target (BASELINE.md) cannot be *measured* on one
# chip; it CAN be modeled from quantities this repo does measure or compute
# exactly: the single-chip per-apply time T1 (slope protocol, BENCH_NOTES.md)
# and the per-link bytes each distributed layout moves per apply (the
# *_volume accountants above).  Interconnect constants for TPU v5e (public
# "How to Scale Your Model" book, jax-ml.github.io/scaling-book): one-way
# ICI bandwidth ~4.5e10 B/s per link, ~1 µs collective hop latency.

V5E_ICI_LINK_BW = 4.5e10  # bytes/s, one-way, per ICI link
V5E_ICI_LATENCY_S = 1.0e-6  # per-hop collective latency


def project_scaling(
    t1_apply_s: float,
    per_link_bytes: float,
    num_parts: int,
    *,
    link_bw: float = V5E_ICI_LINK_BW,
    latency_s: float = V5E_ICI_LATENCY_S,
    overlap: bool = True,
) -> dict:
    """Project P-device SpMV scaling efficiency from first principles.

    ``t1_apply_s``: measured single-chip per-apply slope.
    ``per_link_bytes``: bytes the busiest link carries per apply (halo
    layouts: the one-direction strip; all-gather pools: the (P−1)/P ring
    share each device relays).

    Model: per-device compute is T1/P (the kernel is bandwidth-bound, so
    throughput per chip is size-independent until shards get tiny); the
    communication term is ``latency + bytes/link_bw``, fully hidden behind
    interior compute when ``overlap`` (the measured-bit-identical overlap
    paths in ``parallel/banded.py``/``sliced.py``) up to the point where
    comm exceeds compute.  Efficiency = T1 / (P · T_P).
    """
    compute = t1_apply_s / num_parts
    comm = latency_s + per_link_bytes / link_bw
    t_p = max(compute, comm) if overlap else compute + comm
    return {
        "P": num_parts,
        "t1_us": t1_apply_s * 1e6,
        "tP_us": t_p * 1e6,
        "compute_us": compute * 1e6,
        "comm_us": comm * 1e6,
        "efficiency": t1_apply_s / (num_parts * t_p),
        "comm_bound": comm > compute,
    }
