"""Multi-chip distribution layer (the capability the reference lacks).

The reference intended METIS mesh partitioning but never wired it
(``CMakeLists.txt:377-383``); there is no MPI/NCCL anywhere (SURVEY §2.9).
This package supplies the TPU-native replacement: RCM row/block partitioning
of CSR operators, per-device ELL blocks with an all-gathered shared-boundary
halo, and whole Krylov solves running inside a single ``shard_map`` region
with ``psum`` reductions riding ICI.
"""

from stormx.parallel.amg import DistributedAmg
from stormx.parallel.block_amg import DistributedBlockDiaAmg
from stormx.parallel.banded import PartitionedDIA, partition_dia, sharded_dia_solve
from stormx.parallel.partition import (
    PartitionedOperator,
    bfs_partition,
    partition_csr,
    partition_vector,
    rcm_order,
    unpartition_vector,
)
from stormx.parallel.bsr import (
    PartitionedBandedBSR,
    partition_bsr_banded,
    PartitionedBSR,
    partition_bsr,
    partition_bsr_vector,
    sharded_bsr_solve,
    unpartition_bsr_vector,
)
from stormx.parallel.fvm import PartitionedFv, partition_fv, sharded_fv_march
from stormx.parallel.ras import build_ras_factors
from stormx.parallel.sharded import make_device_mesh, sharded_matvec, sharded_solve
from stormx.parallel.sliced import (
    PartitionedSliced,
    partition_sliced,
    sharded_sliced_solve,
)

__all__ = [
    "DistributedAmg",
    "DistributedBlockDiaAmg",
    "PartitionedBSR",
    "partition_bsr",
    "partition_bsr_banded",
    "PartitionedBandedBSR",
    "partition_bsr_vector",
    "unpartition_bsr_vector",
    "sharded_bsr_solve",
    "build_ras_factors",
    "PartitionedSliced",
    "partition_sliced",
    "sharded_sliced_solve",
    "PartitionedFv",
    "partition_fv",
    "sharded_fv_march",
    "PartitionedOperator",
    "PartitionedDIA",
    "partition_dia",
    "sharded_dia_solve",
    "bfs_partition",
    "partition_csr",
    "partition_vector",
    "rcm_order",
    "unpartition_vector",
    "make_device_mesh",
    "sharded_matvec",
    "sharded_solve",
]
