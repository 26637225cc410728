from efficient_gnns_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_rows,
)
from efficient_gnns_tpu.parallel.partition import (
    PartitionedGraph,
    partition_graph,
    spmm_sharded,
)
from efficient_gnns_tpu.parallel.ring import (
    ring_gsp_term,
    ring_nce_term,
)

__all__ = [
    "make_mesh",
    "replicate",
    "shard_rows",
    "PartitionedGraph",
    "partition_graph",
    "spmm_sharded",
    "ring_gsp_term",
    "ring_nce_term",
]
