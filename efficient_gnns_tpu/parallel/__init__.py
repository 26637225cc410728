from efficient_gnns_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_rows,
)

__all__ = ["make_mesh", "replicate", "shard_rows"]
