"""Native host runtime bindings (C++ via ctypes, NumPy fallback)."""

from efficient_gnns_tpu.native.host import (
    available,
    blocking_arrays,
    build,
    csr_offsets,
    filter_relabel_edges,
    lexsort_edges,
    random_walks,
    to_bidirected,
)

__all__ = [
    "available",
    "blocking_arrays",
    "build",
    "csr_offsets",
    "filter_relabel_edges",
    "lexsort_edges",
    "random_walks",
    "to_bidirected",
]
