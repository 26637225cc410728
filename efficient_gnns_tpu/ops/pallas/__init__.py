from efficient_gnns_tpu.ops.pallas.segment_matmul import (
    blocked_sddmm_dw,
    blocked_sddmm_dw_heads,
    blocked_segment_sum,
    blocked_segment_sum_heads,
)
from efficient_gnns_tpu.ops.pallas.segment_thin import (
    blocked_segment_max_thin,
    blocked_segment_sum_thin,
    tile_rows_thin,
)

__all__ = [
    "blocked_segment_sum",
    "blocked_segment_sum_heads",
    "blocked_sddmm_dw",
    "blocked_sddmm_dw_heads",
    "blocked_segment_max_thin",
    "blocked_segment_sum_thin",
    "tile_rows_thin",
]
