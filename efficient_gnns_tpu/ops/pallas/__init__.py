from efficient_gnns_tpu.ops.pallas.segment_matmul import (
    blocked_segment_sum,
    blocked_sddmm_dw,
)

__all__ = ["blocked_segment_sum", "blocked_sddmm_dw"]
