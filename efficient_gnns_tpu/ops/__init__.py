from efficient_gnns_tpu.ops.segment import (
    gather,
    segment_max,
    segment_mean,
    segment_min,
    segment_softmax,
    segment_sum,
)
from efficient_gnns_tpu.ops.spmm import spmm, spmm_heads, spmm_mean
from efficient_gnns_tpu.ops.sddmm import sddmm_add, sddmm_dot
from efficient_gnns_tpu.ops.edge_softmax import edge_softmax
from efficient_gnns_tpu.ops.hub_attention import (
    hub_gat_attention,
    supports_hub_attention,
)

__all__ = [
    "gather",
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_min",
    "segment_softmax",
    "spmm",
    "spmm_heads",
    "spmm_mean",
    "sddmm_add",
    "sddmm_dot",
    "edge_softmax",
    "hub_gat_attention",
    "supports_hub_attention",
]
