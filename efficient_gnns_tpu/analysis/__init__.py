from efficient_gnns_tpu.analysis.curves import plot_curves
from efficient_gnns_tpu.analysis.correlation import (
    edge_cosine_distance,
    linear_cka,
    mantel_correlation,
    pairwise_cosine_distance_condensed,
    structure_report,
)

__all__ = [
    "plot_curves",
    "edge_cosine_distance",
    "linear_cka",
    "mantel_correlation",
    "pairwise_cosine_distance_condensed",
    "structure_report",
]
