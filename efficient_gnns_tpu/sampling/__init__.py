from efficient_gnns_tpu.sampling.hop_precompute import neighbor_average_features
from efficient_gnns_tpu.sampling.minibatch import NodeBatcher

__all__ = ["neighbor_average_features", "NodeBatcher"]
