from efficient_gnns_tpu.data.synthetic import synthetic_node_dataset

__all__ = ["synthetic_node_dataset"]
