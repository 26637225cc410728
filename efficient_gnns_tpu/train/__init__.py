from efficient_gnns_tpu.train.config import DistillConfig, TRAINING_MODES
from efficient_gnns_tpu.train.logger import Logger
from efficient_gnns_tpu.train.node_trainer import NodeDistillTrainer, TrainState

__all__ = [
    "DistillConfig",
    "TRAINING_MODES",
    "Logger",
    "NodeDistillTrainer",
    "TrainState",
]
