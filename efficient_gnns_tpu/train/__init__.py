from efficient_gnns_tpu.train.config import DistillConfig, TRAINING_MODES
from efficient_gnns_tpu.train.logger import Logger
from efficient_gnns_tpu.train.node_trainer import NodeDistillTrainer, TrainState
from efficient_gnns_tpu.train.gat_teacher import GATTeacherTrainer, TeacherConfig
from efficient_gnns_tpu.train.sign_trainer import SIGNTrainer
from efficient_gnns_tpu.train.checkpoint import load_pytree, save_pytree

__all__ = [
    "DistillConfig",
    "TRAINING_MODES",
    "Logger",
    "NodeDistillTrainer",
    "TrainState",
    "GATTeacherTrainer",
    "TeacherConfig",
    "SIGNTrainer",
    "save_pytree",
    "load_pytree",
]
