"""Run configuration — one dataclass covering every reference knob.

The reference scatters hyperparameters across per-script argparse blocks
(``arxiv_pyg/gnn.py:386-423``, ``arxiv_dgl/gat.py:307-335``,
``mag_pyg/gnn.py:485-526``) and bash sweep headers
(``arxiv_pyg/scripts/run_gcn.sh:3-8``). Here one config drives all trainers;
CLI modules expose the same flag names.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

TRAINING_MODES = (
    "supervised",
    "kd",
    "fitnet",
    "at",
    "gpw",  # GSP (reference's flag name)
    "lpw",  # LSP
    "nce",  # G-CRD
    "gcd",  # graph-conditioned G-CRD
)


@dataclasses.dataclass
class DistillConfig:
    # experiment
    training: str = "supervised"  # one of TRAINING_MODES
    kd_and_aux: bool = False  # compose aux loss with logit KD (gnn_kd_and_aux.py)
    runs: int = 10
    epochs: int = 500
    seed: int = 0
    log_every: int = 1

    # model
    model: str = "gcn"  # gcn | sage | gat | sign | rgcn | ...
    num_layers: int = 2
    hidden: int = 256
    dropout: float = 0.5
    lr: float = 0.01
    weight_decay: float = 0.0

    # logit KD (arxiv_pyg defaults; PPI uses alpha=0.5, T=1)
    alpha: float = 0.9
    kd_T: float = 4.0
    # "numel" = reference parity (F.kl_div 'mean', KL / (N*C));
    # "batchmean" = standard Hinton scaling (see distill/criteria.py)
    kd_reduction: str = "numel"

    # representation distillation
    beta: float = 1000.0
    kernel: str = "cosine"  # cosine | poly | l2 | rbf
    max_samples: int = 8192
    proj_dim: int = 256
    nce_T: float = 0.075

    # teacher feature dim (750 for arxiv GAT dumps, 1024 PPI, 512 MAG)
    teacher_dim: int = 750

    def needs_mlp_proj(self) -> bool:
        return self.training in (
            "fitnet", "gpw", "nce", "nce-labels", "nce-edges", "nce-labels-edges",
        )

    def needs_gcd_proj(self) -> bool:
        return self.training == "gcd"

    def needs_teacher(self) -> bool:
        return self.training != "supervised" or self.kd_and_aux
