"""Teacher artifact I/O — the offline dump/replay coupling.

The reference's GAT teacher saves per-seed artifacts as torch tensors in
``output/ logits/ features/ checkpoints/`` dirs (``arxiv_dgl/gat.py:243-258``)
which students ``torch.load`` (``arxiv_pyg/gnn.py:276-279``). Here the
documented format is one ``.npz`` per seed:

    <dir>/teacher_seed<k>.npz  with arrays:
        features : float32 [N, D]   penultimate-layer activations
        logits   : float32 [N, C]   raw logits
        output   : float32 [N, C]   softmax probabilities (optional)

Model checkpoints (pytrees) go through train/checkpoint.py (orbax/npz).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def teacher_dump_path(dir_: str, seed: int) -> str:
    return os.path.join(dir_, f"teacher_seed{seed}.npz")


def save_teacher_dump(
    dir_: str,
    seed: int,
    features: np.ndarray,
    logits: np.ndarray,
    output: Optional[np.ndarray] = None,
) -> str:
    os.makedirs(dir_, exist_ok=True)
    path = teacher_dump_path(dir_, seed)
    arrays = {
        "features": np.asarray(features, np.float32),
        "logits": np.asarray(logits, np.float32),
    }
    if output is not None:
        arrays["output"] = np.asarray(output, np.float32)
    np.savez(path, **arrays)
    return path


def load_teacher_dump(dir_: str, seed: int) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (features, logits) for one seed."""
    with np.load(teacher_dump_path(dir_, seed)) as z:
        return z["features"], z["logits"]
