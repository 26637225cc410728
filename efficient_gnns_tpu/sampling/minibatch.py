"""Static-shape node-ID minibatching.

Reference: torch ``DataLoader`` over train node IDs with batch size 50k
(``arxiv_dgl/sign.py:407-411``). For XLA the batch size must be static, so
the last partial batch is padded and carries a validity mask — one compiled
step serves every batch.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np


class NodeBatcher:
    def __init__(self, node_ids: np.ndarray, batch_size: int, shuffle: bool = True):
        self.node_ids = np.asarray(node_ids)
        self.batch_size = int(batch_size)
        self.shuffle = shuffle

    def __len__(self) -> int:
        return -(-len(self.node_ids) // self.batch_size)

    def epoch(self, seed: int) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Yields (ids[batch_size], mask[batch_size]) with padding repeated
        from the first id (masked out)."""
        ids = self.node_ids
        if self.shuffle:
            ids = np.random.default_rng(seed).permutation(ids)
        b = self.batch_size
        for i in range(0, len(ids), b):
            chunk = ids[i : i + b]
            mask = np.ones(b, dtype=bool)
            if len(chunk) < b:
                mask[len(chunk):] = False
                chunk = np.concatenate(
                    [chunk, np.full(b - len(chunk), ids[0], dtype=ids.dtype)]
                )
            yield chunk.astype(np.int32), mask
