"""Metrics / observability writer.

The reference logs per-epoch TensorBoard scalars ``loss/{train,cls,aux}``
and ``acc/{train,valid,test}`` plus stdout lines (``arxiv_pyg/gnn.py:
346-361``). This writer keeps those exact metric names and emits:

* JSONL — one record per epoch (machine-readable, greppable, no deps);
* TensorBoard event files via ``torch.utils.tensorboard`` when available
  (gated import; JSONL is always written).

Usage::

    w = MetricsWriter(log_dir, tensorboard=True)
    w.write(epoch, {"loss/train": ..., "acc/valid": ...})
    w.close()
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional


class MetricsWriter:
    def __init__(self, log_dir: str, tensorboard: bool = False,
                 filename: str = "metrics.jsonl"):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._f = open(os.path.join(log_dir, filename), "a")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._tb = None

    def write(self, step: int, scalars: Dict[str, float]) -> None:
        rec = {"step": int(step)}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), int(step))

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_jsonl(log_dir: str, filename: str = "metrics.jsonl"):
    """Load all records from a metrics JSONL file."""
    path = os.path.join(log_dir, filename)
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out
