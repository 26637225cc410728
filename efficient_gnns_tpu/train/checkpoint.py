"""Checkpointing — pytree save/restore.

The reference only ever *saves* (``results.pt`` bundles, per-seed teacher
checkpoints — SURVEY.md section 5 "Checkpoint/resume"); here both save and
resume are supported. Orbax is used when available (async-capable), with a
flax-serialization ``.msgpack`` fallback that has no extra dependencies.
"""

from __future__ import annotations

import os
from typing import Any

from flax import serialization


def save_pytree(path: str, tree: Any) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(tree))
    return path


def load_pytree(path: str, target: Any) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def save_orbax(path: str, tree: Any) -> str:
    """Orbax checkpoint (directory format); falls back to msgpack."""
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), tree, force=True)
        ckptr.wait_until_finished()
        return path
    except Exception:
        return save_pytree(path + ".msgpack", tree)
