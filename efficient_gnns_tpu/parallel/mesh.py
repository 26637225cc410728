"""Device mesh helpers — the framework's communication layer.

The reference has NO collective backend at all (SURVEY.md section 2.5: its
"distributed" story is tmux-spawned independent per-seed processes). Here
scaling is first-class: a ``jax.sharding.Mesh`` with ``data`` and ``model``
axes, `NamedSharding` annotations on node/feature arrays, and XLA-inserted
collectives over ICI. Edge partitioning with explicit halo exchange lives in
parallel/partition.py.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axes: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    Default is a 1-D ``data`` mesh; pass ``axes=('data','model')`` with a
    ``shape`` to split axes (e.g. ``shape=(4, 2)``).
    """
    devs = jax.devices()[: n_devices or len(jax.devices())]
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axes) - 1)
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, axes)


def shard_rows(mesh: Mesh, x, axis: str = "data"):
    """Place an array with its leading axis sharded over ``axis``."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, tree):
    """Replicate every leaf of a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), tree)
