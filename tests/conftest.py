"""Test configuration: force a virtual 8-device CPU backend.

Tests must run without TPU hardware and must exercise multi-chip sharding
logic, so we ask XLA for 8 virtual CPU devices before JAX is imported —
the "fake backend" the reference lacks (SURVEY.md section 4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's sitecustomize may have force-registered a TPU backend and
# overridden JAX_PLATFORMS; pin the config explicitly (must run before any
# backend is initialized — conftest imports precede all test modules).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Best-effort build of the native host library so the native tests run and
# graph preprocessing takes the fast path (DGL-create_formats_-class work,
# reference arxiv_dgl/gat.py:56-71). Falls through silently where no
# toolchain exists — every native entry point has a NumPy fallback.
from efficient_gnns_tpu.native import host as _native_host  # noqa: E402

if not _native_host.available():
    _native_host.build(quiet=True)

assert jax.device_count() == 8, (
    "tests require the virtual 8-device CPU mesh; got "
    f"{jax.device_count()} {jax.devices()!r}"
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_graph(rng, num_nodes=20, num_edges=60, **kwargs):
    """Small random graph helper shared across tests."""
    from efficient_gnns_tpu.graphs import build_graph

    s = rng.integers(0, num_nodes, size=num_edges)
    r = rng.integers(0, num_nodes, size=num_edges)
    return build_graph(s, r, num_nodes, edge_pad_multiple=16, **kwargs), (s, r)


def dense_adj(s, r, num_nodes, w=None):
    """Dense adjacency A[r, s] (+= for multi-edges) for reference math."""
    a = np.zeros((num_nodes, num_nodes), dtype=np.float64)
    if w is None:
        w = np.ones_like(s, dtype=np.float64)
    np.add.at(a, (r, s), w)
    return a
