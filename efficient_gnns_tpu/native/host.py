"""ctypes bindings for the native host runtime (native/gnns_host.cc).

The native library accelerates the O(E) host-side preprocessing — edge
lexsort, CSR offsets, bidirection dedup, Pallas edge blocking, GraphSAINT
random walks — replacing the reference's in-dependency native code (DGL
``create_formats_``, torch-cluster ``random_walk``). Every entry point has a
NumPy fallback so the package works without compiling; call
:func:`available` to check which path is active, and ``make -C native`` (or
:func:`build`) to compile.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "libgnns_host.so")

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    i64 = ctypes.c_int64
    u64 = ctypes.c_uint64
    p64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    p32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")

    lib.lexsort_edges.argtypes = [p64, p64, i64, i64, p64]
    lib.lexsort_edges.restype = None
    lib.csr_offsets.argtypes = [p32, i64, i64, p32]
    lib.csr_offsets.restype = None
    lib.to_bidirected.argtypes = [p64, p64, i64, ctypes.c_void_p, ctypes.c_void_p]
    lib.to_bidirected.restype = i64
    lib.blocking_size.argtypes = [p32, i64, i64, i64, i64]
    lib.blocking_size.restype = i64
    lib.blocking_fill.argtypes = [p32, p32, i64, i64, i64, i64, i64,
                                  p32, p32, p32, p32, p32]
    lib.blocking_fill.restype = None
    lib.random_walks.argtypes = [p32, p32, i64, p32, i64, i64, u64, p32]
    lib.random_walks.restype = None
    lib.filter_relabel_edges.argtypes = [p64, p64, i64, p64, p64, p64]
    lib.filter_relabel_edges.restype = i64
    _lib = lib
    return _lib


def available() -> bool:
    """True iff the compiled native library is loadable."""
    return _load() is not None


def build(quiet: bool = True) -> bool:
    """Compile native/libgnns_host.so via make; returns success."""
    global _tried
    try:
        subprocess.run(
            ["make", "-C", os.path.join(_REPO_ROOT, "native")],
            check=True,
            capture_output=quiet,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    _tried = False
    return _load() is not None


# ---------------------------------------------------------------------------
# Entry points (native with NumPy fallback)
# ---------------------------------------------------------------------------


def lexsort_edges(senders: np.ndarray, receivers: np.ndarray,
                  num_nodes: int) -> np.ndarray:
    """Permutation sorting edges by (receiver, sender)."""
    lib = _load()
    senders = np.ascontiguousarray(senders, dtype=np.int64)
    receivers = np.ascontiguousarray(receivers, dtype=np.int64)
    if lib is None:
        return np.lexsort((senders, receivers))
    order = np.empty(len(senders), dtype=np.int64)
    lib.lexsort_edges(senders, receivers, len(senders), num_nodes, order)
    return order


def csr_offsets(sorted_rows: np.ndarray, num_rows: int) -> np.ndarray:
    lib = _load()
    sorted_rows = np.ascontiguousarray(sorted_rows, dtype=np.int32)
    if lib is None:
        counts = np.bincount(
            sorted_rows[sorted_rows < num_rows], minlength=num_rows
        ).astype(np.int32)
        offsets = np.zeros(num_rows + 1, dtype=np.int32)
        np.cumsum(counts, out=offsets[1:])
        return offsets
    offsets = np.empty(num_rows + 1, dtype=np.int32)
    lib.csr_offsets(sorted_rows, len(sorted_rows), num_rows, offsets)
    return offsets


def to_bidirected(senders: np.ndarray,
                  receivers: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    senders = np.ascontiguousarray(senders, dtype=np.int64)
    receivers = np.ascontiguousarray(receivers, dtype=np.int64)
    if lib is None:
        s = np.concatenate([senders, receivers])
        r = np.concatenate([receivers, senders])
        edges = np.unique(np.stack([s, r], axis=1), axis=0)
        return edges[:, 0], edges[:, 1]
    n = len(senders)
    out_s = np.empty(2 * n, dtype=np.int64)
    out_r = np.empty(2 * n, dtype=np.int64)
    k = lib.to_bidirected(
        senders, receivers, n,
        out_s.ctypes.data_as(ctypes.c_void_p),
        out_r.ctypes.data_as(ctypes.c_void_p),
    )
    return out_s[:k].copy(), out_r[:k].copy()


def blocking_arrays(senders: np.ndarray, receivers: np.ndarray,
                    num_nodes: int, num_edges_padded: int,
                    tm: int, eb: int):
    """Native construction of the Pallas edge-blocking arrays.

    Returns (tile_idx[nb], first_flag[nb], edge_id[nb*eb], src[nb*eb],
    dst_local[nb, eb]) or None if the library is unavailable (caller falls
    back to the NumPy builder in graphs/blocking.py).
    """
    lib = _load()
    if lib is None:
        return None
    senders = np.ascontiguousarray(senders, dtype=np.int32)
    receivers = np.ascontiguousarray(receivers, dtype=np.int32)
    e_pad = len(receivers)
    nb = lib.blocking_size(receivers, e_pad, num_nodes, tm, eb)
    tile_idx = np.empty(nb, dtype=np.int32)
    first_flag = np.empty(nb, dtype=np.int32)
    edge_id = np.empty(nb * eb, dtype=np.int32)
    src = np.empty(nb * eb, dtype=np.int32)
    dst_local = np.empty(nb * eb, dtype=np.int32)
    lib.blocking_fill(senders, receivers, e_pad, num_nodes, num_edges_padded,
                      tm, eb, tile_idx, first_flag, edge_id, src, dst_local)
    return tile_idx, first_flag, edge_id, src, dst_local.reshape(nb, eb)


def random_walks(offsets: np.ndarray, nbrs: np.ndarray, roots: np.ndarray,
                 walk_length: int, seed: int) -> np.ndarray:
    """[num_roots, walk_length+1] node ids (root included), CSR out-edges."""
    lib = _load()
    offsets = np.ascontiguousarray(offsets, dtype=np.int32)
    nbrs = np.ascontiguousarray(nbrs, dtype=np.int32)
    roots = np.ascontiguousarray(roots, dtype=np.int32)
    stride = walk_length + 1
    if lib is None:
        rng = np.random.default_rng(seed)
        out = np.empty((len(roots), stride), dtype=np.int32)
        out[:, 0] = cur = roots.copy()
        for s in range(walk_length):
            deg = offsets[cur + 1] - offsets[cur]
            pick = (rng.random(len(cur)) * np.maximum(deg, 1)).astype(np.int64)
            nxt = nbrs[np.minimum(offsets[cur] + pick, len(nbrs) - 1)]
            cur = np.where(deg > 0, nxt, cur).astype(np.int32)
            out[:, s + 1] = cur
        return out
    out = np.empty(len(roots) * stride, dtype=np.int32)
    lib.random_walks(offsets, nbrs, len(offsets) - 1, roots, len(roots),
                     walk_length, seed, out)
    return out.reshape(len(roots), stride)


def filter_relabel_edges(senders: np.ndarray, receivers: np.ndarray,
                         relabel: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Relabeled edges whose endpoints both map (relabel[v] >= 0)."""
    lib = _load()
    senders = np.ascontiguousarray(senders, dtype=np.int64)
    receivers = np.ascontiguousarray(receivers, dtype=np.int64)
    relabel = np.ascontiguousarray(relabel, dtype=np.int64)
    if lib is None:
        s = relabel[senders]
        r = relabel[receivers]
        keep = (s >= 0) & (r >= 0)
        return s[keep], r[keep]
    out_s = np.empty(len(senders), dtype=np.int64)
    out_r = np.empty(len(senders), dtype=np.int64)
    k = lib.filter_relabel_edges(senders, receivers, len(senders), relabel,
                                 out_s, out_r)
    return out_s[:k].copy(), out_r[:k].copy()
