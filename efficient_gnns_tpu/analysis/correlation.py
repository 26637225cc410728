"""Embedding-structure analysis: how much of the teacher's representational
geometry does a student inherit?

Re-creation of the reference's ``arxiv_pyg/correlation.py`` capability:
  * global metric — Pearson correlation between teacher/student condensed
    pairwise cosine-distance vectors over a node subset
    (``correlation.py:178-214``: ``1 - f f^T`` -> ``squareform`` -> pearson);
  * local metric — Pearson over per-edge cosine distances
    (``correlation.py:182,210``);
  * linear CKA (``fast_linear_CKA``, ``correlation.py:79-87``).

Everything here is batched dense linear algebra (MXU-friendly); the N x N
Gram is computed blockwise so a 10-20k node subset never materializes more
than ``block x N`` at a time.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


def pairwise_cosine_distance_condensed(feat: jnp.ndarray,
                                       block: int = 2048) -> np.ndarray:
    """Condensed (upper-triangle) cosine-distance vector, scipy
    ``squareform`` ordering: row-major pairs (i, j), i < j."""
    f = _l2_normalize(jnp.asarray(feat, jnp.float32))
    n = f.shape[0]

    @jax.jit
    def row_block(lo, fb):
        return 1.0 - fb @ f.T  # [B, N]

    out = []
    for lo in range(0, n, block):
        hi = min(lo + block, n)
        d = np.asarray(row_block(lo, f[lo:hi]))
        for i in range(lo, hi):
            out.append(d[i - lo, i + 1:])
    return np.concatenate(out)


def edge_cosine_distance(feat: jnp.ndarray, senders: np.ndarray,
                         receivers: np.ndarray) -> np.ndarray:
    """Per-edge cosine distance ``1 - cos(f[src], f[dst])``."""
    f = _l2_normalize(jnp.asarray(feat, jnp.float32))
    sim = jnp.sum(f[jnp.asarray(senders)] * f[jnp.asarray(receivers)], axis=-1)
    return np.asarray(1.0 - sim)


def mantel_correlation(a: np.ndarray, b: np.ndarray) -> float:
    """Pearson correlation between two distance vectors."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    a = a - a.mean()
    b = b - b.mean()
    denom = np.sqrt((a * a).sum() * (b * b).sum())
    return float((a * b).sum() / denom) if denom else 0.0


def linear_cka(x: np.ndarray, y: np.ndarray) -> float:
    """Linear CKA via the feature-space (d x d) form.

    Equivalent to the reference's ``fast_linear_CKA`` (Gram-centering form,
    ``correlation.py:79-87``) but O(n d^2) instead of O(n^2 d): with
    column-centered X, ``sum(centering(XX^T) * centering(YY^T)) =
    ||Xc^T Yc||_F^2``.
    """
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    xc = x - x.mean(axis=0, keepdims=True)
    yc = y - y.mean(axis=0, keepdims=True)
    hsic = np.linalg.norm(xc.T @ yc, "fro") ** 2
    var1 = np.linalg.norm(xc.T @ xc, "fro")
    var2 = np.linalg.norm(yc.T @ yc, "fro")
    denom = var1 * var2
    return float(hsic / denom) if denom else 0.0


def structure_report(
    teacher_feat: jnp.ndarray,
    student_feat: jnp.ndarray,
    senders: Optional[np.ndarray] = None,
    receivers: Optional[np.ndarray] = None,
    max_nodes: int = 4096,
    seed: int = 0,
) -> Dict[str, float]:
    """Global/local Mantel correlations + linear CKA for one run.

    Mirrors the per-run body of the reference's analysis loop
    (``correlation.py:155-214``): both feature sets are L2-normalized, the
    global metric subsamples to ``max_nodes`` for the condensed vector.
    """
    t = np.asarray(teacher_feat, np.float32)
    s = np.asarray(student_feat, np.float32)
    assert t.shape[0] == s.shape[0]
    n = t.shape[0]
    if n > max_nodes:
        idx = np.random.default_rng(seed).choice(n, max_nodes, replace=False)
        tg, sg = t[idx], s[idx]
    else:
        tg, sg = t, s

    report = {
        "global_corr": mantel_correlation(
            pairwise_cosine_distance_condensed(tg),
            pairwise_cosine_distance_condensed(sg),
        ),
        "cka": linear_cka(
            np.asarray(_l2_normalize(jnp.asarray(sg))),
            np.asarray(_l2_normalize(jnp.asarray(tg))),
        ),
    }
    if senders is not None and receivers is not None:
        report["local_corr"] = mantel_correlation(
            edge_cosine_distance(t, senders, receivers),
            edge_cosine_distance(s, senders, receivers),
        )
    return report
