"""Distillation criteria — pure-JAX ports of the reference loss semantics.

Canonical reference: ``arxiv_pyg/criterion.py`` (CE-based) and
``ppi_pyg/criterion.py`` (BCE-based). Reduction semantics are matched
*exactly*, including the reference's use of torch defaults:

* ``F.kl_div(reduction='mean')`` divides by **numel** (N*C), not batch size
  (``arxiv_pyg/criterion.py:13-17``) — reproduced here, since the published
  hyperparameters (alpha, T, beta) were tuned against it;
* ``F.mse_loss`` is an all-element mean;
* ``F.cross_entropy`` is a batch mean.

All functions take *already gathered* rows (the trainers gather
``[train_idx]`` exactly as ``arxiv_pyg/gnn.py:109-189`` does). For padded /
variable-size batches (GraphSAINT, PPI) every term accepts an optional
``mask`` that removes padding rows from the reductions — the static-shape
equivalent of the reference's boolean indexing.

Each ``*_term`` returns the raw auxiliary scalar; each ``*_criterion``
returns the reference-shaped ``(loss, loss_cls, loss_aux)`` triple. The
KD+aux composition (``gnn_kd_and_aux.py:110-181``) is then
``kd_loss + beta * aux_term``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from efficient_gnns_tpu.graphs.container import Graph
from efficient_gnns_tpu.ops import segment_softmax


# ---------------------------------------------------------------------------
# reductions
# ---------------------------------------------------------------------------


def _masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mean over all elements, with rows (leading axis) masked out."""
    if mask is None:
        return jnp.mean(x)
    m = mask.reshape(mask.shape + (1,) * (x.ndim - mask.ndim)).astype(x.dtype)
    per_row = 1 if x.ndim == mask.ndim else x.shape[-1]
    denom = jnp.maximum(jnp.sum(mask.astype(x.dtype)) * per_row, 1.0)
    return jnp.sum(x * m) / denom


def _normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """torch ``F.normalize(p=2)`` semantics (divide by max(norm, eps)), but
    with an eps *inside* the rsqrt so the gradient at all-zero rows is finite
    (ReLU features can produce exactly-zero rows; d(sqrt)/dx at 0 is inf and
    0 * inf = NaN would poison the whole backward pass)."""
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(sq + eps * eps)


# ---------------------------------------------------------------------------
# classification terms
# ---------------------------------------------------------------------------


def cls_ce(logits, labels, mask=None):
    """Mean cross-entropy over (valid) rows."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    if mask is None:
        return jnp.mean(nll)
    m = mask.astype(nll.dtype)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def cls_bce(logits, targets, mask=None):
    """BCE-with-logits, mean over all elements (PPI multi-label)."""
    x = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    # numerically-stable binary cross entropy with logits
    loss = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return _masked_mean(loss, mask)


# ---------------------------------------------------------------------------
# logit KD (Hinton)  —  arxiv_pyg/criterion.py:8-21, ppi_pyg/criterion.py:8-18
# ---------------------------------------------------------------------------


def kd_term(logits, teacher_logits, T: float = 4.0, mask=None):
    """KL(softmax(teacher/T) || softmax(student/T)), mean over numel."""
    ls = jax.nn.log_softmax(logits.astype(jnp.float32) / T, axis=-1)
    pt = jax.nn.softmax(teacher_logits.astype(jnp.float32) / T, axis=-1)
    # clamp must stay in normal f32 range: subnormals can flush to zero on
    # TPU/XLA, turning the clamp into log(0) with a NaN gradient
    elt = pt * (jnp.log(jnp.maximum(pt, 1e-20)) - ls)
    # torch xlogy semantics: 0 * log 0 = 0
    elt = jnp.where(pt > 0, elt, 0.0)
    return _masked_mean(elt, mask)


def kd_criterion(logits, labels, teacher_logits, alpha=0.9, T=4.0, mask=None,
                 reduction: str = "numel"):
    """``alpha * T^2 * KL + (1 - alpha) * CE``.

    ``reduction="numel"`` (default) reproduces the reference exactly:
    ``F.kl_div(..., reduction='mean')`` divides the KL by N*C
    (``arxiv_pyg/criterion.py:14-18``) — with C=40 classes the KD term is
    40x smaller than its CE-comparable scale, so the KD gradient is nearly
    inert at small T (torch's own docs flag 'mean' as not matching the KL
    math). ``reduction="batchmean"`` sums over classes and means over
    nodes — the mathematically-standard Hinton formulation; use it when
    the KD signal, not reference-bug parity, is the point.
    """
    loss_cls = cls_ce(logits, labels, mask)
    loss_kd = kd_term(logits, teacher_logits, T, mask)
    if reduction == "batchmean":
        loss_kd = loss_kd * logits.shape[-1]
    elif reduction != "numel":
        raise ValueError(f"unknown kd reduction {reduction!r}")
    return loss_kd * (alpha * T * T) + loss_cls * (1 - alpha), loss_cls, loss_kd


def kd_term_bce(logits, teacher_logits, mask=None):
    """BCE against sigmoid(teacher) soft targets (ppi_pyg/criterion.py:13)."""
    return cls_bce(logits, jax.nn.sigmoid(teacher_logits.astype(jnp.float32)), mask)


def kd_criterion_bce(logits, targets, teacher_logits, alpha=0.5, T=1.0, mask=None):
    loss_cls = cls_bce(logits, targets, mask)
    loss_kd = kd_term_bce(logits, teacher_logits, mask)
    return loss_kd * (alpha * T * T) + loss_cls * (1 - alpha), loss_cls, loss_kd


# ---------------------------------------------------------------------------
# FitNet  —  arxiv_pyg/criterion.py:24-36
# ---------------------------------------------------------------------------


def fitnet_term(feat, teacher_feat, mask=None):
    f = _normalize(feat.astype(jnp.float32))
    t = _normalize(teacher_feat.astype(jnp.float32))
    return _masked_mean(jnp.square(f - t), mask)


def fitnet_criterion(logits, labels, feat, teacher_feat, beta=1000.0, mask=None):
    loss_cls = cls_ce(logits, labels, mask)
    loss_aux = fitnet_term(feat, teacher_feat, mask)
    return loss_cls + beta * loss_aux, loss_cls, loss_aux


# ---------------------------------------------------------------------------
# Attention Transfer  —  arxiv_pyg/criterion.py:39-54
# ---------------------------------------------------------------------------


def at_term(feat, teacher_feat, mask=None):
    # per-node squared-activation norms, then L2-normalized over the whole
    # node vector (F.normalize of a 1-D tensor == global normalization)
    f = jnp.sum(jnp.square(feat.astype(jnp.float32)), axis=-1)
    t = jnp.sum(jnp.square(teacher_feat.astype(jnp.float32)), axis=-1)
    if mask is not None:
        f = jnp.where(mask, f, 0.0)
        t = jnp.where(mask, t, 0.0)
    f = f / jnp.maximum(jnp.linalg.norm(f), 1e-12)
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    return _masked_mean(jnp.square(f - t), mask)


def at_criterion(logits, labels, feat, teacher_feat, beta=1000.0, mask=None):
    loss_cls = cls_ce(logits, labels, mask)
    loss_aux = at_term(feat, teacher_feat, mask)
    return loss_cls + beta * loss_aux, loss_cls, loss_aux


# ---------------------------------------------------------------------------
# GSP / "gpw": Global Structure Preserving  —  arxiv_pyg/criterion.py:57-92
# ---------------------------------------------------------------------------


def subsample_rows(
    key: jax.Array, n_rows: int, max_samples: int, mask: Optional[jnp.ndarray]
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Static-shape analog of ``np.random.choice(n, m, replace=False)``.

    Returns ``(idx[m], sel_mask[m] or None)``. With a row-validity mask,
    valid rows sort first so padding is only selected when fewer than
    ``max_samples`` valid rows exist (then flagged in ``sel_mask``).
    """
    if max_samples >= n_rows and mask is None:
        return jnp.arange(n_rows, dtype=jnp.int32), None
    scores = jax.random.uniform(key, (n_rows,))
    if mask is not None:
        scores = scores + jnp.where(mask, 0.0, 2.0)  # invalid rows last
    idx = jnp.argsort(scores)[: min(max_samples, n_rows)].astype(jnp.int32)
    sel_mask = None if mask is None else mask[idx]
    return idx, sel_mask


def gsp_term(
    feat,
    teacher_feat,
    kernel: str = "cosine",
    *,
    key: Optional[jax.Array] = None,
    max_samples: int = 8192,
    mask=None,
):
    """MSE between teacher/student pairwise-similarity (Gram) matrices."""
    n = feat.shape[0]
    if (max_samples < n or mask is not None) and key is not None:
        idx, sel_mask = subsample_rows(key, n, max_samples, mask)
        feat = feat[idx]
        teacher_feat = teacher_feat[idx]
    else:
        sel_mask = mask
    f = feat.astype(jnp.float32)
    t = teacher_feat.astype(jnp.float32)

    def gram(z):
        if kernel in ("cosine", "poly"):
            z = _normalize(z)
            g = z @ z.T
            return g * g if kernel == "poly" else g
        if kernel == "l2":
            sq = jnp.sum(z * z, axis=-1)
            d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * (z @ z.T), 0.0)
            return jnp.sqrt(d2 + 1e-12)
        if kernel == "rbf":
            sq = jnp.sum(z * z, axis=-1)
            d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * (z @ z.T), 0.0)
            return jnp.exp(-0.5 * d2)
        raise NotImplementedError(kernel)

    diff2 = jnp.square(gram(f) - gram(t))
    if sel_mask is not None:
        pair = sel_mask[:, None] & sel_mask[None, :]
        return jnp.sum(jnp.where(pair, diff2, 0.0)) / jnp.maximum(
            jnp.sum(pair.astype(jnp.float32)), 1.0
        )
    return jnp.mean(diff2)


def gsp_criterion(
    logits, labels, feat, teacher_feat, kernel="cosine", beta=1.0,
    max_samples=8192, key=None, mask=None,
):
    loss_cls = cls_ce(logits, labels, mask)
    loss_aux = gsp_term(
        feat, teacher_feat, kernel, key=key, max_samples=max_samples, mask=mask
    )
    return loss_cls + beta * loss_aux, loss_cls, loss_aux


# ---------------------------------------------------------------------------
# LSP / "lpw": Local Structure Preserving  —  arxiv_pyg/criterion.py:95-126
# ---------------------------------------------------------------------------


def _edge_similarity(graph: Graph, feat: jnp.ndarray, kernel: str) -> jnp.ndarray:
    s = jnp.take(feat, jnp.minimum(graph.senders, graph.num_nodes - 1), axis=0)
    d = jnp.take(feat, jnp.minimum(graph.receivers, graph.num_nodes - 1), axis=0)
    s = s.astype(jnp.float32)
    d = d.astype(jnp.float32)
    if kernel in ("cosine", "poly"):
        sim = jnp.sum(_normalize(s) * _normalize(d), axis=-1)
        return sim * sim if kernel == "poly" else sim
    if kernel == "l2":
        return jnp.sqrt(jnp.sum(jnp.square(s - d), axis=-1) + 1e-12)
    if kernel == "rbf":
        return jnp.exp(-0.5 * jnp.sum(jnp.square(s - d), axis=-1))
    raise NotImplementedError(kernel)


def lsp_term(
    graph: Graph,
    feat,
    teacher_feat,
    kernel: str = "cosine",
    mode: str = "kld",
    keep_mask=None,
):
    """Per-edge similarity distributions (segment-softmax over in-edges of
    each receiver), KL(teacher || student) or MSE, mean over edge count.

    The segment softmax is the same primitive as GAT attention
    normalization — the reference routes it through
    ``torch_geometric.utils.softmax`` (criterion.py:103-113).
    """
    mask = graph.edge_mask
    if keep_mask is not None:
        # restrict to a node subset (e.g. train nodes of a sampled subgraph,
        # reference mag_pyg/gnn.py:237) without relabeling: masked softmax
        # over kept edges == softmax over the induced subgraph's edges
        mask = jnp.logical_and(mask, keep_mask)
    p_s = segment_softmax(
        _edge_similarity(graph, feat, kernel), graph.receivers, graph.num_nodes, mask
    )
    p_t = segment_softmax(
        _edge_similarity(graph, teacher_feat, kernel),
        graph.receivers,
        graph.num_nodes,
        mask,
    )
    if mode == "mse":
        return _masked_mean(jnp.square(p_s - p_t), mask)
    if mode == "kld":
        elt = p_t * (
            jnp.log(jnp.maximum(p_t, 1e-20)) - jnp.log(jnp.maximum(p_s, 1e-20))
        )
        elt = jnp.where(p_t > 0, elt, 0.0)
        return _masked_mean(elt, mask)
    raise NotImplementedError(mode)


def lsp_criterion(
    logits, labels, feat, teacher_feat, graph: Graph, kernel="cosine",
    beta=100.0, mode="kld", mask=None,
):
    loss_cls = cls_ce(logits, labels, mask)
    loss_aux = lsp_term(graph, feat, teacher_feat, kernel, mode)
    return loss_cls + beta * loss_aux, loss_cls, loss_aux


# ---------------------------------------------------------------------------
# G-CRD / "nce": contrastive representation distillation
# arxiv_pyg/criterion.py:129-149
# ---------------------------------------------------------------------------


def nce_term(
    feat,
    teacher_feat,
    nce_T: float = 0.075,
    *,
    key: Optional[jax.Array] = None,
    max_samples: int = 8192,
    mask=None,
):
    """InfoNCE: student row i should match teacher row i among M candidates."""
    n = feat.shape[0]
    if (max_samples < n or mask is not None) and key is not None:
        idx, sel_mask = subsample_rows(key, n, max_samples, mask)
        feat = feat[idx]
        teacher_feat = teacher_feat[idx]
    else:
        sel_mask = mask
    f = _normalize(feat.astype(jnp.float32))
    t = _normalize(teacher_feat.astype(jnp.float32))
    logits = (f @ t.T) / nce_T
    if sel_mask is not None:
        # invalid columns are not candidates; invalid rows excluded from mean
        # (finite fill instead of -inf so fully-masked rows don't produce NaN)
        logits = jnp.where(sel_mask[None, :], logits, jnp.finfo(jnp.float32).min)
    logp = jax.nn.log_softmax(logits, axis=-1)
    diag = jnp.diagonal(logp)
    if sel_mask is not None:
        m = sel_mask.astype(jnp.float32)
        diag = jnp.where(sel_mask, diag, 0.0)
        return -jnp.sum(diag * m) / jnp.maximum(jnp.sum(m), 1.0)
    return -jnp.mean(diag)


def nce_criterion(
    logits, labels, feat, teacher_feat, beta=0.5, nce_T=0.075,
    max_samples=8192, key=None, mask=None,
):
    loss_cls = cls_ce(logits, labels, mask)
    loss_aux = nce_term(
        feat, teacher_feat, nce_T, key=key, max_samples=max_samples, mask=mask
    )
    return loss_cls + beta * loss_aux, loss_cls, loss_aux


def nce_term_structured(
    feat,
    teacher_feat,
    nce_T: float = 0.075,
    *,
    key: Optional[jax.Array] = None,
    max_samples: int = 8192,
    mask=None,
    labels: Optional[jnp.ndarray] = None,
    graph=None,
):
    """Label- and/or edge-conditioned InfoNCE (multi-positive G-CRD).

    The reference's student trainers dispatch ``nce-labels``, ``nce-edges``
    and ``nce-labels-edges`` modes to criteria that were never released
    (``arxiv_pyg/gnn.py:149-177`` calls undefined functions — a NameError in
    the reference). This implements those modes as working extensions: in
    addition to the diagonal student-i/teacher-i pair, columns sharing node
    i's *label* (``labels``) and/or i's graph *neighbors* (``graph``) count
    as positives; the loss is the mean over positives of ``-log p`` (the
    standard supervised-contrastive generalization).
    """
    n = feat.shape[0]
    if key is not None:
        idx, sel_mask = subsample_rows(key, n, max_samples, mask)
    else:
        idx = jnp.arange(n)
        sel_mask = mask
    m = idx.shape[0]
    if sel_mask is None:
        sel_mask = jnp.ones((m,), dtype=bool)
    f = _normalize(feat[idx].astype(jnp.float32))
    t = _normalize(teacher_feat[idx].astype(jnp.float32))
    logits = (f @ t.T) / nce_T
    logits = jnp.where(sel_mask[None, :], logits, jnp.finfo(jnp.float32).min)
    logp = jax.nn.log_softmax(logits, axis=-1)

    pos = jnp.eye(m, dtype=bool)
    if labels is not None:
        lab = labels.reshape(-1)[idx]
        pos = jnp.logical_or(pos, lab[:, None] == lab[None, :])
    if graph is not None:
        # edge positives among the subsample: map node -> sampled slot (+1),
        # scatter each intra-sample edge into the MxM indicator
        slot = jnp.zeros((graph.num_nodes + 1,), jnp.int32)
        slot = slot.at[idx].set(jnp.arange(1, m + 1, dtype=jnp.int32))
        si = slot[jnp.minimum(graph.senders, graph.num_nodes)]
        ri = slot[jnp.minimum(graph.receivers, graph.num_nodes)]
        both = (si > 0) & (ri > 0) & graph.edge_mask
        flat = jnp.where(both, (ri - 1) * m + (si - 1), m * m)
        adj = jnp.zeros((m * m + 1,), jnp.float32).at[flat].add(1.0)
        pos = jnp.logical_or(pos, (adj[: m * m] > 0).reshape(m, m))
    pos = jnp.logical_and(pos, sel_mask[None, :])
    pos = jnp.logical_and(pos, sel_mask[:, None])
    pos_f = pos.astype(jnp.float32)
    per_row = -jnp.sum(logp * pos_f, axis=-1) / jnp.maximum(
        jnp.sum(pos_f, axis=-1), 1.0
    )
    row_m = sel_mask.astype(jnp.float32)
    return jnp.sum(per_row * row_m) / jnp.maximum(jnp.sum(row_m), 1.0)
