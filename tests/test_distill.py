"""Distillation criteria vs torch-functional reference formulas.

The reference losses are defined through torch.nn.functional with default
reductions (see efficient_gnns_tpu/distill/criteria.py docstring); torch
(CPU) is available here, so each term is checked against the direct formula.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from conftest import random_graph

from efficient_gnns_tpu import distill
from efficient_gnns_tpu.distill.criteria import subsample_rows


def _rand(rng, *shape):
    return rng.normal(size=shape).astype(np.float32)


def test_cls_ce_matches_torch(rng):
    logits = _rand(rng, 12, 7)
    labels = rng.integers(0, 7, size=12)
    ours = distill.cls_ce(jnp.asarray(logits), jnp.asarray(labels))
    ref = F.cross_entropy(torch.tensor(logits), torch.tensor(labels))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_cls_bce_matches_torch(rng):
    logits = _rand(rng, 10, 5)
    targets = (rng.random((10, 5)) > 0.5).astype(np.float32)
    ours = distill.cls_bce(jnp.asarray(logits), jnp.asarray(targets))
    ref = F.binary_cross_entropy_with_logits(torch.tensor(logits), torch.tensor(targets))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_kd_criterion_matches_torch(rng):
    logits = _rand(rng, 15, 6)
    tlogits = _rand(rng, 15, 6)
    labels = rng.integers(0, 6, size=15)
    alpha, T = 0.9, 4.0
    loss, loss_cls, loss_kd = distill.kd_criterion(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(tlogits), alpha, T
    )
    lt, tt = torch.tensor(logits), torch.tensor(tlogits)
    ref_kd = F.kl_div(
        F.log_softmax(lt / T, dim=1), F.softmax(tt / T, dim=1), log_target=False
    )
    ref_cls = F.cross_entropy(lt, torch.tensor(labels))
    ref = ref_kd * (alpha * T * T) + ref_cls * (1 - alpha)
    np.testing.assert_allclose(float(loss_kd), float(ref_kd), rtol=1e-5)
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-5)


def test_kd_bce_matches_torch(rng):
    logits = _rand(rng, 9, 4)
    tlogits = _rand(rng, 9, 4)
    targets = (rng.random((9, 4)) > 0.5).astype(np.float32)
    loss, _, loss_kd = distill.kd_criterion_bce(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(tlogits), 0.5, 1.0
    )
    ref_kd = F.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.sigmoid(torch.tensor(tlogits))
    )
    np.testing.assert_allclose(float(loss_kd), float(ref_kd), rtol=1e-5)


def test_fitnet_matches_torch(rng):
    f = _rand(rng, 11, 8)
    t = _rand(rng, 11, 8)
    ours = distill.fitnet_term(jnp.asarray(f), jnp.asarray(t))
    ref = F.mse_loss(
        F.normalize(torch.tensor(f), p=2, dim=-1),
        F.normalize(torch.tensor(t), p=2, dim=-1),
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_at_matches_torch(rng):
    f = _rand(rng, 13, 6)
    t = _rand(rng, 13, 6)
    ours = distill.at_term(jnp.asarray(f), jnp.asarray(t))
    ft = torch.tensor(f).pow(2).sum(-1)
    tt = torch.tensor(t).pow(2).sum(-1)
    ref = F.mse_loss(F.normalize(ft, p=2, dim=-1), F.normalize(tt, p=2, dim=-1))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_gsp_kernels_match_torch(rng):
    f = _rand(rng, 10, 5)
    t = _rand(rng, 10, 5)
    for kernel in ["cosine", "poly", "l2", "rbf"]:
        ours = distill.gsp_term(jnp.asarray(f), jnp.asarray(t), kernel)
        ft, tt = torch.tensor(f), torch.tensor(t)
        if kernel in ("cosine", "poly"):
            fn_ = F.normalize(ft, p=2, dim=-1)
            tn_ = F.normalize(tt, p=2, dim=-1)
            ps = fn_ @ fn_.T
            pt = tn_ @ tn_.T
            if kernel == "poly":
                ps, pt = ps**2, pt**2
        elif kernel == "l2":
            ps = (ft.unsqueeze(0) - ft.unsqueeze(1)).norm(p=2, dim=-1)
            pt = (tt.unsqueeze(0) - tt.unsqueeze(1)).norm(p=2, dim=-1)
        else:
            ps = torch.exp(-0.5 * ((ft.unsqueeze(0) - ft.unsqueeze(1)) ** 2).sum(-1))
            pt = torch.exp(-0.5 * ((tt.unsqueeze(0) - tt.unsqueeze(1)) ** 2).sum(-1))
        ref = F.mse_loss(ps.flatten(), pt.flatten())
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4, atol=1e-5), kernel


def test_gsp_subsampling_static(rng):
    f = jnp.asarray(_rand(rng, 50, 4))
    t = jnp.asarray(_rand(rng, 50, 4))
    key = jax.random.PRNGKey(0)
    v1 = distill.gsp_term(f, t, "cosine", key=key, max_samples=16)
    v2 = distill.gsp_term(f, t, "cosine", key=key, max_samples=16)
    assert float(v1) == float(v2)  # deterministic given key
    v3 = distill.gsp_term(f, t, "cosine", key=jax.random.PRNGKey(1), max_samples=16)
    assert float(v1) != float(v3)


def test_subsample_rows_mask(rng):
    mask = jnp.asarray(np.array([True] * 7 + [False] * 13))
    idx, sel = subsample_rows(jax.random.PRNGKey(0), 20, 10, mask)
    # all 7 valid rows selected first, padding flagged invalid
    assert int(sel.sum()) == 7
    assert set(np.asarray(idx[:7]).tolist()) == set(range(7))


def test_lsp_matches_torch(rng):
    n, e = 14, 40
    g, (s, r) = random_graph(rng, n, e)
    f = _rand(rng, n, 6)
    t = _rand(rng, n, 6)
    for kernel in ["cosine", "poly", "l2", "rbf"]:
        ours = distill.lsp_term(g, jnp.asarray(f), jnp.asarray(t), kernel, "kld")
        # torch reference with scatter softmax
        ss = np.asarray(g.senders)[:e]
        rr = np.asarray(g.receivers)[:e]
        ft, tt = torch.tensor(f), torch.tensor(t)

        def seg_softmax(vals, ids):
            out = torch.zeros_like(vals)
            for node in np.unique(ids):
                m = ids == node
                out[m] = torch.softmax(vals[m], dim=0)
            return out

        def sim(z):
            a, b = z[ss], z[rr]
            if kernel == "cosine":
                return F.cosine_similarity(a, b)
            if kernel == "poly":
                return F.cosine_similarity(a, b) ** 2
            if kernel == "l2":
                return (a - b).norm(p=2, dim=-1)
            return torch.exp(-0.5 * ((a - b) ** 2).sum(-1))

        ps = seg_softmax(sim(ft), rr)
        pt = seg_softmax(sim(tt), rr)
        ref = F.kl_div(torch.log(ps), pt, log_target=False)
        # ours averages over padded edge count with mask -> same count e
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4, atol=1e-5)


def test_nce_matches_torch(rng):
    f = _rand(rng, 12, 7)
    t = _rand(rng, 12, 7)
    nce_T = 0.075
    ours = distill.nce_term(jnp.asarray(f), jnp.asarray(t), nce_T)
    fn_ = F.normalize(torch.tensor(f), p=2, dim=-1)
    tn_ = F.normalize(torch.tensor(t), p=2, dim=-1)
    logits = fn_ @ tn_.T
    ref = F.cross_entropy(logits / nce_T, torch.arange(12))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_nce_masked_excludes_padding(rng):
    f = _rand(rng, 10, 4)
    t = _rand(rng, 10, 4)
    mask = np.array([True] * 6 + [False] * 4)
    ours = distill.nce_term(
        jnp.asarray(f), jnp.asarray(t), 0.1,
        key=jax.random.PRNGKey(0), max_samples=10, mask=jnp.asarray(mask),
    )
    # reference: compute on the 6 valid rows only
    idx, sel = subsample_rows(jax.random.PRNGKey(0), 10, 10, jnp.asarray(mask))
    order = np.asarray(idx[:6])
    fn_ = F.normalize(torch.tensor(f[order]), p=2, dim=-1)
    tn_ = F.normalize(torch.tensor(t[order]), p=2, dim=-1)
    ref = F.cross_entropy(fn_ @ tn_.T / 0.1, torch.arange(6))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


def test_nce_structured_multipositive(rng):
    # label- and edge-conditioned InfoNCE (reference modes nce-labels/-edges
    # are dead code there; implemented as working extensions here)
    from efficient_gnns_tpu.graphs import build_graph

    n, d = 8, 5
    f = _rand(rng, n, d)
    t = _rand(rng, n, d)
    labels = np.array([0, 0, 1, 1, 2, 2, 3, 3])
    s = np.array([0, 2, 4])
    r = np.array([5, 6, 7])
    g = build_graph(s, r, n, edge_pad_multiple=8)
    nce_T = 0.1

    got = distill.nce_term_structured(
        jnp.asarray(f), jnp.asarray(t), nce_T,
        labels=jnp.asarray(labels), graph=g,
    )

    fn_ = F.normalize(torch.tensor(f), p=2, dim=-1)
    tn_ = F.normalize(torch.tensor(t), p=2, dim=-1)
    logp = torch.log_softmax(fn_ @ tn_.T / nce_T, dim=-1).numpy()
    pos = np.eye(n, dtype=bool)
    pos |= labels[:, None] == labels[None, :]
    for a, b in zip(s, r):
        pos[b, a] = True  # receiver row, sender column
    ref = -np.mean([logp[i][pos[i]].mean() for i in range(n)])
    np.testing.assert_allclose(float(got), ref, rtol=1e-4)


def test_nce_structured_diag_only_matches_nce(rng):
    f = _rand(rng, 9, 6)
    t = _rand(rng, 9, 6)
    a = distill.nce_term(jnp.asarray(f), jnp.asarray(t), 0.075)
    b = distill.nce_term_structured(jnp.asarray(f), jnp.asarray(t), 0.075)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-5)


def test_kd_reduction_batchmean_scales_by_classes(rng):
    """batchmean = standard Hinton scaling: the KD term (and only it) is
    exactly C x the reference numel-mean term (F.kl_div 'mean' parity)."""
    from efficient_gnns_tpu.distill import criteria

    C = 7
    logits = jnp.asarray(rng.normal(size=(12, C)).astype(np.float32))
    tlogits = jnp.asarray(rng.normal(size=(12, C)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, C, size=12).astype(np.int32))
    l_n, cls_n, kd_n = criteria.kd_criterion(logits, labels, tlogits, 0.9, 2.0)
    l_b, cls_b, kd_b = criteria.kd_criterion(
        logits, labels, tlogits, 0.9, 2.0, reduction="batchmean"
    )
    np.testing.assert_allclose(float(cls_b), float(cls_n), rtol=1e-6)
    np.testing.assert_allclose(
        float(l_b), float(kd_n) * C * 0.9 * 4.0 + float(cls_n) * 0.1, rtol=1e-5
    )
