"""Embedding-structure analysis vs direct scipy/numpy formulas."""

import json
import os

import numpy as np

from efficient_gnns_tpu.analysis import (
    edge_cosine_distance,
    linear_cka,
    mantel_correlation,
    pairwise_cosine_distance_condensed,
    structure_report,
)


def _ref_condensed(f):
    f = f / np.linalg.norm(f, axis=-1, keepdims=True)
    d = 1 - f @ f.T
    iu = np.triu_indices(len(f), k=1)
    return d[iu]


def test_condensed_matches_squareform(rng):
    f = rng.normal(size=(50, 8)).astype(np.float32)
    got = pairwise_cosine_distance_condensed(f, block=16)
    np.testing.assert_allclose(got, _ref_condensed(f), rtol=1e-4, atol=1e-5)


def test_mantel_matches_pearson(rng):
    a = rng.normal(size=200)
    b = 0.5 * a + rng.normal(size=200)
    got = mantel_correlation(a, b)
    ref = np.corrcoef(a, b)[0, 1]
    np.testing.assert_allclose(got, ref, rtol=1e-10)


def test_cka_matches_gram_form(rng):
    x = rng.normal(size=(60, 7))
    y = rng.normal(size=(60, 5))

    def centering(k):
        n = k.shape[0]
        h = np.eye(n) - np.ones((n, n)) / n
        return h @ k @ h

    lx, ly = centering(x @ x.T), centering(y @ y.T)
    ref = np.sum(lx * ly) / (
        np.sqrt(np.sum(lx * lx)) * np.sqrt(np.sum(ly * ly))
    )
    np.testing.assert_allclose(linear_cka(x, y), ref, rtol=1e-8)
    # identical (up to rotation) features -> CKA 1
    q, _ = np.linalg.qr(rng.normal(size=(7, 7)))
    np.testing.assert_allclose(linear_cka(x, x @ q), 1.0, rtol=1e-8)


def test_structure_report(rng):
    n = 80
    t = rng.normal(size=(n, 16)).astype(np.float32)
    s = t + 0.01 * rng.normal(size=(n, 16)).astype(np.float32)
    src = rng.integers(0, n, size=120)
    dst = rng.integers(0, n, size=120)
    rep = structure_report(t, s, src, dst)
    assert rep["global_corr"] > 0.99
    assert rep["local_corr"] > 0.99
    assert rep["cka"] > 0.99
    # unrelated embeddings decorrelate
    u = rng.normal(size=(n, 16)).astype(np.float32)
    rep2 = structure_report(t, u, src, dst)
    assert abs(rep2["global_corr"]) < 0.3


def test_submit_aggregator(tmp_path, capsys):
    from efficient_gnns_tpu.cli import submit

    blob = {
        "args": {"expt_name": "e1", "runs": 2},
        "runs": [{"run": 0}, {"run": 1}],
        "statistics": {"final_test_mean": 0.71, "final_test_std": 0.002,
                       "highest_valid_mean": 0.72, "highest_valid_std": 0.001},
    }
    with open(os.path.join(tmp_path, "e1-gcn-kd.json"), "w") as f:
        json.dump(blob, f)
    submit.main(["--out_dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert "e1-gcn-kd" in out and "71.00" in out


def test_capture_trace_writes_profile(tmp_path):
    import jax.numpy as jnp
    from efficient_gnns_tpu.analysis.timing import capture_trace

    def f(x):
        return jnp.sum(x * x)

    d = capture_trace(f, jnp.arange(8.0), trace_dir=str(tmp_path), steps=2)
    # the profiler writes a plugins/profile/<run>/ tree with a trace file
    found = list((tmp_path / "plugins").rglob("*.*"))
    assert found, f"no trace artifacts under {d}"
