"""Microbench: runtime-weight SpMM (GAT attention path) vs static path."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from efficient_gnns_tpu.analysis.microbench import bench_scan, cached_graph
from efficient_gnns_tpu.ops import spmm, spmm_heads, edge_softmax


def build():
    from efficient_gnns_tpu.data import synthetic_node_dataset
    ds = synthetic_node_dataset(
        num_nodes=169_343, num_edges=1_166_243, feat_dim=128, seed=0,
        label_smoothing_hops=0,
    )
    return ds.graph


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    graph = cached_graph("arxiv_shaped", build)
    graph = jax.device_put(graph)
    n = graph.num_nodes
    ep = graph.senders.shape[0]
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, 128), jnp.float32)
    w = jax.random.uniform(jax.random.PRNGKey(1), (ep,), jnp.float32)
    scores = jax.random.normal(jax.random.PRNGKey(2), (ep,), jnp.float32)
    xh = jax.random.normal(key, (n, 3, 128), jnp.float32)
    wh = jax.random.uniform(jax.random.PRNGKey(1), (ep, 3), jnp.float32)
    jax.block_until_ready((x, w, xh, wh, scores))

    def static_step(graph, x):
        loss, g = jax.value_and_grad(lambda x: jnp.sum(spmm(graph, x) ** 2))(x)
        return x + 1e-12 * g, loss

    def runtime_step(graph, carry):
        x, w = carry
        def f(x, w):
            return jnp.sum(spmm(graph, x, edge_weight=w) ** 2)
        loss, (gx, gw) = jax.value_and_grad(f, argnums=(0, 1))(x, w)
        return (x + 1e-12 * gx, w + 1e-12 * gw), loss

    def softmax_runtime_step(graph, carry):
        x, s = carry
        def f(x, s):
            a = edge_softmax(graph, s)
            return jnp.sum(spmm(graph, x, edge_weight=a) ** 2)
        loss, (gx, gs) = jax.value_and_grad(f, argnums=(0, 1))(x, s)
        return (x + 1e-12 * gx, s + 1e-12 * gs), loss

    def heads_step(graph, carry):
        x, w = carry
        def f(x, w):
            return jnp.sum(spmm_heads(graph, x, w) ** 2)
        loss, (gx, gw) = jax.value_and_grad(f, argnums=(0, 1))(x, w)
        return (x + 1e-12 * gx, w + 1e-12 * gw), loss

    for label, step, init in [
        ("static fwd+bwd", static_step, x),
        ("runtime-w fwd+bwd", runtime_step, (x, w)),
        ("softmax+runtime-w fwd+bwd", softmax_runtime_step, (x, scores)),
        ("heads(3) fwd+bwd", heads_step, (xh, wh)),
    ]:
        dt = bench_scan(step, init, iters=20, label=label, verbose=False,
                        const=graph)
        log(f"{label}: {dt:.2f} ms/iter")


if __name__ == "__main__":
    main()
