"""Bisect the runtime-weight SpMM: fwd only, bwd only, weight_grad=False."""
import sys
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from efficient_gnns_tpu.analysis.microbench import bench_scan, cached_graph
from efficient_gnns_tpu.ops import spmm

def build():
    from efficient_gnns_tpu.data import synthetic_node_dataset
    ds = synthetic_node_dataset(num_nodes=169_343, num_edges=1_166_243,
                                feat_dim=128, seed=0, label_smoothing_hops=0)
    return ds.graph

def log(m): print(m, file=sys.stderr, flush=True)

graph = jax.device_put(cached_graph("arxiv_shaped", build))
n = graph.num_nodes
ep = graph.senders.shape[0]
x = jax.random.normal(jax.random.PRNGKey(0), (n, 128), jnp.float32)
w = jax.random.uniform(jax.random.PRNGKey(1), (ep,), jnp.float32)
jax.block_until_ready((x, w))

def fwd_only(g, c):
    x, w = c
    out = spmm(g, x, edge_weight=w)
    return (x + out * 1e-20, w), jnp.sum(out[0])

def fwd_bwd_nowgrad(g, c):
    x, w = c
    def f(x):
        return jnp.sum(spmm(g, x, edge_weight=w, weight_grad=False) ** 2)
    loss, gx = jax.value_and_grad(f)(x)
    return (x + 1e-12 * gx, w), loss

def fwd_bwd_xonly(g, c):
    x, w = c
    def f(x):
        return jnp.sum(spmm(g, x, edge_weight=w) ** 2)
    loss, gx = jax.value_and_grad(f)(x)
    return (x + 1e-12 * gx, w), loss

def fwd_bwd_wonly(g, c):
    x, w = c
    def f(w):
        return jnp.sum(spmm(g, x, edge_weight=w) ** 2)
    loss, gw = jax.value_and_grad(f)(w)
    return (x, w + 1e-12 * gw), loss

def fwd_bwd_full(g, c):
    x, w = c
    def f(x, w):
        return jnp.sum(spmm(g, x, edge_weight=w) ** 2)
    loss, (gx, gw) = jax.value_and_grad(f, argnums=(0, 1))(x, w)
    return (x + 1e-12 * gx, w + 1e-12 * gw), loss

for label, fn in [
    ("runtime fwd only", fwd_only),
    ("runtime fwd+bwd weight_grad=False", fwd_bwd_nowgrad),
    ("runtime fwd+bwd dx only", fwd_bwd_xonly),
    ("runtime fwd+bwd dw only", fwd_bwd_wonly),
    ("runtime fwd+bwd full", fwd_bwd_full),
]:
    dt = bench_scan(fn, (x, w), iters=20, verbose=False, const=graph)
    log(f"{label}: {dt:.2f} ms")
