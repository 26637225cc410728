"""Component-level microbench of the runtime-weight SpMM path."""
import sys
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from efficient_gnns_tpu.analysis.microbench import bench_scan, cached_graph
from efficient_gnns_tpu.ops.spmm import _expand_runtime, _pad_features
from efficient_gnns_tpu.ops.segment import gather

def build():
    from efficient_gnns_tpu.data import synthetic_node_dataset
    ds = synthetic_node_dataset(num_nodes=169_343, num_edges=1_166_243,
                                feat_dim=128, seed=0, label_smoothing_hops=0)
    return ds.graph

def log(m): print(m, file=sys.stderr, flush=True)

graph = jax.device_put(cached_graph("arxiv_shaped", build))
n = graph.num_nodes
ep = graph.senders.shape[0]
blk, tblk = graph.blocking, graph.t_blocking
x = jax.random.normal(jax.random.PRNGKey(0), (n, 128), jnp.float32)
w = jax.random.uniform(jax.random.PRNGKey(1), (ep,), jnp.float32)
jax.block_until_ready((x, w, blk.src))

def expand_fwd(g, c):
    x, w = c
    wb = _expand_runtime(w + x[0, 0] * 1e-20, g.blocking)
    return (x + jnp.sum(wb) * 1e-20, w), jnp.sum(wb)

def expand_bwd(g, c):
    x, w = c
    wb = _expand_runtime(w + x[0, 0] * 1e-20, g.t_blocking)
    return (x + jnp.sum(wb) * 1e-20, w), jnp.sum(wb)

def gather_rows(g, c):
    x, w = c
    m = gather(x, g.blocking.src)
    return (x + jnp.sum(m) * 1e-20, w), jnp.sum(m)

def scatter_static(g, c):
    from efficient_gnns_tpu.ops.pallas import blocked_segment_sum
    x, w = c
    m = gather(x, g.blocking.src)
    out = blocked_segment_sum(m, g.blocking, n, w=g.blocking.w_blk)
    return (x + jnp.sum(out) * 1e-20, w), jnp.sum(out)

def dw_kernel(g, c):
    from efficient_gnns_tpu.ops.pallas import blocked_sddmm_dw
    from efficient_gnns_tpu.ops.spmm import _pad_rows
    x, w = c
    blk = g.blocking
    x_blk = gather(x, blk.src)
    gt = _pad_rows(x, blk.num_tiles * blk.tm)
    dwb = blocked_sddmm_dw(gt, x_blk, blk)
    return (x + jnp.sum(dwb) * 1e-20, w), jnp.sum(dwb)

def dw_invperm(g, c):
    from efficient_gnns_tpu.ops.pallas import blocked_sddmm_dw
    from efficient_gnns_tpu.ops.spmm import _pad_rows
    x, w = c
    blk = g.blocking
    x_blk = gather(x, blk.src)
    gt = _pad_rows(x, blk.num_tiles * blk.tm)
    dwb = blocked_sddmm_dw(gt, x_blk, blk)
    dw = gather(dwb, blk.inv_perm)
    return (x + jnp.sum(dw) * 1e-20, w), jnp.sum(dw)

for label, fn in [
    ("expand_runtime fwd-blk", expand_fwd),
    ("expand_runtime tblk", expand_bwd),
    ("row gather [E,128]", gather_rows),
    ("gather+scatter static", scatter_static),
    ("dw kernel (no invperm)", dw_kernel),
    ("dw kernel + invperm gather", dw_invperm),
]:
    dt = bench_scan(fn, (x, w), iters=20, verbose=False, const=graph)
    log(f"{label}: {dt:.2f} ms")

