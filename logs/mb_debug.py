import sys, time
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from efficient_gnns_tpu.analysis.microbench import cached_graph
from efficient_gnns_tpu.ops import spmm

def build():
    from efficient_gnns_tpu.data import synthetic_node_dataset
    ds = synthetic_node_dataset(num_nodes=169_343, num_edges=1_166_243,
                                feat_dim=128, seed=0, label_smoothing_hops=0)
    return ds.graph

def log(m): print(m, file=sys.stderr, flush=True)

graph = jax.device_put(cached_graph("arxiv_shaped", build))
x = jax.random.normal(jax.random.PRNGKey(0), (graph.num_nodes, 128), jnp.float32)
jax.block_until_ready((graph.blocking.src, x))
ITERS = 50

def f(graph, x):
    return jnp.sum(spmm(graph, x) ** 2)

@jax.jit
def steps(graph, x, nonce):
    def body(carry, _):
        loss, grads = jax.value_and_grad(f, argnums=1)(graph, carry)
        return carry + 1e-12 * grads, loss
    x, losses = jax.lax.scan(body, x + nonce, None, length=ITERS)
    return losses[-1]

t0 = time.time(); loss = steps(graph, x, jnp.float32(0.0)); jax.block_until_ready(loss)
log(f"warmup {time.time()-t0:.1f}s")
for trial in range(3):
    t0 = time.time(); loss = steps(graph, x, jnp.float32(1e-9)); _ = float(loss)
    log(f"trial {trial}: {(time.time()-t0)/ITERS*1e3:.2f} ms/iter")
