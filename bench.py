"""Benchmark: SpMM fwd+bwd edges/s on an ogbn-arxiv-shaped graph (1 chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the dominant sparse training op of the GCN student workload
(reference ``arxiv_pyg/gnn.py:28-35``): forward SpMM over the cached
symmetric-normalized adjacency plus its backward (the transposed SpMM),
i.e. one fwd+bwd of ``A_hat @ X`` with gradient w.r.t. X.

The reference repo ships timing harnesses but records no numbers
(BASELINE.md "Throughput / memory"), so ``vs_baseline`` here is the fraction
of single-chip speed-of-light: the HBM-bandwidth roofline for one training
iteration (gather E feature rows + scatter-accumulate for forward, the same
over the transposed graph for dX — about 4*E*F*4 bytes of HBM traffic at
~819 GB/s on TPU v5e).
"""

import json
import sys
import time

import numpy as np

# arxiv scale: 169,343 nodes; 1,166,243 directed edges -> ~2.33M bidirected
NUM_NODES = 169_343
NUM_EDGES = 1_166_243
FEAT_DIM = 128
HBM_BW_BYTES = 819e9  # TPU v5e (v5 lite) HBM bandwidth
ITERS = 20


def main():
    import jax
    import jax.numpy as jnp

    from efficient_gnns_tpu.data import synthetic_node_dataset
    from efficient_gnns_tpu.ops import spmm

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    t0 = time.time()
    ds = synthetic_node_dataset(
        num_nodes=NUM_NODES, num_edges=NUM_EDGES, feat_dim=FEAT_DIM, seed=0,
        label_smoothing_hops=0,
    )
    graph = ds.graph
    e_real = int(graph.n_edge)
    print(f"graph built in {time.time() - t0:.1f}s: {NUM_NODES} nodes, "
          f"{e_real} edges (padded {graph.num_edges_padded})", file=sys.stderr)

    # Graph and features are jit ARGUMENTS (the Graph container is a pytree),
    # never closure constants: baking multi-MB index arrays into the XLA
    # program as constants bloats the compile payload (and exceeds the
    # remote-compile request limit on tunneled TPU backends).
    graph = jax.device_put(graph)
    x = jax.device_put(jnp.asarray(ds.x))

    @jax.jit
    def fwd_bwd(graph, x):
        # GCN training shape: static normalized adjacency (pre-blocked
        # weights), gradient w.r.t. node features only
        def f(x):
            return jnp.sum(spmm(graph, x) ** 2)

        loss, grads = jax.value_and_grad(f)(x)
        return loss, grads

    # warmup/compile
    t0 = time.time()
    out = fwd_bwd(graph, x)
    jax.block_until_ready(out)
    print(f"compile+first-run {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    for _ in range(ITERS):
        out = fwd_bwd(graph, x)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / ITERS

    edges_per_s = e_real / dt
    # speed-of-light: ~4 edge-row HBM transits per fwd+bwd iteration
    sol_time = 4 * e_real * FEAT_DIM * 4 / HBM_BW_BYTES
    vs_baseline = edges_per_s / (e_real / sol_time)

    print(f"iter {dt * 1e3:.2f} ms, edges/s {edges_per_s:.3e}, "
          f"SoL fraction {vs_baseline:.3f}", file=sys.stderr)
    print(json.dumps({
        "metric": "edges/s/chip (SpMM fwd+bwd) on ogbn-arxiv-shaped graph",
        "value": edges_per_s,
        "unit": "edges/s",
        "vs_baseline": vs_baseline,
    }))


if __name__ == "__main__":
    main()
