import time, sys, numpy as np, jax, jax.numpy as jnp
from efficient_gnns_tpu.data import synthetic_node_dataset
from efficient_gnns_tpu.ops.pallas import blocked_segment_sum
from efficient_gnns_tpu.ops.segment import gather

ds = synthetic_node_dataset(num_nodes=169_343, num_edges=1_166_243, feat_dim=128, seed=0, label_smoothing_hops=0)
g = ds.graph
blk = g.blocking
N, F = 169_343, 128
x32 = jnp.asarray(ds.x)
x16 = x32.astype(jnp.bfloat16)

def t(f, *a, iters=20):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.time()
    for _ in range(iters): o = f(*a)
    jax.block_until_ready(o)
    return (time.time()-t0)/iters*1e3

g32 = jax.jit(lambda x: gather(x, blk.src))
g16 = jax.jit(lambda x: gather(x, blk.src))
m32 = g32(x32); m16 = g16(x16)
print("gather f32 [Eblk,128]:", t(g32, x32), "ms")
print("gather bf16:", t(g16, x16), "ms")
s32 = jax.jit(lambda m: blocked_segment_sum(m, blk, N, w=blk.w_blk))
print("scatter f32 (scaled):", t(s32, m32), "ms")
s16 = jax.jit(lambda m: blocked_segment_sum(m, blk, N, w=blk.w_blk))
print("scatter bf16 (scaled):", t(s16, m16), "ms")
fused32 = jax.jit(lambda x: blocked_segment_sum(gather(x, blk.src), blk, N, w=blk.w_blk))
print("gather+scatter f32 fused jit:", t(fused32, x32), "ms")
fused16 = jax.jit(lambda x: blocked_segment_sum(gather(x.astype(jnp.bfloat16), blk.src), blk, N, w=blk.w_blk))
print("cast+gather+scatter bf16:", t(fused16, x32), "ms")
print("blk: nb", blk.num_blocks, "eb", blk.eb, "tm", blk.tm, "num_tiles", blk.num_tiles, file=sys.stderr)
