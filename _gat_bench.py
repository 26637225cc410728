import time, numpy as np, jax, jax.numpy as jnp, optax
from efficient_gnns_tpu.graphs.preprocess import build_graph
from efficient_gnns_tpu.models import GATTeacher
from efficient_gnns_tpu.ops import dispatch
dispatch.set_backend("auto", message_dtype=jnp.bfloat16)

N, E, F, C = 169_343, 1_166_243, 128, 40
rng = np.random.default_rng(0)
s = rng.integers(0, N, size=E); r = rng.integers(0, N, size=E)
t0 = time.time()
graph = build_graph(s, r, N, bidirected=True, self_loops=True, block=True)
print(f"graph {time.time()-t0:.1f}s")
x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
y = jnp.asarray(rng.integers(0, C, size=N).astype(np.int32))

model = GATTeacher(hidden=250, out_feats=C, num_layers=3, num_heads=3, use_symmetric_norm=True)
variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, graph, x)
params, rest = variables["params"], {k: v for k, v in variables.items() if k != "params"}
tx = optax.rmsprop(2e-3)
opt_state = tx.init(params)

@jax.jit
def step(params, rest, opt_state, key):
    def loss_fn(p):
        (logits, _), updates = model.apply(
            {"params": p, **rest}, graph, x, training=True,
            rngs={"dropout": key}, mutable=list(rest.keys()))
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=-1)), updates
    (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    upd, opt_state = tx.update(grads, opt_state)
    return optax.apply_updates(params, upd), updates, opt_state, loss

key = jax.random.PRNGKey(2)
t0 = time.time(); out = step(params, rest, opt_state, key); jax.block_until_ready(out[3])
print(f"compile+first {time.time()-t0:.1f}s")
t0 = time.time()
for _ in range(10):
    params, rest, opt_state, loss = step(params, rest, opt_state, key)
jax.block_until_ready(loss)
print(f"GAT teacher train step: {(time.time()-t0)/10*1e3:.1f} ms  loss {float(loss):.3f}")

# fwd only (eval path)
fwd = jax.jit(lambda p: model.apply({"params": p, **rest}, graph, x, training=False)[0])
o = fwd(params); jax.block_until_ready(o)
t0 = time.time()
for _ in range(10): o = fwd(params)
jax.block_until_ready(o)
print(f"GAT teacher fwd (eval): {(time.time()-t0)/10*1e3:.1f} ms")
