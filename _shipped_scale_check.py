"""Shipped-config-scale cINN on the real TPU: build, train step, sample."""
import time
import jax, jax.numpy as jnp
import optax
from ipoke_tpu.flows import build_macow_transformer, flow_loss, count_params
from ipoke_tpu.core.optim import flow_adam, zero_buffer_grads

# config/second_stage.yaml shipped architecture (64px variant: h=64+64)
arch = {
    "flow_in_channels": 32, "flow_mid_channels_factor": 64,
    "h_channels": 128, "factor": 16,
    "num_steps": [10, 5, 5, 4, 4, 4, 3, 3, 3, 2, 2, 2, 1, 1, 1],
    "kernel_size": [2, 3], "transform": "affine",
    "prior_transform": "affine", "activation": "elu",
}
flow = build_macow_transformer(arch)
K = jax.random.PRNGKey
B = 40  # shipped batch size (128px config)
x = jax.random.normal(K(1), (B, 8, 8, 32))
h = jax.random.normal(K(2), (B, 8, 8, 128))
t0 = time.time()
params = jax.jit(lambda k: flow.init(k, (1, 8, 8, 32)))(K(0))
jax.block_until_ready(params)
print(f"init (jitted): {time.time()-t0:.1f}s, params={count_params(params)/1e6:.1f}M", flush=True)

tx = flow_adam(1e-3, params=params)
opt = tx.init(params)

@jax.jit
def train_step(params, opt, x, h, rng):
    def loss_fn(p):
        z, ld = flow.forward(p, x, h)
        loss, _ = flow_loss(z, ld, rng=rng)
        return loss
    loss, grads = jax.value_and_grad(loss_fn, allow_int=True)(params)
    grads = zero_buffer_grads(grads, params)
    upd, opt2 = tx.update(grads, opt, params)
    return optax.apply_updates(params, upd), opt2, loss

t0 = time.time()
params, opt, loss = train_step(params, opt, x, h, K(3))
loss.block_until_ready()
print(f"train step compile+run: {time.time()-t0:.1f}s loss={float(loss):.1f}", flush=True)
t0 = time.time()
for i in range(10):
    params, opt, loss = train_step(params, opt, x, h, K(4+i))
loss.block_until_ready()
dt = (time.time()-t0)/10
print(f"train step steady: {dt*1e3:.1f}ms -> {B/dt:.1f} samples/s")

inv = jax.jit(flow.inverse)
t0 = time.time(); xr = inv(params, x, h); xr.block_until_ready()
print(f"inverse compile+run: {time.time()-t0:.1f}s")
t0 = time.time()
for _ in range(10): xr = inv(params, x, h)
xr.block_until_ready()
dt = (time.time()-t0)/10
print(f"inverse steady: {dt*1e3:.1f}ms -> {B/dt:.1f} samples/s")
print("finite:", bool(jnp.all(jnp.isfinite(xr))))
