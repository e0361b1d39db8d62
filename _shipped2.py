"""Shipped-scale (1.05B-param) cINN on one v5e: CPU init + cached compiles."""
import time
import jax, jax.numpy as jnp
import optax
from ipoke_tpu.core.runtime import setup_compilation_cache, init_on_cpu
from ipoke_tpu.core.optim import flow_adam, zero_buffer_grads
from ipoke_tpu.flows import build_macow_transformer, flow_loss, count_params

setup_compilation_cache()
arch = {"flow_in_channels": 32, "flow_mid_channels_factor": 64,
        "h_channels": 128, "factor": 16,
        "num_steps": [10, 5, 5, 4, 4, 4, 3, 3, 3, 2, 2, 2, 1, 1, 1],
        "kernel_size": [2, 3]}
flow = build_macow_transformer(arch)
K = jax.random.PRNGKey
B = 40
t0 = time.time()
params = init_on_cpu(lambda: flow.init(K(0), (1, 8, 8, 32)))
print(f"init-on-cpu+transfer: {time.time()-t0:.1f}s params={count_params(params)/1e6:.0f}M", flush=True)

tx = flow_adam(1e-3, params=params, use_adafactor=True)
t0 = time.time()
opt = init_on_cpu(lambda: tx.init(params))  # adam states also big
print(f"opt init: {time.time()-t0:.1f}s", flush=True)

x = jax.random.normal(K(1), (B, 8, 8, 32))
h = jax.random.normal(K(2), (B, 8, 8, 128))

from functools import partial
@partial(jax.jit, donate_argnums=(0, 1))
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
print(f"train step compile+run: {time.time()-t0:.1f}s loss={float(loss):.0f}", flush=True)
t0 = time.time()
for i in range(10):
    params, opt, loss = train_step(params, opt, x, h, K(4+i))
loss.block_until_ready()
dt = (time.time()-t0)/10
print(f"train steady: {dt*1e3:.0f}ms -> {B/dt:.1f} samples/s", flush=True)

inv = jax.jit(flow.inverse)
t0 = time.time(); xr = inv(params, x, h); xr.block_until_ready()
print(f"inverse compile+run: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
for _ in range(5): xr = inv(params, x, h)
xr.block_until_ready()
print(f"inverse steady: {(time.time()-t0)/5*1e3:.0f}ms finite={bool(jnp.all(jnp.isfinite(xr)))}", flush=True)
