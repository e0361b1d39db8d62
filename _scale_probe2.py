import time, sys
import jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)
from ipoke_tpu.flows import build_macow_transformer, count_params
arch = {"flow_in_channels": 32, "flow_mid_channels_factor": 16,
        "h_channels": 128, "factor": 16, "num_steps": [4,2], "kernel_size": [2,3]}
flow = build_macow_transformer(arch)
K = jax.random.PRNGKey
print("lowering init...", flush=True)
t0=time.time()
lowered = jax.jit(lambda k: flow.init(k, (1,8,8,32))).lower(K(0))
print(f"trace {time.time()-t0:.1f}s", flush=True)
t0=time.time()
compiled = lowered.compile()
print(f"compile {time.time()-t0:.1f}s", flush=True)
t0=time.time()
params = compiled(K(0)); jax.block_until_ready(params)
print(f"run {time.time()-t0:.1f}s params={count_params(params)/1e6:.0f}M", flush=True)
