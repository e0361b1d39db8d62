import time
import jax
jax.config.update("jax_platforms","cpu")
from ipoke_tpu.flows import build_macow_transformer
arch = {"flow_in_channels": 32, "flow_mid_channels_factor": 16,
        "h_channels": 128, "factor": 16, "num_steps": [4,2], "kernel_size": [2,3]}
flow = build_macow_transformer(arch)
K = jax.random.PRNGKey
t0=time.time()
lowered = jax.jit(lambda k: flow.init(k, (1,8,8,32))).lower(K(0))
print(f"trace {time.time()-t0:.1f}s", flush=True)
