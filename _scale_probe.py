import time, sys
import jax, jax.numpy as jnp
from ipoke_tpu.flows import build_macow_transformer, count_params

def probe(num_steps, mid_factor, B=8):
    arch = {"flow_in_channels": 32, "flow_mid_channels_factor": mid_factor,
            "h_channels": 128, "factor": 16, "num_steps": num_steps,
            "kernel_size": [2, 3]}
    flow = build_macow_transformer(arch)
    K = jax.random.PRNGKey
    t0 = time.time()
    init_fn = jax.jit(lambda k: flow.init(k, (1, 8, 8, 32)))
    lowered = init_fn.lower(K(0))
    print(f"steps={sum(num_steps)} mid={mid_factor}: trace {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    compiled = lowered.compile()
    print(f"  init compile {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    params = compiled(K(0)); jax.block_until_ready(params)
    print(f"  init run {time.time()-t0:.1f}s params={count_params(params)/1e6:.0f}M", flush=True)
    x = jax.random.normal(K(1), (B, 8, 8, 32))
    h = jax.random.normal(K(2), (B, 8, 8, 128))
    t0 = time.time()
    fwd = jax.jit(flow.forward)
    lf = fwd.lower(params, x, h)
    print(f"  fwd trace {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    cf = lf.compile()
    print(f"  fwd compile {time.time()-t0:.1f}s", flush=True)
    t0 = time.time(); z, ld = cf(params, x, h); z.block_until_ready()
    print(f"  fwd run {time.time()-t0:.2f}s", flush=True)
    t0 = time.time()
    for _ in range(5): z, ld = cf(params, x, h)
    z.block_until_ready()
    print(f"  fwd steady {(time.time()-t0)/5*1e3:.1f}ms", flush=True)

probe([4, 2], 16)
probe([10, 5, 5, 4, 4, 4, 3, 3, 3, 2, 2, 2, 1, 1, 1], 16)
probe([10, 5, 5, 4, 4, 4, 3, 3, 3, 2, 2, 2, 1, 1, 1], 64)
