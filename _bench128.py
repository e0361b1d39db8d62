"""128px 10-frame synthesis throughput (reference's larger workload)."""
import time
import jax
from ipoke_tpu.core.runtime import setup_compilation_cache
import __graft_entry__ as ge

setup_compilation_cache()
B, T = 8, 10
model, params, frozen, batch = ge._build(
    spatial=128, min_spatial=8, T=T, z_dim=32,
    enc_ch=(64, 128, 256, 256, 256), dec_ch=(256, 256, 256, 128, 64),
    nf_cond=64, num_steps=(2, 2, 1), mid_factor=8, batch_size=B)
fn = jax.jit(lambda p, f, b, r: model.forward_sample(p, f, b, r, length=T))
args = (params, frozen, batch, jax.random.PRNGKey(0))
t0 = time.time(); out = fn(*args); out.block_until_ready()
print(f"compile+run {time.time()-t0:.0f}s", flush=True)
t0 = time.time()
for _ in range(10): out = fn(*args)
out.block_until_ready()
dt = (time.time()-t0)/10
print(f"128px sampling: {dt*1e3:.1f}ms/batch -> {B/dt:.1f} clips/s", flush=True)
