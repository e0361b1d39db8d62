"""Full shipped-scale sampling: 1054M-param cINN inverse + 128px SPADE decode."""
import time
import jax, jax.numpy as jnp
import numpy as np
from ipoke_tpu.core.runtime import setup_compilation_cache, init_on_cpu
from ipoke_tpu.core.config import Config
from ipoke_tpu.data.synthetic import make_batch
from ipoke_tpu.flows import build_macow_transformer
from ipoke_tpu.models.first_stage import build_first_stage
from ipoke_tpu.models.second_stage import FrozenBundle, SecondStageModel
from ipoke_tpu.nn.encoders import FirstStageWrapper

setup_compilation_cache()
K = jax.random.PRNGKey
B, T, S = 40, 10, 128

fs_cfg = Config({
    "data": {"spatial_size": (S, S), "max_frames": T},
    "architecture": {"z_dim": 32, "ENC_M_channels": [64, 128, 256, 256, 256],
                     "dec_channels": [256, 256, 256, 128, 64],
                     "n_gru_layers": 4, "min_spatial_size": 8,
                     "norm": "group", "spectral_norm": True,
                     "motion_bias": True},
    "training": {"full_sequence": True}, "d_t": {}, "d_s": {}})
ss_cfg = Config({
    "data": {"spatial_size": (S, S), "max_frames": T},
    "architecture": {"flow_mid_channels_factor": 64, "factor": 16,
                     "num_steps": [10, 5, 5, 4, 4, 4, 3, 3, 3, 2, 2, 2, 1, 1, 1],
                     "kernel_size": [2, 3], "transform": "affine",
                     "prior_transform": "affine", "activation": "elu",
                     "augmented_input": False},
    "training": {}, "poke_embedder": {}})

fs_model, *_ = build_first_stage(fs_cfg)
cond = FirstStageWrapper(spatial_size=S, nf_in=3, nf_max=64, deterministic=True)
poke = FirstStageWrapper(spatial_size=S, nf_in=2, nf_max=64, deterministic=True)
model = SecondStageModel(ss_cfg, fs_model, cond, poke)

t0 = time.time()
def init_all():
    X = jnp.zeros((1, T + 1, S, S, 3))
    fs_vars = fs_model.init({"params": K(0)}, X, rng=K(1), train=False)
    cond_vars = cond.init({"params": K(2)}, jnp.zeros((1, S, S, 3)), train=False)
    poke_vars = poke.init({"params": K(3)}, jnp.zeros((1, S, S, 2)), train=False)
    frozen = {
        "fs": FrozenBundle(fs_vars["params"], fs_vars.get("batch_stats", {})),
        "cond": FrozenBundle(cond_vars["params"], cond_vars.get("batch_stats", {})),
        "poke": FrozenBundle(poke_vars["params"], poke_vars.get("batch_stats", {})),
    }
    return frozen, model.init(K(4))
frozen, params = init_on_cpu(init_all)
print(f"init {time.time()-t0:.0f}s", flush=True)

batch_np = make_batch(np.random.default_rng(0), batch_size=B, n_frames=T, spatial_size=S)
batch = {k: jnp.asarray(v) for k, v in batch_np.items() if k in ("images", "poke", "flow")}

fn = jax.jit(lambda p, f, b, r: model.forward_sample(p, f, b, r, length=T))
t0 = time.time(); out = fn(params, frozen, batch, K(5)); out.block_until_ready()
print(f"compile+run {time.time()-t0:.0f}s", flush=True)
t0 = time.time()
for i in range(10): out = fn(params, frozen, batch, K(6+i))
out.block_until_ready()
dt = (time.time()-t0)/10
print(f"FULL-scale 128px sampling: {dt*1e3:.0f}ms/batch(B={B}) -> {B/dt:.1f} clips/s", flush=True)
