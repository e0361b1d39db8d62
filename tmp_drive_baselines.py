"""One-off TPU drive: baseline models' batched eval decode (round-3 diff)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ipoke_tpu.core.runtime import setup_compilation_cache

setup_compilation_cache()

import jax

if os.environ.get("IPOKE_DRIVE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from ipoke_tpu.core.config import Config
from ipoke_tpu.data.synthetic import make_batch
from ipoke_tpu.models.fc_baseline import FCBaselineModel
from ipoke_tpu.models.first_stage import build_first_stage
from ipoke_tpu.models.poke_vae import PokeVAEModel, RNNMotionModel

dev = jax.devices()[0]
print("device:", dev, flush=True)
cpu = jax.devices("cpu")[0]
K = jax.random.PRNGKey

VAE_CFG = Config({
    "data": {"spatial_size": (32, 32), "max_frames": 3, "batch_size": 2},
    "architecture": {
        "baseline": True, "z_dim": 8, "ENC_M_channels": [16, 16, 32, 32],
        "dec_channels": [32, 32, 16, 16], "n_gru_layers": 2,
        "min_spatial_size": 4, "stack_motion_and_poke": False,
    },
    "training": {"lr": 1e-4, "full_sequence": True},
    "d_t": {"use": False}, "d_s": {"use": False},
})
FC_CFG = Config({
    "data": {"spatial_size": (32, 32), "max_frames": 3, "batch_size": 2},
    "architecture": {
        "fc_baseline": True, "z_dim": 16, "ENC_M_channels": [16, 16, 32, 32],
        "dec_channels": [32, 32, 16, 16], "n_gru_layers": 2,
        "CN_content": "spade",
    },
    "training": {"lr": 1e-4, "full_sequence": True},
    "d_t": {"use": False}, "d_s": {"use": False},
})

rng = np.random.default_rng(0)
batch = {k: jnp.asarray(v) for k, v in make_batch(
    rng, batch_size=2, n_frames=3, spatial_size=32).items()}
X, poke = batch["images"], batch["poke"]

# FC baseline
m, *_ = build_first_stage(FC_CFG)
with jax.default_device(cpu):
    v = m.init({"params": K(0)}, X, rng=K(1), train=False)
v = jax.device_put(v, dev)
motion = jax.random.normal(K(2), (2, 16))
f = jax.jit(lambda v, mo, s: m.apply(v, mo, s, 3, False,
                                     method=FCBaselineModel.decode))
out = jax.device_get(f(v, motion, X[:, 0]))
print("fc_baseline decode", out.shape, "finite:",
      bool(np.all(np.isfinite(out))))

# PokeVAE
m2, *_ = build_first_stage(VAE_CFG)
with jax.default_device(cpu):
    v2 = m2.init({"params": K(3)}, X, rng=K(4), poke=poke)
v2 = jax.device_put(v2, dev)
mo2 = jax.random.normal(K(5), (2, 4, 4, 8))
f2 = jax.jit(lambda v, mo, s, p: m2.apply(v, mo, s, 3, False, p,
                                          method=PokeVAEModel.decode))
out2 = jax.device_get(f2(v2, mo2, X[:, 0], poke))
print("poke_vae decode", out2.shape, "finite:",
      bool(np.all(np.isfinite(out2))))

# RNNMotion
m3 = RNNMotionModel(spatial_size=32, z_dim=8,
                    enc_channels=(16, 16, 32, 32),
                    dec_channels=(32, 32, 16, 16), n_gru_layers=2,
                    min_spatial_size=4, max_frames=3)
with jax.default_device(cpu):
    v3 = m3.init({"params": K(6)}, X, rng=K(7))
v3 = jax.device_put(v3, dev)
mo3 = jax.random.normal(K(8), (2, 4, 4, 8))
f3 = jax.jit(lambda v, mo, s: m3.apply(v, mo, s, 3, False,
                                       method=RNNMotionModel.decode))
out3 = jax.device_get(f3(v3, mo3, X[:, 0]))
print("rnn_motion decode", out3.shape, "finite:",
      bool(np.all(np.isfinite(out3))))

# flows: density + sampling roundtrip through the tap-packed NICE out conv
from ipoke_tpu.flows import build_macow_transformer

arch = {"flow_in_channels": 16, "h_channels": 8,
        "flow_mid_channels_factor": 8, "kernel_size": [2, 3],
        "num_steps": [2, 2, 1], "factor": 4, "activation": "elu",
        "transform": "affine", "condition_nice": False}
flow = build_macow_transformer(arch)
x = jax.random.normal(K(20), (2, 8, 8, 16))
h = jax.random.normal(K(21), (2, 8, 8, 8))
with jax.default_device(cpu):
    fp = flow.init(K(22), x.shape)
fp = jax.device_put(fp, dev)
y, ld = jax.jit(flow.forward)(fp, x, h)
x_rec = jax.jit(flow.inverse)(fp, y, h)
err = float(jnp.max(jnp.abs(x - x_rec)))
print(f"flow roundtrip max err {err:.2e}, logdet finite:",
      bool(np.all(np.isfinite(np.asarray(ld)))))
assert err < 1e-3
print("DRIVE OK")
