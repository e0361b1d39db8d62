"""Honest first-stage VAE-GAN train-step measurement at the REFERENCE
workload (64px, B=20, 10+1 frames; ref config/first_stage.yaml:8-50,
experiments/first_stage_video.py training loop).

The round-1 numbers in PERFORMANCE.md (108 ms fp32 / 94 ms bf16) were
block-timed — on this remote backend `block_until_ready` can return at
enqueue, so only their RATIO was trustworthy.  This tool re-measures with
the round-3 design: K steps chained through their full GANTrainState
feedback inside ONE `lax.scan` window closed by `jax.device_get` of the
final losses, fresh device-resident PRNGKey per round, median of R rounds.

Usage: python tools/measure_first_stage_step.py [--mixed] [--steps 5]
           [--rounds 3] [--small]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--mixed", action="store_true",
                    help="training.mixed_prec: bf16 module dtype (the r1 "
                         "winner; re-measured honestly here)")
    ap.add_argument("--spatial", type=int, default=None, choices=(64, 128),
                    help="128: the 128px reference variant (append 256 to "
                         "ENC_M_channels, prepend 256 to dec_channels — the "
                         "yaml's own width comments)")
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    from ipoke_tpu.core.runtime import setup_compilation_cache

    setup_compilation_cache()

    import jax

    if os.environ.get("IPOKE_DRIVE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from ipoke_tpu.core.config import load_config
    from ipoke_tpu.core.optim import gan_adam
    from ipoke_tpu.data.synthetic import make_batch
    from ipoke_tpu.models.first_stage import (
        build_first_stage,
        create_first_stage_state,
        make_first_stage_train_step,
    )
    from ipoke_tpu.nn.vgg import init_vgg_params

    cfg = load_config(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "config", "first_stage.yaml"))
    if args.mixed:
        cfg["training"]["mixed_prec"] = True
    if args.spatial == 128:
        cfg["data"]["spatial_size"] = [128, 128]
        cfg["architecture"]["ENC_M_channels"] = (
            list(cfg["architecture"]["ENC_M_channels"]) + [256])
        cfg["architecture"]["dec_channels"] = (
            [256] + list(cfg["architecture"]["dec_channels"]))
    if args.small:
        cfg["data"]["batch_size"] = 4
        cfg["architecture"]["ENC_M_channels"] = [32, 64, 64, 64]
        cfg["architecture"]["dec_channels"] = [64, 64, 64, 32]
        cfg["data"]["spatial_size"] = [32, 32]
        cfg["data"]["max_frames"] = 3
        cfg["architecture"]["min_spatial_size"] = 4

    B = cfg["data"]["batch_size"]
    T = cfg["data"]["max_frames"]
    S = cfg["data"]["spatial_size"][0]

    cpu = jax.devices("cpu")[0]
    t0 = time.perf_counter()
    with jax.default_device(cpu):
        model, disc_s, disc_t = build_first_stage(cfg)
        tx = gan_adam(float(cfg["training"]["lr"]),
                      float(cfg["training"]["weight_decay"]))
        state = create_first_stage_state(
            jax.random.PRNGKey(0), cfg, model, disc_s, disc_t, tx, tx, tx)
        vgg_params = init_vgg_params(0)
        batch_np = make_batch(np.random.default_rng(0), batch_size=B,
                              n_frames=T, spatial_size=S)
        batch = {"images": jnp.asarray(batch_np["images"]),
                 "poke": jnp.asarray(batch_np["poke"])}
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params_g))
    print(f"init on cpu: {time.perf_counter() - t0:.0f}s, "
          f"gen params {n_params / 1e6:.1f}M, B={B} T={T} S={S} "
          f"mixed={args.mixed}", flush=True)

    step = make_first_stage_train_step(
        cfg, model, disc_s, disc_t, vgg_params, tx, tx, tx)

    def k_steps(state, batch, rng):
        def body(carry, _):
            st, r = carry
            r, sub = jax.random.split(r)
            st, metrics = step(st, batch, sub, 1.0)
            return (st, r), (metrics["loss"], metrics["loss_d_dt"])

        (state, _), (gl, dl) = jax.lax.scan(
            body, (state, rng), None, length=args.steps)
        return state, gl, dl

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    t0 = time.perf_counter()
    state, batch, vgg_params = jax.device_put((state, batch, vgg_params), dev)
    jax.device_get(jax.tree_util.tree_leaves(state.params_g)[0])
    print(f"transfer: {time.perf_counter() - t0:.0f}s", flush=True)

    fn = jax.jit(k_steps, donate_argnums=(0,))
    for w in range(3):
        t0 = time.perf_counter()
        state, gl, dl = fn(state, batch, jax.random.PRNGKey(w))
        print(f"warm {w}: {time.perf_counter() - t0:.0f}s "
              f"g={float(jax.device_get(gl)[-1]):.3f} "
              f"dt={float(jax.device_get(dl)[-1]):.3f}", flush=True)
    times = []
    for r in range(args.rounds):
        key = jax.device_put(jax.random.PRNGKey(100 + r), dev)
        t0 = time.perf_counter()
        state, gl, dl = fn(state, batch, key)
        jax.device_get(gl)
        times.append((time.perf_counter() - t0) / args.steps * 1e3)
        print(f"round {r}: {times[-1]:.1f} ms/step "
              f"({B / times[-1] * 1e3:.1f} clips/s)", flush=True)
    times.sort()
    med = times[len(times) // 2]
    print(f"median: {med:.1f} ms/step, {B / med * 1e3:.1f} clips/s "
          f"[{times[0]:.1f}, {times[-1]:.1f}]", flush=True)


if __name__ == "__main__":
    main()
