"""Attribute shipped-scale first-stage DECODE time: ConvGRU scan vs the
batched SPADE decoder render.

Round-3 phase split (bench.py IPOKE_BENCH_PHASES=1) puts the decode at
46.6 ms/step (B=40, T=10, 128px) after the batched-decode rewrite; its conv
FLOPs are ~10 GFLOP/frame x 400 frames ~= 4 TFLOP -> ~20 ms bf16 MXU floor,
i.e. ~44% efficiency.  This harness times the decode with its two halves
isolated (same lax.scan + jax.device_get measurement design as
tools/profile_inverse.py):

  full      decode_first_stage as shipped (GRU scan + ONE (T*B) decoder apply)
  gru_only  only the nn.scan'd ConvGRU rollout (8x8 latents, T sequential)
  gen_only  only the batched decoder render over a precomputed (T*B) hidden

Finer gen attribution (opt-in, --variants gen_only,gen_nospade,gen_noout):

  gen_nospade  decoder with every SPADE (GroupNorm + gamma/beta FMA) stubbed
               to identity — gen_only minus gen_nospade = the norm/modulation
               (VPU + HBM) share of the render
  gen_noout    decoder without the final RGB conv + tanh — isolates the
               skinny (64->3 @128px) head's cost

Usage: python tools/profile_decode.py [--iters 10] [--rounds 3] [--small]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--variants", type=str, default="full,gru_only,gen_only")
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    from ipoke_tpu.core.runtime import setup_compilation_cache

    setup_compilation_cache()

    import jax

    if os.environ.get("IPOKE_DRIVE_CPU") == "1":  # sanity runs off-TPU
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from flax import linen as nn

    if args.small:
        os.environ["IPOKE_BENCH_SMALL"] = "1"
    import bench

    B, S = (8, 64) if args.small else (40, 128)
    T = 10
    model, params_f32, frozen_f32, batch_f32 = bench._build_on_cpu(B, S)
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
    params, frozen, batch = cast(params_f32), cast(frozen_f32), cast(batch_f32)

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    args_dev = jax.device_put((params, frozen, batch, jax.random.PRNGKey(0)),
                              dev)
    jax.block_until_ready(args_dev)
    params, frozen, batch, rng0 = args_dev

    X = batch["images"]
    fs = model.first_stage
    fs_vars = {"params": frozen["fs"].params,
               "batch_stats": frozen["fs"].stats}
    z = fs.z_dim
    s = model.min_spatial_size
    motion0 = jax.random.normal(jax.random.PRNGKey(1),
                                (B, s, s, z), X.dtype)
    motion0 = jax.device_put(motion0, dev)

    def perturb(r, x):
        return x + 1e-3 * jax.random.normal(r, x.shape, x.dtype)

    def gru_rollout(mdl, motion, length):
        hidden = tuple(motion for _ in range(mdl.n_gru_layers))
        in_rnn = motion

        def gru_body(m, hidden, _):
            hidden = m.rnn(in_rnn, hidden)
            return hidden, hidden[-1]

        scan = nn.scan(gru_body, variable_broadcast=["params", "batch_stats"],
                       variable_carry=False, split_rngs={"params": False},
                       length=length)
        _, hs = scan(mdl, hidden, None)
        return hs

    bodies = {
        "full": lambda r: model.decode_first_stage(
            frozen, perturb(r, motion0), X[:, 0], T),
        "gru_only": lambda r: fs.apply(
            fs_vars, perturb(r, motion0), T, method=gru_rollout),
        "gen_only": None,  # built below (needs a precomputed flat hidden)
    }

    # precompute the (T*B) flat hidden + modulations once for gen_only
    @jax.jit
    def _gen_inputs(motion):
        hs = fs.apply(fs_vars, motion, T, method=gru_rollout)
        flat = jnp.moveaxis(hs, 0, 1).reshape(B * T, *hs.shape[2:])
        return flat

    flat0 = _gen_inputs(motion0)
    jax.device_get(jnp.mean(flat0))

    def gen_batched(mdl, flat, start_frame, length):
        del length
        mods = mdl.gen.spade_modulations(start_frame, flat.shape[1])
        # (B,)-batched mods broadcast per clip inside the fused SPADE apply
        return mdl.gen(flat, None, train=False, mods=mods)

    bodies["gen_only"] = lambda r: fs.apply(
        fs_vars, perturb(r, flat0), X[:, 0], T, method=gen_batched)

    def gen_nospade(mdl, flat, start_frame, length):
        del start_frame, length
        gen = mdl.gen
        h = gen.head(flat, False)
        for up in gen.ups:
            h = up(h, False)
        return gen.out(h, False)

    def gen_noout(mdl, flat, start_frame, length):
        del length
        gen = mdl.gen
        mods = gen.spade_modulations(start_frame, flat.shape[1])
        h = gen.head(flat, False)
        for i, (up, sp) in enumerate(zip(gen.ups, gen.spades)):
            h = up(h, False)
            h = sp(h, None, mod=mods[i])
        return h

    bodies["gen_nospade"] = lambda r: fs.apply(
        fs_vars, perturb(r, flat0), X[:, 0], T, method=gen_nospade)
    bodies["gen_noout"] = lambda r: fs.apply(
        fs_vars, perturb(r, flat0), X[:, 0], T, method=gen_noout)

    # Engagement check (r5): the r4 "fused" A/B silently measured portable
    # vs portable because kernel_supported was fp32-only while the shipped
    # decode streams bf16.  When the gate is on, assert the lowered HLO of
    # the first variant actually contains the Pallas custom call.
    from ipoke_tpu import ops as _ops

    if _ops.fused_spade_enabled() and dev.platform != "cpu":
        first = args.variants.split(",")[0]
        txt = jax.jit(lambda r: bodies[first](r)).lower(rng0).as_text()
        engaged = "tpu_custom_call" in txt or "CustomCall" in txt
        print(f"fused SPADE engaged in '{first}' HLO: {engaged}",
              file=sys.stderr, flush=True)
        if not engaged:
            raise SystemExit("IPOKE_TPU_FUSED_SPADE=1 but no Pallas custom "
                             "call in the lowered HLO — gate/shape mismatch")

    results = {}
    for name in args.variants.split(","):
        body = bodies[name]

        def window(rng, _body=body):
            def step(carry, _):
                carry, sub = jax.random.split(carry)
                out = _body(sub)
                return carry, jnp.mean(out)
            _, outs = jax.lax.scan(step, rng, None, length=args.iters)
            return outs

        fn_jit = jax.jit(window)
        t0 = time.perf_counter()
        warm = jax.device_get(fn_jit(rng0))
        print(f"{name}: compile+warm {time.perf_counter() - t0:.0f}s "
              f"out[0]={float(warm[0]):.6f}", file=sys.stderr, flush=True)
        times = []
        for r in range(args.rounds):
            key = jax.device_put(jax.random.PRNGKey(100 + r), dev)
            t0 = time.perf_counter()
            jax.device_get(fn_jit(key))
            times.append((time.perf_counter() - t0) / args.iters * 1e3)
        times.sort()
        med = times[len(times) // 2]
        results[name] = med
        print(f"{name}: {med:.2f} ms/step [{times[0]:.2f}, {times[-1]:.2f}]",
              flush=True)

    if "full" in results and "gru_only" in results and "gen_only" in results:
        print(f"=> gru + gen = {results['gru_only'] + results['gen_only']:.2f}"
              f" vs full {results['full']:.2f} "
              f"(residual {results['full'] - results['gru_only'] - results['gen_only']:.2f})",
              flush=True)


if __name__ == "__main__":
    main()
