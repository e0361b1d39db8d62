"""Attribute shipped-scale cINN inverse time: MCF row scans vs NICE vs rest.

The round-3 honest phase split put the 1054M cINN inverse at 62.5 ms/step
(B=40), 24x above its 2.6 ms HBM weight-streaming floor.  This harness times
the SAME inverse with components selectively stubbed (class-level
monkeypatches — numerics change, timing structure doesn't):

  full          the real inverse (baseline)
  mcf_parallel  MaskedConvFlow.inverse replaced by its FLOP-equivalent
                parallel net (shifted conv over the full image, no row loop)
                -> lower bound if the row recurrence were free
  mcf_identity  MaskedConvFlow.inverse -> identity: NICE + priors + perms only
  nice_identity NICE2d.inverse -> identity: MCF + rest only

Each variant: K steps in ONE lax.scan window closed by jax.device_get
(bench.py measurement design), median of R rounds.

Usage: python tools/profile_inverse.py [--iters 20] [--rounds 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--variants", type=str,
                    default="full,portable,mcf_identity,mcf_parallel")
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    from ipoke_tpu.core.runtime import setup_compilation_cache

    setup_compilation_cache()

    import jax
    import jax.numpy as jnp

    if args.small:
        os.environ["IPOKE_BENCH_SMALL"] = "1"
    import bench

    B, S = (8, 64) if args.small else (40, 128)
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

    X = batch["images"]
    s = model.min_spatial_size
    z_shape = model.flow.output_shape((s, s, model.flow_in_channels))

    @jax.jit
    def _cond(params, frozen, batch, rng):
        return model.embed_conditioning(frozen, batch, params)

    cond = _cond(*args_dev)
    jax.device_get(jnp.mean(cond))

    def make_inverse_window():
        # a FRESH function object per variant: jax.jit caches traces on the
        # function identity, so reusing one closure across variants would
        # silently reuse the first variant's trace and the monkeypatches
        # would never be seen (observed: identical outputs + 0s compiles)
        def inverse_window(params, frozen, batch, rng):
            def step(carry, _):
                carry, sub = jax.random.split(carry)
                z = jax.random.normal(sub, (X.shape[0], *z_shape), X.dtype)
                motion = model.flow.inverse(params["flow"], z, cond)
                return carry, jnp.mean(motion)
            _, outs = jax.lax.scan(step, rng, None, length=args.iters)
            return outs
        return inverse_window

    from ipoke_tpu import ops
    from ipoke_tpu.flows import macow as M

    def mcf_parallel_inverse(self, params, y, h=None):
        # FLOP-equivalent, loop-free: the forward conditioning net over the
        # full image + the backward transform (NOT a correct inverse)
        raw = self._net(params, y, h)
        return self._tr.bwd(y, self._tr.calc(raw))

    # all stub variants force the portable (non-fused) unit path so the
    # class-level MCF/NICE monkeypatches actually take effect
    patches = {
        "full": {},        # honors the fused-unit gate (env/default)
        "portable": {(ops, "_FORCE_VALUE"): False},
        "mcf_parallel": {(M.MaskedConvFlow, "inverse"): mcf_parallel_inverse,
                         (ops, "_FORCE_VALUE"): False},
        "mcf_identity": {
            (M.MaskedConvFlow, "inverse"): lambda self, p, y, h=None: y,
            (ops, "_FORCE_VALUE"): False},
        "nice_identity": {
            (M.NICE2d, "inverse"): lambda self, p, y, h=None: y,
            (ops, "_FORCE_VALUE"): False},
    }

    results = {}
    for name in args.variants.split(","):
        saved = []
        for (cls, attr), fn in patches[name].items():
            if attr == "_FORCE_VALUE":  # ops fused-unit force flag
                saved.append((cls, "_FORCE", cls._FORCE))
                cls._FORCE = fn
                continue
            saved.append((cls, attr, getattr(cls, attr)))
            setattr(cls, attr, fn)
        try:
            fn_jit = jax.jit(make_inverse_window())
            t0 = time.perf_counter()
            warm = jax.device_get(fn_jit(*args_dev))  # compile + warm
            # the first output element fingerprints the program: a stubbed
            # variant MUST change it, or the patch never took effect
            print(f"{name}: compile+warm {time.perf_counter() - t0:.0f}s "
                  f"out[0]={float(warm[0]):.6f}",
                  file=sys.stderr, flush=True)
            times = []
            for r in range(args.rounds):
                key = jax.device_put(jax.random.PRNGKey(100 + r), dev)
                t0 = time.perf_counter()
                jax.device_get(fn_jit(args_dev[0], args_dev[1], args_dev[2],
                                      key))
                times.append((time.perf_counter() - t0) / args.iters * 1e3)
            times.sort()
            med = times[len(times) // 2]
            results[name] = med
            print(f"{name}: {med:.2f} ms/step "
                  f"[{times[0]:.2f}, {times[-1]:.2f}]", flush=True)
        finally:
            for cls, attr, orig in saved:
                setattr(cls, attr, orig)

    if "portable" in results and "mcf_identity" in results:
        print(f"=> MCF row-scan share (portable): "
              f"{results['portable'] - results['mcf_identity']:.2f} ms",
              flush=True)
    if "portable" in results and "mcf_parallel" in results:
        print(f"=> row-recurrence overhead vs parallel-FLOP bound: "
              f"{results['portable'] - results['mcf_parallel']:.2f} ms",
              flush=True)
    if "portable" in results and "full" in results:
        print(f"=> fused-unit kernel win: "
              f"{results['portable'] - results['full']:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
