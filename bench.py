"""Headline benchmark: poke-conditioned video synthesis throughput.

Measures clips/sec/chip for the flagship pipeline — z ~ N(0, I) -> cINN
inverse -> first-stage ConvGRU+SPADE decode — at 64px, 10 predicted frames
(the reference's operational workload, BASELINE.md), on the default device.
``vs_baseline`` = device rate / single-thread-ish CPU rate of the SAME
program (the north star is ">=10x CPU reference clips/sec/chip on v5e").

Prints exactly ONE JSON line on stdout.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def _rate(fn, args, iters, warmup=1):
    for _ in range(warmup):
        fn(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    out.block_until_ready()
    return iters / (time.perf_counter() - t0)


def main():
    import __graft_entry__ as ge
    from ipoke_tpu.core.runtime import setup_compilation_cache

    setup_compilation_cache()

    B, T = 8, 10
    model, params, frozen, batch = ge._build(
        spatial=64, min_spatial=8, T=T, z_dim=32,
        enc_ch=(32, 64, 128, 128), dec_ch=(128, 128, 64, 32), nf_cond=32,
        num_steps=(2, 2, 1), mid_factor=8, batch_size=B,
    )

    def sample(params, frozen, batch, rng):
        return model.forward_sample(params, frozen, batch, rng, length=T)

    args = (params, frozen, batch, jax.random.PRNGKey(0))

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    fn_dev = jax.jit(sample)
    rate_dev = _rate(fn_dev, args, iters=10) * B  # clips/sec

    # CPU reference: same program, host CPU backend
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            args_cpu = jax.device_put(args, cpu)
            fn_cpu = jax.jit(sample)
            rate_cpu = _rate(fn_cpu, args_cpu, iters=2) * B
    except Exception as e:  # pragma: no cover
        print(f"cpu baseline failed: {e}", file=sys.stderr)
        rate_cpu = float("nan")

    result = {
        "metric": "clips_per_sec_per_chip_64px_10f_synthesis",
        "value": round(rate_dev, 3),
        "unit": "clips/s",
        "vs_baseline": round(rate_dev / rate_cpu, 2) if rate_cpu == rate_cpu
        else None,
    }
    print(f"device rate: {rate_dev:.2f} clips/s, cpu rate: {rate_cpu:.2f}",
          file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
