"""Train the egress-free MotionFeatureNet (default FVD backbone) on
synthetic motion clips and save committed weights.

Pretext tasks (no labels beyond the synthetic generator's own ground truth):

1. motion regression — per-clip (mean dx, mean dy, mean |flow|, moving-area
   fraction) from ``data.synthetic.make_batch``'s exact flow maps;
2. temporal-order discrimination — clips vs their frame-shuffled versions
   (a Frechet gate must react to temporal incoherence, which is exactly the
   failure mode of a bad video model);
3. instance spread — a light uniformity term that keeps features from
   collapsing so Frechet moments stay well-conditioned.

Runs on the host CPU in a few minutes (the net is ~300k params).

Usage: python tools/train_motion_feat.py [--steps 1500] [--out PATH]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="tpu", choices=["tpu", "cpu"],
                    help="tpu: host only generates data (a full CPU run is "
                    "~19 s/step on this 1-CPU host vs <1 s/step on the "
                    "chip); cpu: fully host-side (CI)")
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--spatial", type=int, default=64)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(__file__), "..", "ipoke_tpu",
                             "eval", "weights", "motion_feat_v1.npz"))
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ipoke_tpu.core.runtime import setup_compilation_cache
    from ipoke_tpu.data.synthetic import make_batch
    from ipoke_tpu.nn.motion_feat import (
        MotionFeatureNet,
        init_motion_feat,
        motion_targets,
        save_motion_feat,
    )

    setup_compilation_cache()
    print(f"platform: {jax.devices()[0]}", flush=True)

    model = MotionFeatureNet()
    params = init_motion_feat(jax.random.PRNGKey(args.seed), args.frames,
                              args.spatial)
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"motion feature net: {n / 1e3:.0f}k params")
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, vids, vids_shuf, targets):
        def loss_fn(p):
            v = jnp.concatenate([vids, vids_shuf])
            feat, motion, order = model.apply(p, v, return_heads=True)
            B = vids.shape[0]
            reg = jnp.mean((motion[:B] - targets) ** 2)
            labels = jnp.concatenate(
                [jnp.ones((B,)), jnp.zeros((B,))])
            order_loss = jnp.mean(
                optax.sigmoid_binary_cross_entropy(order, labels))
            fn_ = feat / (jnp.linalg.norm(feat, axis=-1, keepdims=True)
                          + 1e-6)
            uniform = jnp.mean(fn_ @ fn_.T) - 1.0 / feat.shape[0]
            acc = jnp.mean(((order > 0) == (labels > 0.5)).astype(
                jnp.float32))
            return reg + order_loss + 0.1 * uniform, (reg, order_loss, acc)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, loss, aux

    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    for it in range(args.steps):
        b = make_batch(rng, batch_size=args.batch, n_frames=args.frames,
                       spatial_size=args.spatial,
                       n_pokes=int(rng.integers(1, 4)))
        vids = jnp.asarray(b["images"][:, 1:])
        perm = rng.permuted(
            np.tile(np.arange(args.frames), (args.batch, 1)), axis=1)
        vids_shuf = jnp.asarray(
            np.take_along_axis(np.asarray(b["images"][:, 1:]),
                               perm[:, :, None, None, None], axis=1))
        targets = jnp.asarray(motion_targets(b["flow"]))
        params, opt, loss, (reg, ol, acc) = step(params, opt, vids,
                                                 vids_shuf, targets)
        if it % 100 == 0 or it == args.steps - 1:
            print(f"step {it}: loss {float(loss):.4f} reg {float(reg):.4f} "
                  f"order {float(ol):.4f} order-acc {float(acc):.2f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    out = os.path.abspath(args.out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    save_motion_feat(params, out)
    print(f"saved {out} ({os.path.getsize(out) / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
