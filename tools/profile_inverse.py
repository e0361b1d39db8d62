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
  nice_dots     NICE convs rewritten as accumulated shifted matmuls
                (identical math, fp32 accumulation) — tests whether XLA's
                conv emitter at 8x8 spatial is the NICE bottleneck
  nice_packed   the skinny NICE out conv (K=9*2048 -> N~32, ~25% MXU lane
                utilization) tap-packed into ONE (M,2048)@(2048,9*out_c)
                dot + 9 shifted adds (identical math, N~288 -> ~75% util);
                w2 as a plain dot, w1 stays an XLA conv.  This mix WON the
                r4 shipped-scale A/B (59.9 vs plainout 64.6 / im2col-default
                70.3 ms) and is the SHIPPED default since r4
                (macow.NICE2d._net_hidden; IPOKE_NICE_W1/W2 restore losers)
  nice_im2col   all-dot NICE: w1 as ONE im2col (M,9*in1)@(9*in1,hid) dot,
                w2 as a dot, out tap-packed (the r3->r4 shipped default had
                im2col w1 + conv w2; the r4 A/B showed im2col w1 LOSES
                ~6.5 ms to the XLA conv emitter at the shipped 30->2048
                shape, so the default reverted to plain-conv w1)
  nice_plainout the pre-round-3 NICE (plain conv emitters for w1 and the
                skinny out conv) — the baseline the shipped _raw replaced

Round-4 finer NICE attribution (timing-only stubs — run these to split the
coupling cost into per-stage shares):

  nice_no_w1      skip the w1 im2col dot (rank-1 hidden fill)
  nice_no_w2      skip the fat (M,2048)@(2048,2048) w2 dot
  nice_out_center out conv reduced to its center tap (gather/shifted-add tax)
  nice_noact      identity activation (elementwise ELU share)
  nice_w2_bf16acc w2 dot without fp32 accumulation (epilogue tax)

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

    if os.environ.get("IPOKE_DRIVE_CPU") == "1":  # sanity runs off-TPU
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    if args.small:
        os.environ["IPOKE_BENCH_SMALL"] = "1"
    import bench

    B, S = (8, 64) if args.small else (40, 128)
    model, params_f32, frozen_f32, batch_f32 = bench._build_on_cpu(B, S)
    # the NICE out convs are zero-init and this harness never runs DDI, so at
    # fresh init every coupling is numerically the IDENTITY — all _raw-level
    # stub variants would produce identical outputs and the out[0]
    # fingerprint check below could never catch a patch that silently failed
    # to apply (round-4 finding).  Perturb the float params so every stub is
    # numerically detectable (timing structure is unchanged).
    import numpy as np

    pr = np.random.default_rng(123)

    def perturb(path, x):
        # only the zero-init out-conv g/b leaves, with a SMALL magnitude:
        # each coupling then applies a mild non-identity transform without
        # compounding into overflow across the ~215-coupling inverse
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if "out" in keys and keys[-1] in ("g", "b") and \
                hasattr(x, "dtype") and x.dtype == jnp.float32:
            return x + 0.02 * pr.standard_normal(x.shape).astype(np.float32)
        return x

    params_f32 = jax.tree_util.tree_map_with_path(perturb, params_f32)
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

    def conv_as_dots(w, x):
        """kxk SAME conv as k*k accumulated (B*H*W, C)@(C, N) matmuls —
        identical math to conv_general_dilated, different emitter."""
        kh, kw = w.shape[0], w.shape[1]
        b, hh, ww, c = x.shape
        ph, pw = (kh - 1) // 2, (kw - 1) // 2
        xp = jnp.pad(x, ((0, 0), (ph, kh - 1 - ph), (pw, kw - 1 - pw), (0, 0)))
        acc = None
        for dy in range(kh):
            for dx in range(kw):
                xi = xp[:, dy:dy + hh, dx:dx + ww, :].reshape(b * hh * ww, c)
                o = jax.lax.dot_general(
                    xi, w[dy, dx], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = o if acc is None else acc + o
        return acc.reshape(b, hh, ww, -1).astype(x.dtype)

    from ipoke_tpu.flows.primitives import _v_norm
    from ipoke_tpu.flows.primitives import plain_conv_apply as plain_conv

    def nice_raw_dots(self, params, z, h):
        act_fn = M._act(self.activation)
        c = conv_as_dots(params["w1"], z)
        c = act_fn(c)
        c = conv_as_dots(params["w2"], c)
        if self.h_channels:
            c = jnp.concatenate([c, h], axis=-1)
        c = act_fn(c)
        out = params["out"]
        w_out = out["v"] * (out["g"] / _v_norm(out["v"]))
        return conv_as_dots(w_out, c) + out["b"]

    def conv_tap_packed(w, x):
        """kxk SAME conv via ONE (M,C)@(C, k*k*N) dot + k*k shifted adds.
        For skinny-N convs this packs the MXU lanes k*k-fold."""
        kh, kw = w.shape[0], w.shape[1]
        cin, n = w.shape[2], w.shape[3]
        b, hh, ww, _ = x.shape
        wp = jnp.transpose(w, (2, 0, 1, 3)).reshape(cin, kh * kw * n)
        u = jax.lax.dot_general(
            x.reshape(b * hh * ww, cin), wp, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(b, hh, ww, kh, kw, n)
        ph, pw = (kh - 1) // 2, (kw - 1) // 2
        up = jnp.pad(u, ((0, 0), (ph, kh - 1 - ph), (pw, kw - 1 - pw),
                         (0, 0), (0, 0), (0, 0)))
        acc = None
        for dy in range(kh):
            for dx in range(kw):
                s = up[:, dy:dy + hh, dx:dx + ww, dy, dx, :]
                acc = s if acc is None else acc + s
        return acc.astype(x.dtype)

    def nice_raw_packed(self, params, z, h):
        act_fn = M._act(self.activation)
        c = plain_conv(params["w1"], z, "SAME")
        c = act_fn(c)
        c = conv_as_dots(params["w2"], c)  # 1x1 -> one dot
        if self.h_channels:
            c = jnp.concatenate([c, h], axis=-1)
        c = act_fn(c)
        out = params["out"]
        w_out = out["v"] * (out["g"] / _v_norm(out["v"]))
        return conv_tap_packed(w_out, c) + out["b"]

    def conv_im2col(w, x):
        """kxk SAME conv as ONE (M, k*k*C)@(k*k*C, N) dot over gathered
        patches — maximizes the contraction dim for fat-N convs (w1)."""
        kh, kw = w.shape[0], w.shape[1]
        b, hh, ww, c = x.shape
        ph, pw = (kh - 1) // 2, (kw - 1) // 2
        xp = jnp.pad(x, ((0, 0), (ph, kh - 1 - ph), (pw, kw - 1 - pw), (0, 0)))
        cols = jnp.concatenate(
            [xp[:, dy:dy + hh, dx:dx + ww, :]
             for dy in range(kh) for dx in range(kw)], axis=-1)
        o = jax.lax.dot_general(
            cols.reshape(b * hh * ww, kh * kw * c),
            w.reshape(kh * kw * c, w.shape[3]),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return o.reshape(b, hh, ww, -1).astype(x.dtype)

    def nice_raw_im2col(self, params, z, h):
        # w1 im2col + w2 dot + packed out: the all-dot NICE candidate
        act_fn = M._act(self.activation)
        c = conv_im2col(params["w1"], z)
        c = act_fn(c)
        c = conv_as_dots(params["w2"], c)
        if self.h_channels:
            c = jnp.concatenate([c, h], axis=-1)
        c = act_fn(c)
        out = params["out"]
        w_out = out["v"] * (out["g"] / _v_norm(out["v"]))
        return conv_tap_packed(w_out, c) + out["b"]

    from ipoke_tpu.flows.primitives import wn_conv_apply

    def nice_raw_plainout(self, params, z, h):
        # the pre-round-3 NICE: plain conv emitters for w1 AND the skinny
        # out conv (the shipped _raw now uses im2col w1 + tap-packed out)
        act_fn = M._act(self.activation)
        c = plain_conv(params["w1"], z, "SAME")
        c = act_fn(c)
        c = plain_conv(params["w2"], c, "SAME")
        if self.h_channels:
            c = jnp.concatenate([c, h], axis=-1)
        c = act_fn(c)
        return wn_conv_apply(params["out"], c, "SAME")

    # ---- finer NICE attribution (timing-only stubs: values change, the
    # remaining structure doesn't) — round-4: split the coupling cost into
    # w1 / w2 / out / activation shares with one chip run --------------------

    def _rest_after_w1(self, params, c, h, act_fn, w2_fn):
        c = act_fn(c)
        c = w2_fn(params["w2"], c)
        if self.h_channels:
            c = jnp.concatenate([c, h], axis=-1)
        c = act_fn(c)
        out = params["out"]
        w_out = out["v"] * (out["g"] / _v_norm(out["v"]))
        return conv_tap_packed(w_out, c) + out["b"]

    def nice_raw_no_w1(self, params, z, h):
        # skip the (M, 9*in1)@(9*in1, hid) w1 dot: rank-1 broadcast keeps a
        # data dependency on z and the hidden shape
        act_fn = M._act(self.activation)
        hid = params["w2"].shape[2]
        c = jnp.mean(z, axis=-1, keepdims=True) * jnp.ones(
            (1, 1, 1, hid), z.dtype)
        return _rest_after_w1(self, params, c, h, act_fn, conv_as_dots)

    def nice_raw_no_w2(self, params, z, h):
        # skip the fat (M,2048)@(2048,2048) w2 dot — the FLOP-dominant stage
        act_fn = M._act(self.activation)
        c = conv_im2col(params["w1"], z)
        c = act_fn(c)
        # keep ONE cheap data dependency on w2 so its weights aren't DCE'd
        c = c + jnp.mean(params["w2"]).astype(c.dtype)
        if self.h_channels:
            c = jnp.concatenate([c, h], axis=-1)
        c = act_fn(c)
        out = params["out"]
        w_out = out["v"] * (out["g"] / _v_norm(out["v"]))
        return conv_tap_packed(w_out, c) + out["b"]

    def nice_raw_out_center(self, params, z, h):
        # out conv reduced to its CENTER tap (1x1 dot): measures the cost of
        # the 3x3 gather + shifted adds in the tap-packed out stage
        act_fn = M._act(self.activation)
        c = conv_im2col(params["w1"], z)
        c = act_fn(c)
        c = conv_as_dots(params["w2"], c)
        if self.h_channels:
            c = jnp.concatenate([c, h], axis=-1)
        c = act_fn(c)
        out = params["out"]
        w_out = out["v"] * (out["g"] / _v_norm(out["v"]))
        kh, kw = w_out.shape[0], w_out.shape[1]
        wc = w_out[kh // 2, kw // 2]  # (Cin, N)
        b, hh, ww, cc = c.shape
        o = jax.lax.dot_general(
            c.reshape(b * hh * ww, cc), wc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return o.reshape(b, hh, ww, -1).astype(c.dtype) + out["b"]

    def nice_raw_noact(self, params, z, h):
        # identity activation: elementwise ELU share on the (M, 2048) hidden
        act_fn = lambda t: t
        c = conv_im2col(params["w1"], z)
        return _rest_after_w1(self, params, c, h, act_fn, conv_as_dots)

    def conv_as_dots_bf16acc(w, x):
        """w2 dot with bf16 accumulation (no preferred_element_type=f32):
        times the fp32-accumulate tax on the MXU epilogue."""
        kh, kw = w.shape[0], w.shape[1]
        b, hh, ww, c = x.shape
        assert kh == kw == 1
        return jax.lax.dot_general(
            x.reshape(b * hh * ww, c), w[0, 0],
            (((1,), (0,)), ((), ()))).reshape(b, hh, ww, -1).astype(x.dtype)

    def nice_raw_w2_bf16acc(self, params, z, h):
        act_fn = M._act(self.activation)
        c = conv_im2col(params["w1"], z)
        return _rest_after_w1(self, params, c, h, act_fn,
                              conv_as_dots_bf16acc)

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
        "nice_dots": {(M.NICE2d, "_raw"): nice_raw_dots,
                      (ops, "_FORCE_VALUE"): False},
        "nice_packed": {(M.NICE2d, "_raw"): nice_raw_packed,
                        (ops, "_FORCE_VALUE"): False},
        "nice_im2col": {(M.NICE2d, "_raw"): nice_raw_im2col,
                        (ops, "_FORCE_VALUE"): False},
        "nice_plainout": {(M.NICE2d, "_raw"): nice_raw_plainout,
                          (ops, "_FORCE_VALUE"): False},
        "nice_no_w1": {(M.NICE2d, "_raw"): nice_raw_no_w1,
                       (ops, "_FORCE_VALUE"): False},
        "nice_no_w2": {(M.NICE2d, "_raw"): nice_raw_no_w2,
                       (ops, "_FORCE_VALUE"): False},
        "nice_out_center": {(M.NICE2d, "_raw"): nice_raw_out_center,
                            (ops, "_FORCE_VALUE"): False},
        "nice_noact": {(M.NICE2d, "_raw"): nice_raw_noact,
                       (ops, "_FORCE_VALUE"): False},
        "nice_w2_bf16acc": {(M.NICE2d, "_raw"): nice_raw_w2_bf16acc,
                            (ops, "_FORCE_VALUE"): False},
        # fused 3-dot NICE-net Pallas kernel (ops/nice_net.py): hidden
        # activations stay in VMEM.  Identical math — out[0] must MATCH
        # full/portable up to bf16 noise, unlike the timing stubs above.
        "nice_fused": {(ops, "_NICE_FORCE_VALUE"): True},
        # kernel + portable (non-fused) MCF units, isolating the NICE win
        "nice_fused_portable_units": {(ops, "_NICE_FORCE_VALUE"): True,
                                      (ops, "_FORCE_VALUE"): False},
    }

    results = {}
    for name in args.variants.split(","):
        saved = []
        for (cls, attr), fn in patches[name].items():
            if attr == "_FORCE_VALUE":  # ops fused-unit force flag
                saved.append((cls, "_FORCE_FUSED", cls._FORCE_FUSED))
                cls._FORCE_FUSED = fn
                continue
            if attr == "_NICE_FORCE_VALUE":  # ops fused-NICE force flag
                saved.append((cls, "_FORCE_NICE", cls._FORCE_NICE))
                cls._FORCE_NICE = fn
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
