"""RAFT flow estimator (nn/raft.py) — the learned replacement for the
reference's FlowNet2 prep stack (utils/flownet_loader.py).

Covers: correlation-volume math vs a numpy oracle, bilinear lookup,
convex upsampling partition-of-unity, torch state_dict conversion
(synthesized official-layout dict -> flax roundtrip), the prep-estimator
contract, and — the functional proof — a from-scratch smoke training run
that learns synthetic translations to sub-pixel EPE."""

import numpy as np
import pytest


def test_corr_pyramid_matches_numpy_oracle():
    import jax.numpy as jnp

    from ipoke_tpu.nn.raft import corr_pyramid

    rng = np.random.default_rng(0)
    f1 = rng.normal(size=(2, 4, 5, 8)).astype(np.float32)
    f2 = rng.normal(size=(2, 4, 5, 8)).astype(np.float32)
    levels = corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=2)
    # oracle: corr[b, x, y, u, v] = <f1[b,x,y], f2[b,u,v]> / sqrt(D)
    want = np.einsum("bxyd,buvd->bxyuv", f1, f2) / np.sqrt(8.0)
    got = np.asarray(levels[0]).reshape(2, 4, 5, 4, 5)
    np.testing.assert_allclose(got, want, atol=1e-5)
    # level 1: 2x2 avg pool over target dims
    assert levels[1].shape == (2 * 4 * 5, 2, 2, 1)


def test_bilinear_sample_interpolates_and_zero_pads():
    import jax.numpy as jnp

    from ipoke_tpu.nn.raft import bilinear_sample

    img = jnp.arange(12, dtype=jnp.float32).reshape(1, 3, 4, 1)
    # exact grid points
    got = bilinear_sample(img, jnp.asarray([[[1.0, 1.0], [3.0, 2.0]]]))
    np.testing.assert_allclose(np.asarray(got)[0, :, 0], [5.0, 11.0])
    # midpoint
    got = bilinear_sample(img, jnp.asarray([[[0.5, 0.5]]]))
    np.testing.assert_allclose(float(got[0, 0, 0]), (0 + 1 + 4 + 5) / 4)
    # out of bounds -> 0
    got = bilinear_sample(img, jnp.asarray([[[-2.0, 0.0], [10.0, 10.0]]]))
    np.testing.assert_allclose(np.asarray(got)[0, :, 0], [0.0, 0.0])


def test_convex_upsample_partition_of_unity():
    """With uniform mask logits the upsample must equal 8x the coarse flow
    replicated (softmax weights sum to 1 over the 3x3 neighborhood)."""
    import jax.numpy as jnp

    from ipoke_tpu.nn.raft import convex_upsample

    flow = jnp.ones((1, 4, 4, 2)) * jnp.asarray([1.0, -0.5])
    mask = jnp.zeros((1, 4, 4, 64 * 9))
    up = convex_upsample(flow, mask)
    assert up.shape == (1, 32, 32, 2)
    # interior coarse cells have full 3x3 neighborhoods; borders are diluted
    # by the zero padding exactly like the official unfold(padding=1)
    inner = np.asarray(up[:, 8:24, 8:24])
    np.testing.assert_allclose(inner[..., 0], 8.0, atol=1e-5)
    np.testing.assert_allclose(inner[..., 1], -4.0, atol=1e-5)
    corner = np.asarray(up[0, 0, 0])
    np.testing.assert_allclose(corner[0], 8.0 * 4 / 9, atol=1e-5)


def _synth_torch_state(cfg):
    """Synthesize an official-layout RAFT state_dict (numpy) matching cfg."""
    rng = np.random.default_rng(3)

    def w(*shape):
        return rng.normal(scale=0.05, size=shape).astype(np.float32)

    state = {}

    def conv(name, cin, cout, k):
        state[f"{name}.weight"] = w(cout, cin, k, k)
        state[f"{name}.bias"] = w(cout)

    def bn(name, c):
        state[f"{name}.weight"] = w(c) + 1.0
        state[f"{name}.bias"] = w(c)
        state[f"{name}.running_mean"] = w(c)
        state[f"{name}.running_var"] = np.abs(w(c)) + 1.0

    widths = (cfg.base, int(cfg.base * 1.5), cfg.base * 2)
    for enc, out_dim, has_bn in (("fnet", cfg.feature_dim, False),
                                 ("cnet", cfg.hidden_dim + cfg.context_dim,
                                  True)):
        conv(f"{enc}.conv1", 3, cfg.base, 7)
        if has_bn:
            bn(f"{enc}.norm1", cfg.base)
        cin = cfg.base
        for li, wd in enumerate(widths, start=1):
            for bi in range(2):
                t = f"{enc}.layer{li}.{bi}"
                conv(f"{t}.conv1", cin if bi == 0 else wd, wd, 3)
                conv(f"{t}.conv2", wd, wd, 3)
                if has_bn:
                    bn(f"{t}.norm1", wd)
                    bn(f"{t}.norm2", wd)
                if bi == 0 and (li > 1 or cin != wd):
                    conv(f"{t}.downsample.0", cin, wd, 1)
                    if has_bn:
                        bn(f"{t}.norm3", wd)
            cin = wd
        conv(f"{enc}.conv2", cin, out_dim, 1)
    cp = cfg.corr_levels * (2 * cfg.corr_radius + 1) ** 2
    conv("update_block.encoder.convc1", cp, 256, 1)
    conv("update_block.encoder.convc2", 256, 192, 3)
    conv("update_block.encoder.convf1", 2, 128, 7)
    conv("update_block.encoder.convf2", 128, 64, 3)
    conv("update_block.encoder.conv", 192 + 64, 126, 3)
    hx = cfg.context_dim + 128
    for tag, k in (("1", (1, 5)), ("2", (5, 1))):
        for g in ("convz", "convr", "convq"):
            state[f"update_block.gru.{g}{tag}.weight"] = w(
                cfg.hidden_dim, cfg.hidden_dim + hx, *k)
            state[f"update_block.gru.{g}{tag}.bias"] = w(cfg.hidden_dim)
    conv("update_block.flow_head.conv1", cfg.hidden_dim, 256, 3)
    conv("update_block.flow_head.conv2", 256, 2, 3)
    conv("update_block.mask.0", cfg.hidden_dim, 256, 3)
    conv("update_block.mask.2", 256, 64 * 9, 1)
    return state


def test_torch_conversion_roundtrip_runs(tmp_path):
    """Converted official-layout weights drop into the flax RAFT exactly
    (same tree structure as init; forward runs finite).  Proves the
    ``raft-things.pth`` npz will load without shape surgery."""
    import jax
    import jax.numpy as jnp

    from ipoke_tpu.nn.raft import RAFT, RAFTConfig, init_raft, \
        load_torch_raft_npz

    cfg = RAFTConfig(iters=2)
    state = _synth_torch_state(cfg)
    npz = str(tmp_path / "raft.npz")
    np.savez(npz, **{f"module.{k}": v for k, v in state.items()})
    variables = load_torch_raft_npz(npz)

    model, ref_vars = init_raft(jax.random.PRNGKey(0), 32, cfg)
    ref_shapes = jax.tree_util.tree_map(jnp.shape, ref_vars["params"])
    got_shapes = jax.tree_util.tree_map(jnp.shape, variables["params"])
    assert ref_shapes == got_shapes, "converted tree != model tree"
    assert jax.tree_util.tree_map(
        jnp.shape, ref_vars["batch_stats"]) == jax.tree_util.tree_map(
        jnp.shape, variables["batch_stats"])

    x = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, size=(1, 32, 32, 3)).astype(np.float32))
    flow = model.apply(variables, x, x)
    assert flow.shape == (1, 32, 32, 2)
    assert np.isfinite(np.asarray(flow)).all()


def test_raft_estimator_prep_contract():
    """Registered estimator obeys the prep contract (uint8 HWC pair ->
    float32 (2, H, W)) incl. non-multiple-of-8 sizes."""
    from ipoke_tpu.data.prep import _FLOW_ESTIMATORS

    est = _FLOW_ESTIMATORS["raft"]
    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, size=(30, 34, 3), dtype=np.uint8)
    b = rng.integers(0, 255, size=(30, 34, 3), dtype=np.uint8)
    flow = est(a, b)
    assert flow.shape == (2, 30, 34) and flow.dtype == np.float32
    assert np.isfinite(flow).all()


@pytest.mark.slow
def test_raft_learns_synthetic_translations():
    """From-scratch smoke training on random global translations must reach
    low EPE — the functional proof that the estimator pipeline (corr ->
    lookup -> GRU -> convex upsample -> sequence loss) actually learns
    optical flow."""
    from ipoke_tpu.nn.raft import train_raft_synthetic

    _, _, epe = train_raft_synthetic(steps=400, seed=0, log_every=100)
    assert np.isfinite(epe)
    assert epe < 2.0, f"RAFT failed to learn synthetic shifts (EPE={epe})"


def test_warp_image_matches_flow_convention():
    """warp_image(img1, gt_flow) must reproduce img2 away from the border —
    the ``image1(x + f(x)) == image2(x)`` convention the estimator is
    trained with."""
    from ipoke_tpu.nn.raft import synthetic_flow_batch, warp_image

    rng = np.random.default_rng(3)
    b = synthetic_flow_batch(rng, batch=2, size=24, max_shift=3.0)
    warped = np.asarray(warp_image(b["image1"], b["flow"]))
    img2 = np.asarray(b["image2"])
    err = np.abs(warped - img2)[:, 4:-4, 4:-4]
    assert err.mean() < 0.03, err.mean()


def test_raft_selfsup_photometric_prefers_true_flow():
    """The self-supervised loss must score the ground-truth flow strictly
    better than zero flow and than a wrong flow (same pairs, no labels)."""
    import jax.numpy as jnp

    from ipoke_tpu.nn.raft import photometric_selfsup_loss, synthetic_flow_batch

    rng = np.random.default_rng(4)
    b = synthetic_flow_batch(rng, batch=2, size=24, max_shift=3.0)
    gt = b["flow"][None]  # one "iteration"
    zero = jnp.zeros_like(gt)
    wrong = -gt
    l_gt = float(photometric_selfsup_loss(gt, b["image1"], b["image2"]))
    l_zero = float(photometric_selfsup_loss(zero, b["image1"], b["image2"]))
    l_wrong = float(photometric_selfsup_loss(wrong, b["image1"], b["image2"]))
    assert l_gt < l_zero and l_gt < l_wrong, (l_gt, l_zero, l_wrong)


def test_raft_selfsup_loss_surface_recovers_flow():
    """Optimizing a raw flow FIELD (no network) under the self-supervised
    loss must recover the true translation — the loss surface is well-posed
    around zero init at the synthetic textures' smoothness scale."""
    import jax
    import jax.numpy as jnp
    import optax

    from ipoke_tpu.nn.raft import photometric_selfsup_loss, synthetic_flow_batch

    rng = np.random.default_rng(6)
    b = synthetic_flow_batch(rng, batch=4, size=32, max_shift=2.5)

    def loss_of(flow):
        return photometric_selfsup_loss(
            flow[None], b["image1"], b["image2"], smooth_weight=0.02)

    tx = optax.adam(0.3)
    flow = jnp.zeros_like(b["flow"])
    opt = tx.init(flow)

    @jax.jit
    def step(flow, opt):
        loss, g = jax.value_and_grad(loss_of)(flow)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(flow, upd), opt, loss

    epe0 = float(jnp.mean(jnp.linalg.norm(flow - b["flow"], axis=-1)))
    for _ in range(120):
        flow, opt, loss = step(flow, opt)
    # interior EPE (the border has no photometric constraint under the
    # out-of-bounds mask)
    epe1 = float(jnp.mean(jnp.linalg.norm(
        (flow - b["flow"])[:, 6:-6, 6:-6], axis=-1)))
    assert epe1 < 0.35 * epe0, (epe0, epe1)


@pytest.mark.slow
def test_raft_selfsup_finetune_reduces_epe():
    """Label-free training on raw frame pairs (the FlowNet2-free recipe for
    real clips) must reduce the EPE vs the held ground truth it never sees.
    (Self-sup from random init converges slowly — ~13% EPE drop per 120
    steps measured — so the gate is a robust directional margin.)"""
    import jax

    from ipoke_tpu.nn.raft import (
        RAFTConfig,
        finetune_raft_selfsup,
        init_raft,
        synthetic_flow_batch,
    )

    cfg = RAFTConfig(base=32, feature_dim=96, hidden_dim=64,
                     context_dim=64, corr_levels=2, corr_radius=3, iters=4)
    model, variables = init_raft(jax.random.PRNGKey(0), 32, cfg)
    rng = np.random.default_rng(5)
    eval_batch = synthetic_flow_batch(rng, batch=8, size=32, max_shift=3.0)

    def epe_of(v):
        final = model.apply(
            {"params": v["params"], "batch_stats": v["batch_stats"]},
            eval_batch["image1"], eval_batch["image2"])
        return float(np.mean(np.linalg.norm(
            np.asarray(final) - np.asarray(eval_batch["flow"]), axis=-1)))

    batches = lambda i: {
        k: v for k, v in synthetic_flow_batch(rng, 8, 32, 3.0).items()
        if k != "flow"}
    epe0 = epe_of(variables)
    variables2, log = finetune_raft_selfsup(
        model, variables, batches, steps=160, lr=1e-3)
    epe1 = epe_of(variables2)
    assert np.isfinite(float(log["loss"]))
    assert epe1 < 0.93 * epe0, (epe0, epe1)
