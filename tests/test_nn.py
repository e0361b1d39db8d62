"""Shape/behavior tests for the NN module library."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipoke_tpu import nn as inn

K = jax.random.PRNGKey


def test_conv_encoder_decoder_roundtrip_shapes():
    enc = inn.ConvEncoder(nf_in=3, nf_max=64, n_stages=3, variational=True)
    x = jnp.zeros((2, 64, 64, 3))
    vars_ = enc.init({"params": K(0)}, x, rng=K(1), train=False)
    (z, mean, logstd), _ = enc.apply(
        vars_, x, rng=K(2), train=True, mutable=["batch_stats"]
    )
    assert z.shape == (2, 8, 8, 64)
    assert logstd is not None and float(jnp.max(logstd)) <= 1.0

    dec = inn.ConvDecoder(nf_in=64, in_channels=(64,) + enc.depths, out_channels=3)
    dv = dec.init({"params": K(3)}, z)
    y = dec.apply(dv, z)
    assert y.shape == x.shape
    assert float(jnp.max(jnp.abs(y))) <= 1.0  # tanh output


def test_spade_decoder():
    dec = inn.SpadeCondConvDecoder(dec_channels=(64, 64, 32, 32), out_channels=3)
    h = jnp.zeros((2, 8, 8, 32))
    x0 = jnp.zeros((2, 64, 64, 3))
    v = dec.init({"params": K(0)}, h, x0)
    y = dec.apply(v, h, x0)
    assert y.shape == (2, 64, 64, 3)


@pytest.mark.parametrize("spatial,min_s,chs", [(64, 8, (32, 64, 128, 128)),
                                               (128, 8, (32, 64, 128, 128, 128))])
def test_motion_encoder(spatial, min_s, chs):
    enc = inn.ResNetMotionEncoder(
        channels=chs, z_dim=32, spatial_size=spatial, max_frames=10,
        full_seq=True, min_spatial_size=min_s,
    )
    x = jnp.zeros((2, 10, spatial, spatial, 3))
    v = enc.init({"params": K(0)}, x, rng=K(1))
    z, mu, logvar = enc.apply(v, x, rng=K(2))
    assert z.shape == (2, min_s, min_s, 32)
    assert mu.shape == logvar.shape == z.shape


def test_conv_gru_rollout():
    gru = inn.ConvGRU(hidden_size=16, n_layers=3)
    x = jnp.ones((2, 8, 8, 16))
    hidden = tuple(jnp.zeros((2, 8, 8, 16)) for _ in range(3))
    v = gru.init({"params": K(0)}, x, hidden)
    h1 = gru.apply(v, x, hidden)
    assert len(h1) == 3 and h1[-1].shape == x.shape
    h2 = gru.apply(v, x, h1)
    assert float(jnp.max(jnp.abs(h2[-1] - h1[-1]))) > 0  # state evolves


def test_patch_discriminator_2d():
    d = inn.PatchDiscriminator2D(ndf=32, n_layers=3)
    x = jnp.zeros((2, 64, 64, 3))
    v = d.init({"params": K(0)}, x, train=False)
    (logits, fmaps), _ = d.apply(v, x, train=True, mutable=["batch_stats"])
    assert logits.shape[0] == 2 and logits.shape[-1] == 1
    assert len(fmaps) == 4


def test_resnet3d_discriminator_and_gp():
    d = inn.ResNet3DDiscriminator(layers=(1, 1, 1, 1))
    x = jax.random.normal(K(1), (2, 6, 32, 32, 3))
    v = d.init({"params": K(0)}, x, train=False)
    logits, fmaps = d.apply(v, x, train=False)
    assert logits.shape == (2, 1)
    gp = inn.gradient_penalty(lambda t: d.apply(v, t, train=False)[0], x)
    assert gp.shape == (2,) and bool(jnp.all(gp >= 0))


def test_gan_losses():
    pred = jnp.array([[0.5], [-0.5]])
    assert float(inn.hinge_d_loss(pred, True)) > 0
    assert float(inn.hinge_d_loss(pred, False)) > 0
    f = [jnp.ones((2, 4, 4, 8)), jnp.zeros((2, 2, 2, 16))]
    r = [jnp.zeros((2, 4, 4, 8)), jnp.zeros((2, 2, 2, 16))]
    assert float(inn.fmap_loss(f, r)) == pytest.approx(0.5)


def test_spectral_norm_state_updates():
    blk = inn.Conv2dBlock(out_dim=8, ks=3, st=1, padding=1, snorm=True)
    x = jax.random.normal(K(0), (2, 16, 16, 4))
    v = blk.init({"params": K(1)}, x, train=False)
    assert "batch_stats" in v
    y, new_state = blk.apply(v, x, train=True, mutable=["batch_stats"])
    leaves_old = jax.tree_util.tree_leaves(v["batch_stats"])
    leaves_new = jax.tree_util.tree_leaves(new_state["batch_stats"])
    assert any(
        float(jnp.max(jnp.abs(a - b))) > 0 for a, b in zip(leaves_old, leaves_new)
    )


def test_video_vis_utils(tmp_path):
    import os

    from ipoke_tpu.utils.video import (
        draw_poke_arrows,
        make_flow_video_grid,
        make_transfer_grid,
        save_enrollment,
    )

    rng = np.random.default_rng(0)
    b, t, s = 2, 3, 32
    x0 = rng.uniform(-1, 1, (b, s, s, 3)).astype(np.float32)
    poke = np.zeros((b, s, s, 2), np.float32)
    poke[:, 10:13, 10:13] = 3.0
    target = rng.uniform(-1, 1, (b, t, s, s, 3)).astype(np.float32)
    flow = rng.normal(0, 2, (b, s, s, 2)).astype(np.float32)
    samples = [target + 0.1]

    arrowed = draw_poke_arrows(x0[0], poke[0])
    assert arrowed.shape == (s, s, 3) and arrowed.dtype == np.uint8
    # non-contiguous input (a time-slice view) must also work
    vids = rng.uniform(-1, 1, (b, t, s, s, 3)).astype(np.float32)
    arrowed2 = draw_poke_arrows(vids[:, 0][0], poke[0])
    assert arrowed2.dtype == np.uint8

    p1 = make_flow_video_grid(x0, poke, samples, target, flow,
                              str(tmp_path / "grid.mp4"))
    p2 = save_enrollment(target[0], str(tmp_path / "enroll.png"))
    p3 = make_transfer_grid(target, x0, target, str(tmp_path / "tr.mp4"))
    for p in (p1, p2, p3):
        assert os.path.getsize(p) > 0


@pytest.mark.parametrize("n,ks,odd_spatial", [(3, 3, False), (2, 3, True),
                                              (1, 1, False), (8, 5, False)])
def test_conv2dblock_small_n_packed_matches_conv(n, ks, odd_spatial):
    """The skinny-N packed emitter must equal a plain nn.Conv apply on the
    SAME params (identical param tree: Conv_0/{kernel,bias})."""
    from flax import linen as fnn

    from ipoke_tpu.nn.blocks import Conv2dBlock

    h, w = (11, 14) if odd_spatial else (8, 8)
    x = jax.random.normal(K(0), (2, h, w, 16))
    blk = Conv2dBlock(out_dim=n, ks=ks, st=1, padding=ks // 2, norm="none",
                      activation="none")
    v = blk.init(K(1), x)
    kp = v["params"]["Conv_0"]
    assert set(kp) == {"kernel", "bias"}
    assert kp["kernel"].shape == (ks, ks, 16, n)
    got = blk.apply(v, x)
    want = jax.lax.conv_general_dilated(
        x, kp["kernel"], (1, 1), [(ks // 2, ks // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + kp["bias"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_conv2dblock_small_n_param_tree_stable():
    """out_dim > 8 keeps the plain nn.Conv; both variants expose the same
    Conv_0 param paths so checkpoints cross-load."""
    from ipoke_tpu.nn.blocks import Conv2dBlock

    x = jax.random.normal(K(0), (1, 8, 8, 4))
    trees = []
    for n in (3, 16):
        v = Conv2dBlock(out_dim=n, ks=3, st=1, padding=1).init(K(1), x)
        trees.append(jax.tree_util.tree_structure(v))
    assert trees[0] == trees[1]


@pytest.mark.parametrize("odd,snorm", [(False, False), (True, False),
                                       (False, True)])
def test_phase_deconv_matches_flax_conv_transpose(odd, snorm):
    """_PhaseConvTranspose2x must equal nn.ConvTranspose(k3, s2, SAME) on
    the SAME params — incl. odd spatial sizes and under SpectralNorm."""
    import os

    from flax import linen as fnn

    from ipoke_tpu.nn.blocks import Conv2dTransposeBlock

    h, w = (7, 10) if odd else (8, 8)
    x = jax.random.normal(K(0), (2, h, w, 12))
    blk = Conv2dTransposeBlock(out_dim=6, norm="none", activation="none",
                               snorm=snorm)
    os.environ["IPOKE_PHASE_DECONV"] = "1"
    try:
        v = blk.init(K(1), x)
        got = blk.apply(v, x)
        os.environ["IPOKE_PHASE_DECONV"] = "0"
        want = blk.apply(v, x)  # same variables, flax emitter
    finally:
        os.environ.pop("IPOKE_PHASE_DECONV", None)
    assert got.shape == (2, 2 * h, 2 * w, 6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_new_emitters_gradient_parity():
    """Training runs through the packed/phase emitters: their VJPs must
    match the stock flax emitters on shared params."""
    import os

    from ipoke_tpu.nn.blocks import Conv2dBlock, Conv2dTransposeBlock

    x = jax.random.normal(K(0), (2, 8, 8, 12))

    def loss_with(env_on):
        os.environ["IPOKE_PHASE_DECONV"] = env_on
        os.environ["IPOKE_SMALLN_CONV"] = env_on

        def f(v_blk, v_tr, x):
            blk = Conv2dBlock(out_dim=3, ks=3, st=1, padding=1,
                              norm="none", activation="none")
            tr = Conv2dTransposeBlock(out_dim=5, norm="none",
                                      activation="none")
            return jnp.sum(blk.apply(v_blk, x) ** 2) + jnp.sum(
                tr.apply(v_tr, x) ** 2)

        return f

    try:
        os.environ["IPOKE_PHASE_DECONV"] = "1"
        os.environ["IPOKE_SMALLN_CONV"] = "1"
        v_blk = Conv2dBlock(out_dim=3, ks=3, st=1, padding=1, norm="none",
                            activation="none").init(K(1), x)
        v_tr = Conv2dTransposeBlock(out_dim=5, norm="none",
                                    activation="none").init(K(2), x)
        g_new = jax.grad(loss_with("1"), argnums=(0, 1, 2))(v_blk, v_tr, x)
        g_old = jax.grad(loss_with("0"), argnums=(0, 1, 2))(v_blk, v_tr, x)
    finally:
        os.environ.pop("IPOKE_PHASE_DECONV", None)
        os.environ.pop("IPOKE_SMALLN_CONV", None)
    for a, b in zip(jax.tree_util.tree_leaves(g_new),
                    jax.tree_util.tree_leaves(g_old)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=3e-4)


def test_fused_spade_gn_modulate_matches_layered():
    """spade_gn_modulate (r4: one fused elementwise pass, fp32 stats) must
    reproduce the layered form nn.GroupNorm(use_bias=False, use_scale=False)
    -> * (1+gamma) + beta, in both the same-batch and the per-clip broadcast
    (mod batch B, x batch B*T, b-major) layouts."""
    from flax import linen as nn
    from ipoke_tpu.nn.blocks import spade_gn_modulate, _num_groups

    B, T, H, W, C = 3, 4, 8, 8, 32
    g = _num_groups(C)
    x = jax.random.normal(K(0), (B * T, H, W, C), jnp.float32) * 2.0 + 0.3
    gamma = jax.random.normal(K(1), (B, H, W, C), jnp.float32)
    beta = jax.random.normal(K(2), (B, H, W, C), jnp.float32)

    gn = nn.GroupNorm(num_groups=g, use_bias=False, use_scale=False,
                      epsilon=1e-5)
    normed = gn.apply({}, x)
    gamma_t = jnp.repeat(gamma, T, axis=0)
    beta_t = jnp.repeat(beta, T, axis=0)
    want = normed * (1.0 + gamma_t) + beta_t

    got_same = spade_gn_modulate(x, gamma_t, beta_t, g)
    np.testing.assert_allclose(np.asarray(got_same), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

    got_bcast = spade_gn_modulate(x, gamma, beta, g)
    np.testing.assert_allclose(np.asarray(got_bcast), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

    with pytest.raises(ValueError):
        spade_gn_modulate(x[: B * T - 1], gamma, beta, g)
