"""Pallas masked-conv inverse kernel vs the portable lax implementation
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipoke_tpu.flows.macow import MaskedConvFlow
from ipoke_tpu.flows.primitives import _v_norm
from ipoke_tpu.ops.masked_conv import masked_conv_inverse_pallas

K = jax.random.PRNGKey
B, H, W, C, HC = 2, 8, 8, 8, 6


def _flow_and_params(order, ks, h_channels=0, key=0):
    flow = MaskedConvFlow(C, ks, order=order, h_channels=h_channels)
    x = jax.random.normal(K(key), (B, H, W, C))
    h = jax.random.normal(K(key + 1), (B, H, W, h_channels)) \
        if h_channels else None
    params = flow.init(K(key + 2), x.shape)
    params["out"]["g"] = 0.3 * jax.random.normal(K(key + 3),
                                                 params["out"]["g"].shape)
    params["out"]["b"] = 0.1 * jax.random.normal(K(key + 4),
                                                 params["out"]["b"].shape)
    return flow, params, x, h


@pytest.mark.parametrize("order,ks", [("A", (2, 3)), ("B", (2, 3)),
                                      ("C", (3, 2)), ("D", (3, 2))])
def test_pallas_inverse_matches_lax(order, ks):
    flow, params, x, h = _flow_and_params(order, ks)
    y, _ = flow.forward(params, x, h)
    x_lax = flow.inverse(params, y, h)

    out = params["out"]
    w_out = (out["v"] * (out["g"] / _v_norm(out["v"])))[0, 0]
    x_pl = masked_conv_inverse_pallas(
        y, None, params["w_shift"], w_out, out["b"], order, flow.alpha,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_lax), atol=1e-4)
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x), atol=1e-4)


def test_pallas_inverse_conditional():
    flow, params, x, h = _flow_and_params("A", (2, 3), h_channels=HC, key=10)
    y, _ = flow.forward(params, x, h)
    out = params["out"]
    w_out = (out["v"] * (out["g"] / _v_norm(out["v"])))[0, 0]
    x_pl = masked_conv_inverse_pallas(
        y, h, params["w_shift"], w_out, out["b"], "A", flow.alpha,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x), atol=1e-4)


@pytest.mark.parametrize("h_channels", [0, HC])
def test_fused_unit_inverse(h_channels):
    """The fused whole-unit kernel inverts MaCowUnit's forward exactly like
    the portable Chain inverse."""
    from ipoke_tpu.flows.macow import make_macow_unit
    from ipoke_tpu.ops.masked_conv import macow_unit_inverse_pallas

    unit = make_macow_unit(C, (2, 3), h_channels=h_channels)
    x = jax.random.normal(K(20), (B, H, W, C))
    h = jax.random.normal(K(21), (B, H, W, h_channels)) \
        if h_channels else None
    params = unit.init(K(22), x.shape)
    # randomize the zero-init wn-convs and actnorms so the test is non-trivial
    _, _, params = unit.ddi(params, x, h)
    y, _ = unit.forward(params, x, h)
    x_lax = unit.inverse(params, y, h)  # portable path (cpu backend)

    x_pl = macow_unit_inverse_pallas(
        y, h, [params[0], params[1], params[3], params[4]],
        [params[2], params[5]], (2, 3), 1.0, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_lax), atol=1e-4)
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x), atol=1e-3)


# ---------------------------------------------------------------------------
# Fused NICE coupling-net kernel (ops/nice_net.py)
# ---------------------------------------------------------------------------


def _nice_and_params(in_channels=8, hidden=256, h_channels=0, factor=2,
                     split="continuous", key=40):
    from ipoke_tpu.flows.macow import NICE2d

    nice = NICE2d(in_channels, hidden_channels=hidden, h_channels=h_channels,
                  split_type=split, order="up", factor=factor)
    x = jax.random.normal(K(key), (B, H, W, in_channels))
    h = jax.random.normal(K(key + 1), (B, H, W, h_channels)) \
        if h_channels else None
    params = nice.init(K(key + 2), x.shape)
    # non-trivial out conv (zero-initialized by default)
    params["out"]["g"] = 0.3 * jax.random.normal(K(key + 3),
                                                 params["out"]["g"].shape)
    params["out"]["b"] = 0.1 * jax.random.normal(K(key + 4),
                                                 params["out"]["b"].shape)
    return nice, params, x, h


@pytest.mark.parametrize("h_channels,factor,split", [
    (0, 2, "continuous"), (6, 2, "continuous"), (0, 4, "continuous"),
    (0, 2, "skip"),
])
def test_fused_nice_net_matches_raw(h_channels, factor, split):
    """The fused 3-dot kernel (interpret mode) reproduces NICE2d._raw."""
    from ipoke_tpu.ops.nice_net import nice_net_fits, nice_net_raw_pallas

    nice, params, x, h = _nice_and_params(
        h_channels=h_channels, factor=factor, split=split,
        key=50 + h_channels + factor)
    z = nice._split(x)[0]
    assert nice_net_fits(params, z, h)
    want = nice._raw(params, z, h)
    got = nice_net_raw_pallas(params, z, h, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_nice_net_bf16():
    from ipoke_tpu.ops.nice_net import nice_net_raw_pallas

    nice, params, x, h = _nice_and_params(key=70)
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), t)
    z = nice._split(cast(x))[0]
    want = nice._raw(cast(params), z, None)
    got = nice_net_raw_pallas(cast(params), z, None, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_fused_nice_net_gates():
    """The static fit check refuses shape families the kernel can't take."""
    from ipoke_tpu.ops.nice_net import nice_net_fits

    nice, params, x, h = _nice_and_params(h_channels=6, key=80)
    z = nice._split(x)[0]
    assert nice_net_fits(params, z, h)
    assert not nice_net_fits(params, z, None)  # conditioning rows need h
    bad_hid = dict(params, w1=jnp.zeros((3, 3, z.shape[-1], 200)))
    assert not nice_net_fits(bad_hid, z, h)    # hidden not 128-aligned
    z_big = jnp.zeros((B, 32, 32, z.shape[-1]))
    assert not nice_net_fits(params, z_big, h)  # spatial too large


def test_fused_nice_inverse_roundtrip(monkeypatch):
    """NICE2d.inverse with the fused gate enabled still inverts forward
    exactly on CPU (platform_dependent takes the portable branch), and the
    kernel-path inverse (called directly, interpret mode) matches too."""
    from ipoke_tpu import ops
    from ipoke_tpu.ops.nice_net import nice_net_raw_pallas

    nice, params, x, h = _nice_and_params(h_channels=6, key=90)
    y, _ = nice.forward(params, x, h)
    ops.set_fused_nice(True)
    try:
        x_back = nice.inverse(params, y, h)
    finally:
        ops.set_fused_nice(None)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-4)

    # the kernel raw drives the same transform inversion
    z1, z2 = nice._split(y)
    raw = nice_net_raw_pallas(params, z1, h, interpret=True)
    p = nice._tr.calc(raw)
    zp = nice._tr.bwd(z2, p)
    np.testing.assert_allclose(
        np.asarray(nice._unsplit(z1, zp)), np.asarray(x), atol=1e-4)


# ---------------------------------------------------------------------------
# Differentiable fused NICE net (training forward, ops/nice_net.py)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("h_channels", [0, 6])
def test_fused_nice_train_fwd_matches_raw(h_channels):
    """The residual-emitting train kernel's forward reproduces NICE2d._raw."""
    from ipoke_tpu.ops import nice_net

    nice, params, x, h = _nice_and_params(h_channels=h_channels,
                                          key=100 + h_channels)
    z = nice._split(x)[0]
    assert nice_net.nice_net_fits(params, z, h, train=True)
    want = nice._raw(params, z, h)
    raw, a, b = nice_net._train_impl(params, z, h, interpret=True)
    np.testing.assert_allclose(np.asarray(raw), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    # the emitted residuals ARE the portable chain's post-ELU hiddens
    from ipoke_tpu.flows.primitives import conv1x1_dot, plain_conv_apply
    a_ref = jax.nn.elu(plain_conv_apply(params["w1"], z, padding="SAME"))
    b_ref = jax.nn.elu(conv1x1_dot(params["w2"], a_ref))
    bsz, hh, ww, _ = z.shape
    np.testing.assert_allclose(
        np.asarray(a.reshape(bsz, hh, ww, -1)), np.asarray(a_ref),
        rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(b.reshape(bsz, hh, ww, -1)), np.asarray(b_ref),
        rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("h_channels", [0, 6])
def test_fused_nice_train_grads_match(h_channels):
    """custom_vjp backward (manual dots + portable-tail vjp) == jax.grad of
    the portable chain, for params, z, and h."""
    from ipoke_tpu.ops.nice_net import nice_net_raw_train

    nice, params, x, h = _nice_and_params(h_channels=h_channels,
                                          key=110 + h_channels)
    z = nice._split(x)[0]

    if h_channels:
        loss_fused = lambda p, zz, hc: jnp.sum(
            jnp.sin(nice_net_raw_train(True, p, zz, hc)))
        loss_raw = lambda p, zz, hc: jnp.sum(jnp.sin(nice._raw(p, zz, hc)))
        got = jax.grad(loss_fused, argnums=(0, 1, 2))(params, z, h)
        want = jax.grad(loss_raw, argnums=(0, 1, 2))(params, z, h)
    else:
        loss_fused = lambda p, zz: jnp.sum(
            jnp.sin(nice_net_raw_train(True, p, zz, None)))
        loss_raw = lambda p, zz: jnp.sum(jnp.sin(nice._raw(p, zz, None)))
        got = jax.grad(loss_fused, argnums=(0, 1))(params, z)
        want = jax.grad(loss_raw, argnums=(0, 1))(params, z)

    flat_g, tree_g = jax.tree_util.tree_flatten(got)
    flat_w, tree_w = jax.tree_util.tree_flatten(want)
    assert tree_g == tree_w
    for gg, ww_ in zip(flat_g, flat_w):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(ww_),
                                   rtol=2e-3, atol=2e-3)


def test_fused_nice_train_bf16_grad_dtypes():
    """bf16 primals get bf16 cotangents (master-weights contract)."""
    from ipoke_tpu.ops.nice_net import nice_net_fits, nice_net_raw_train

    nice, params, x, h = _nice_and_params(key=120)
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), t)
    params, z = cast(params), nice._split(cast(x))[0]
    assert nice_net_fits(params, z, None, train=True)
    g = jax.grad(lambda p, zz: jnp.sum(
        nice_net_raw_train(True, p, zz, None).astype(jnp.float32)),
        argnums=(0, 1))(params, z)
    for leaf in jax.tree_util.tree_leaves(g):
        assert leaf.dtype == jnp.bfloat16


@pytest.mark.parametrize("h_channels", [0, 6])
def test_fused_nice_train_primal_matches_fwd_rule(h_channels):
    """The custom_vjp PRIMAL (plain inference kernel) and FWD RULE
    (_train_impl's residual-emitting kernel) are independent forward
    implementations; under jax.checkpoint the reported loss comes from the
    primal while gradients come from the fwd rule, so they must stay
    numerically identical if either kernel/epilogue is edited (advisor r4)."""
    from ipoke_tpu.ops import nice_net

    nice, params, x, h = _nice_and_params(h_channels=h_channels,
                                          key=140 + h_channels)
    z = nice._split(x)[0]
    primal = nice_net.nice_net_raw_train(True, params, z, h)
    fwd_raw, _, _ = nice_net._train_impl(params, z, h, interpret=True)
    np.testing.assert_array_equal(np.asarray(primal), np.asarray(fwd_raw))


def test_nice_block_env_override_respects_train_budget(monkeypatch):
    """IPOKE_NICE_BLOCK_B is validated against the variant-aware VMEM budget:
    a block size that fits the inference kernel but overflows the train
    kernel (extra residual buffers) must be refused for train=True instead
    of overflowing VMEM at run time (advisor r4)."""
    from ipoke_tpu.ops.nice_net import _pick_block_b

    # sized so bb=16 fits the inference budget (~2.6 MB fixed + 16*0.62 MB)
    # but overflows the train budget (16*1.15 MB per item)
    args = dict(batch=16, hw=64, k1=128, hid=1024, nine_cout=128, itemsize=2)
    auto_inf = _pick_block_b(**args)
    auto_train = _pick_block_b(**args, train=True)
    assert auto_inf == 16 and auto_train is not None
    assert auto_train < auto_inf

    monkeypatch.setenv("IPOKE_NICE_BLOCK_B", "16")
    assert _pick_block_b(**args) == 16  # honored where it fits
    with pytest.warns(UserWarning, match="VMEM budget"):
        assert _pick_block_b(**args, train=True) is None
    # a tiny override that fits both is honored in both variants
    monkeypatch.setenv("IPOKE_NICE_BLOCK_B", "1")
    assert _pick_block_b(**args, train=True) == 1
    assert _pick_block_b(**args) == 1


def test_fused_train_gate_requires_bf16_params():
    """_raw_train falls back to the portable path when params are fp32 even
    if activations are bf16 — mismatched precision must not reach the
    platform_dependent branch pair (advisor r4: the branches would disagree
    on output dtype)."""
    from unittest import mock

    from ipoke_tpu import ops

    nice, params, x, h = _nice_and_params(h_channels=6, key=150)
    z16 = nice._split(x)[0].astype(jnp.bfloat16)
    h16 = h.astype(jnp.bfloat16)
    sentinel = object()
    ops.set_fused_nice_train(True)
    try:
        with mock.patch("ipoke_tpu.ops.nice_net.nice_net_raw_train") as m, \
                mock.patch.object(type(nice), "_raw",
                                  return_value=sentinel) as raw:
            out = nice._raw_train(params, z16, h16)  # fp32 params
            m.assert_not_called()
            raw.assert_called_once()
        assert out is sentinel

        # control: with bf16 params too, the fused branch IS taken (the
        # platform_dependent call sees the kernel path on TPU)
        p16 = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
        with mock.patch.object(jax.lax, "platform_dependent",
                               return_value=sentinel) as pd:
            out = nice._raw_train(p16, z16, h16)
            pd.assert_called_once()
        assert out is sentinel
    finally:
        ops.set_fused_nice_train(None)


def test_fused_nice_train_forward_dispatch():
    """NICE2d.forward takes the fused train path when enabled (CPU keeps the
    portable branch via platform dispatch — same values either way)."""
    from ipoke_tpu import ops

    nice, params, x, h = _nice_and_params(h_channels=6, key=130)
    want, ld_want = nice.forward(params, x, h)
    ops.set_fused_nice_train(True)
    try:
        got, ld_got = nice.forward(params, x, h)
    finally:
        ops.set_fused_nice_train(None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld_got), np.asarray(ld_want),
                               atol=1e-6)


# ---------------------------------------------------------------------------
# fused SPADE GN+modulate kernel (ops/spade_gn.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape,groups,bm", [
    ((4, 8, 8, 64), 16, 2),     # C < 128 (top decode level layout), t=2
    ((4, 8, 8, 128), 16, 4),    # C == 128, per-frame modulations
    ((2, 4, 4, 256), 16, 1),    # C = 2*128 -> two lane phases, t=2
    ((3, 8, 8, 96), 16, 3),     # unsupported C (128 % 96 != 0) -> portable
])
def test_spade_gn_kernel_matches_portable(shape, groups, bm):
    """Interpret-mode kernel == portable fused GN+modulate math."""
    from ipoke_tpu.nn.blocks import _num_groups, _spade_gn_portable
    from ipoke_tpu.ops import spade_gn

    rng = np.random.default_rng(hash(shape) % 2**31)
    x = jnp.asarray(rng.normal(0, 2, shape).astype(np.float32))
    g = _num_groups(shape[-1], groups)
    mshape = (bm,) + shape[1:]
    gamma = jnp.asarray(rng.normal(0, 0.5, mshape).astype(np.float32))
    beta = jnp.asarray(rng.normal(0, 0.5, mshape).astype(np.float32))

    want = _spade_gn_portable(x, gamma, beta, g, 1e-5)
    if not spade_gn.kernel_supported(shape, bm, g, x.dtype):
        assert shape[-1] == 96  # only the designed-unsupported case
        return
    got = spade_gn.spade_gn_modulate_pallas(x, gamma, beta, g, 1e-5,
                                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("shape,groups,bm", [
    ((4, 8, 8, 64), 16, 2),     # C < 128, t=2
    ((2, 4, 4, 256), 16, 1),    # two lane phases
])
def test_spade_gn_kernel_bf16_matches_portable(shape, groups, bm):
    """bf16 IO (the SHIPPED decode dtype): interpret-mode kernel == portable
    bf16 semantics — fp32 stats, normalized output cast to bf16 BEFORE the
    modulation, bf16 modulation FMA."""
    from ipoke_tpu.nn.blocks import _num_groups, _spade_gn_portable
    from ipoke_tpu.ops import spade_gn

    rng = np.random.default_rng(hash(shape) % 2**31)
    x = jnp.asarray(rng.normal(0, 2, shape), jnp.bfloat16)
    g = _num_groups(shape[-1], groups)
    mshape = (bm,) + shape[1:]
    gamma = jnp.asarray(rng.normal(0, 0.5, mshape), jnp.bfloat16)
    beta = jnp.asarray(rng.normal(0, 0.5, mshape), jnp.bfloat16)

    assert spade_gn.kernel_supported(shape, bm, g, x.dtype)
    want = _spade_gn_portable(x, gamma, beta, g, 1e-5)
    got = spade_gn.spade_gn_modulate_pallas(x, gamma, beta, g, 1e-5,
                                            interpret=True)
    assert got.dtype == jnp.bfloat16
    # both sides are bf16 with fp32 stats; only accumulation order differs
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_spade_gn_fused_grads_are_portable():
    """jax.grad through spade_gn_fused == grad of the portable math (the
    custom_vjp fwd rule swaps in the portable forward so training never
    traces the kernel)."""
    from ipoke_tpu.nn.blocks import _spade_gn_portable
    from ipoke_tpu.ops.spade_gn import spade_gn_fused

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(0, 1, (2, 4, 4, 64)).astype(np.float32))
    gamma = jnp.asarray(rng.normal(0, 0.5, (1, 4, 4, 64)).astype(np.float32))
    beta = jnp.asarray(rng.normal(0, 0.5, (1, 4, 4, 64)).astype(np.float32))

    def loss_fused(args):
        return jnp.sum(jnp.square(spade_gn_fused(*args, 16, 1e-5)))

    def loss_port(args):
        return jnp.sum(jnp.square(_spade_gn_portable(*args, 16, 1e-5)))

    g1 = jax.grad(loss_fused)((x, gamma, beta))
    g2 = jax.grad(loss_port)((x, gamma, beta))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_spade_module_gate_wiring(monkeypatch):
    """nn.blocks.spade_gn_modulate routes to the fused path only when the
    gate is on AND the shape is supported; values agree on CPU (platform
    dispatch keeps the portable branch)."""
    from ipoke_tpu import ops
    from ipoke_tpu.nn import blocks

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(0, 1, (4, 8, 8, 64)).astype(np.float32))
    gamma = jnp.asarray(rng.normal(0, 0.5, (2, 8, 8, 64)).astype(np.float32))
    beta = jnp.asarray(rng.normal(0, 0.5, (2, 8, 8, 64)).astype(np.float32))
    base = blocks.spade_gn_modulate(x, gamma, beta, 16)
    ops.set_fused_spade(True)
    try:
        fused = blocks.spade_gn_modulate(x, gamma, beta, 16)
    finally:
        ops.set_fused_spade(None)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base), atol=1e-6)
