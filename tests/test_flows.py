"""Property tests for the invertible-flow engine.

The reference ships no tests; these implement the strategy SURVEY.md §4
recommends: exact invertibility ``x == inverse(forward(x))`` and
logdet == log|det d(forward)/dx| via autodiff jacobian, for every primitive
and for the full multi-scale conditional stack.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipoke_tpu.flows import (
    ActNorm,
    InvConvLU,
    MaskedConvFlow,
    MultiScaleInternal,
    NICE2d,
    ScannedSteps,
    Shuffle,
    build_macow_transformer,
    make_macow_step,
    make_macow_unit,
    trainable_mask,
)

B, H, W, C = 2, 8, 8, 8
HC = 6


def _data(key, c=C, h_channels=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    x = jax.random.normal(k1, (B, H, W, c))
    h = jax.random.normal(k2, (B, H, W, h_channels)) if h_channels else None
    return x, h


def autodiff_logdet(fn, x, h=None):
    """log|det J| of fn restricted to one sample, via dense jacobian."""
    out = []
    for b in range(x.shape[0]):
        hb = None if h is None else h[b : b + 1]
        flat_fn = lambda v: fn(v.reshape(x.shape[1:]), hb).ravel()
        J = jax.jacfwd(flat_fn)(x[b].ravel())
        sign, ld = np.linalg.slogdet(np.asarray(J, np.float64))
        out.append(ld)
    return np.asarray(out)


def check_flow(flow, key=0, c=C, h_channels=0, atol=1e-4, logdet_atol=5e-3,
               check_logdet=True):
    x, h = _data(key, c, h_channels)
    params = flow.init(jax.random.PRNGKey(100 + key), x.shape)
    y, ld = jax.jit(flow.forward)(params, x, h)
    x_rec = jax.jit(flow.inverse)(params, y, h)
    err = float(jnp.max(jnp.abs(x - x_rec)))
    assert err < atol, f"inversion error {err}"
    if check_logdet:
        ld_ref = autodiff_logdet(
            lambda v, hb: flow.forward(params, v[None], hb)[0][0], x, h,
        )
        np.testing.assert_allclose(np.asarray(ld), ld_ref, atol=logdet_atol)
    return params, x, h, y, ld


def test_actnorm():
    check_flow(ActNorm(C))


def test_actnorm_ddi_normalizes():
    flow = ActNorm(C)
    x, _ = _data(3)
    x = x * 3.0 + 1.5
    params = flow.init(jax.random.PRNGKey(0), x.shape)
    y, ld, new_params = flow.ddi(params, x)
    flat = np.asarray(y).reshape(-1, C)
    np.testing.assert_allclose(flat.mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(flat.std(0, ddof=1), 1.0, atol=1e-4)
    # forward with new params reproduces ddi output
    y2, _ = flow.forward(new_params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-6)


def test_shuffle():
    check_flow(Shuffle(C))


def test_inv_conv_lu():
    check_flow(InvConvLU(C))


@pytest.mark.parametrize("order,ks", [("A", (2, 3)), ("B", (2, 3)),
                                      ("C", (3, 2)), ("D", (3, 2))])
def test_masked_conv_flow(order, ks):
    flow = MaskedConvFlow(C, ks, order=order)
    # zero-init out conv -> identity at init; perturb params for a real test
    x, h = _data(1)
    params = flow.init(jax.random.PRNGKey(7), x.shape)
    params["out"]["g"] = 0.3 * jax.random.normal(jax.random.PRNGKey(8),
                                                 params["out"]["g"].shape)
    params["out"]["b"] = 0.1 * jax.random.normal(jax.random.PRNGKey(9),
                                                 params["out"]["b"].shape)
    y, ld = jax.jit(flow.forward)(params, x, h)
    x_rec = jax.jit(flow.inverse)(params, y, h)
    assert float(jnp.max(jnp.abs(x - x_rec))) < 1e-4
    ld_ref = autodiff_logdet(lambda v, hb: flow.forward(params, v[None])[0][0], x)
    np.testing.assert_allclose(np.asarray(ld), ld_ref, atol=5e-3)


@pytest.mark.parametrize("order,ks", [("A", (2, 3)), ("C", (3, 2))])
def test_masked_conv_flow_conditional(order, ks):
    flow = MaskedConvFlow(C, ks, order=order, h_channels=HC)
    x, h = _data(2, h_channels=HC)
    params = flow.init(jax.random.PRNGKey(17), x.shape)
    params["out"]["g"] = 0.3 * jax.random.normal(jax.random.PRNGKey(18),
                                                 params["out"]["g"].shape)
    y, _ = flow.forward(params, x, h)
    x_rec = flow.inverse(params, y, h)
    assert float(jnp.max(jnp.abs(x - x_rec))) < 1e-4
    # conditioning actually matters
    y2, _ = flow.forward(params, x, h * 2.0)
    assert float(jnp.max(jnp.abs(y - y2))) > 1e-6


@pytest.mark.parametrize("split,order", [("continuous", "up"),
                                         ("continuous", "down"),
                                         ("skip", "up"), ("skip", "down")])
def test_nice2d(split, order):
    flow = NICE2d(C, hidden_channels=16, split_type=split, order=order)
    x, _ = _data(4)
    params = flow.init(jax.random.PRNGKey(20), x.shape)
    params["out"]["g"] = 0.3 * jax.random.normal(jax.random.PRNGKey(21),
                                                 params["out"]["g"].shape)
    y, ld = flow.forward(params, x)
    x_rec = flow.inverse(params, y)
    assert float(jnp.max(jnp.abs(x - x_rec))) < 1e-4
    ld_ref = autodiff_logdet(lambda v, hb: flow.forward(params, v[None])[0][0], x)
    np.testing.assert_allclose(np.asarray(ld), ld_ref, atol=5e-3)


@pytest.mark.parametrize("k,n,odd", [(3, 4, False), (3, 4, True), (1, 4, False),
                                     (3, 130, False)])
def test_wn_conv_packed_matches_plain(k, n, odd):
    """wn_conv_apply_packed (NICE's MXU-lane-packed out conv) must equal the
    plain conv emitter bit-for-tolerance, incl. non-square / even spatial."""
    from ipoke_tpu.flows.primitives import (
        wn_conv_apply,
        wn_conv_apply_packed,
        wn_conv_init,
    )

    key = jax.random.PRNGKey(33)
    k1, k2, k3 = jax.random.split(key, 3)
    cin = 24
    h, w = (7, 10) if odd else (8, 8)
    params = wn_conv_init(k1, k, k, cin, n)
    params["g"] = 0.5 * jax.random.normal(k2, params["g"].shape)
    params["b"] = 0.1 * jax.random.normal(k3, params["b"].shape)
    x = jax.random.normal(jax.random.PRNGKey(34), (2, h, w, cin))
    ref = wn_conv_apply(params, x, "SAME")
    got = wn_conv_apply_packed(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("k,odd", [(3, False), (3, True), (1, False),
                                   (2, False)])
def test_conv_im2col_matches_conv_emitter(k, odd):
    """conv_im2col (NICE's w1 path) must equal plain_conv_apply SAME."""
    from ipoke_tpu.flows.primitives import conv_im2col, plain_conv_apply

    cin, n = 30, 64
    h, w = (7, 10) if odd else (8, 8)
    wk = 0.1 * jax.random.normal(jax.random.PRNGKey(60), (k, k, cin, n))
    x = jax.random.normal(jax.random.PRNGKey(61), (2, h, w, cin))
    ref = plain_conv_apply(wk, x, padding="SAME")
    got = conv_im2col(wk, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_wn_conv_packed_bf16_accumulates_in_fp32():
    """The bench path runs bf16 params/activations; the packed conv's fp32
    accumulation must track the fp32 reference within bf16 rounding."""
    from ipoke_tpu.flows.primitives import (
        wn_conv_apply,
        wn_conv_apply_packed,
        wn_conv_init,
    )

    key = jax.random.PRNGKey(55)
    params = wn_conv_init(key, 3, 3, 256, 4)
    params["g"] = 0.5 * jax.random.normal(jax.random.PRNGKey(56),
                                          params["g"].shape)
    x = jax.random.normal(jax.random.PRNGKey(57), (2, 8, 8, 256))
    ref = wn_conv_apply(params, x, "SAME")  # fp32 reference
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), t)
    got = wn_conv_apply_packed(cast(params), cast(x))
    assert got.dtype == jnp.bfloat16
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    rel = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref))) / scale
    assert rel < 0.05, rel  # bf16 input rounding, not accumulation blowup


def test_macow_unit_roundtrip():
    flow = make_macow_unit(C, (2, 3), h_channels=HC)
    check_flow(flow, key=5, h_channels=HC, check_logdet=False)


def test_macow_step_roundtrip_and_logdet():
    flow = make_macow_step(C, (2, 3), hidden_channels=16, h_channels=HC)
    check_flow(flow, key=6, h_channels=HC, check_logdet=True)


def test_scanned_steps_match_loop():
    step = make_macow_step(C, (2, 3), hidden_channels=16, h_channels=HC)
    scanned = ScannedSteps(step, 3)
    x, h = _data(7, h_channels=HC)
    params = scanned.init(jax.random.PRNGKey(30), x.shape)
    y, ld = scanned.forward(params, x, h)
    # manual loop over unstacked params must agree
    ys, lds = x, jnp.zeros(B)
    for i in range(3):
        p_i = jax.tree_util.tree_map(lambda a: a[i], params)
        ys, l = step.forward(p_i, ys, h)
        lds = lds + l
    np.testing.assert_allclose(np.asarray(y), np.asarray(ys), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(lds), atol=1e-3)
    x_rec = scanned.inverse(params, y, h)
    assert float(jnp.max(jnp.abs(x - x_rec))) < 1e-4


def test_multiscale_internal():
    flow = MultiScaleInternal(
        num_steps=(2, 1), in_channels=C, hidden_channels=16,
        h_channels=HC, factor=4,
    )
    params, x, h, y, ld = check_flow(flow, key=8, h_channels=HC,
                                     check_logdet=True)
    assert y.shape == x.shape


def test_multiscale_ddi_statistics():
    flow = MultiScaleInternal(
        num_steps=(2, 1), in_channels=C, hidden_channels=16,
        h_channels=HC, factor=4,
    )
    x, h = _data(9, h_channels=HC)
    x = x * 2.0 + 0.7
    params = flow.init(jax.random.PRNGKey(40), x.shape)
    y, ld, new_params = flow.ddi(params, x, h)
    # after ddi, forward with the new params reproduces the ddi output,
    # and inversion still holds
    y2, ld2 = flow.forward(new_params, x, h)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-5)
    x_rec = flow.inverse(new_params, y, h)
    assert float(jnp.max(jnp.abs(x - x_rec))) < 1e-3


def test_build_from_config_dict():
    arch = {
        "flow_in_channels": C,
        "flow_mid_channels_factor": 2,
        "h_channels": HC,
        "factor": 4,
        "num_steps": [1, 1],
        "kernel_size": [2, 3],
        "transform": "affine",
        "prior_transform": "affine",
        "activation": "elu",
    }
    flow = build_macow_transformer(arch)
    check_flow(flow, key=10, h_channels=HC, check_logdet=False)


def test_trainable_mask_excludes_buffers():
    flow = make_macow_step(C, (2, 3), hidden_channels=16)
    params = flow.init(jax.random.PRNGKey(50), (B, H, W, C))
    mask = trainable_mask(params)
    leaves_p = jax.tree_util.tree_leaves_with_path(params)
    leaves_m = jax.tree_util.tree_leaves(mask)
    n_buf = sum(1 for (path, _), m in zip(leaves_p, leaves_m) if not m)
    assert n_buf >= 2  # at least the shuffle perms
    for (path, leaf), m in zip(leaves_p, leaves_m):
        is_buf = any(
            getattr(k, "key", "").startswith("buf_") for k in path
            if hasattr(k, "key")
        )
        assert m == (not is_buf)


def test_multiscale_stack_with_reshape():
    from ipoke_tpu.flows import MultiscaleStack

    flow = MultiscaleStack(
        levels=((1,), (1,)), factors=(4, 4), in_channels=8,
        mid_channels_factor=2, h_channels=HC, reshape="down",
    )
    x, h = _data(11, h_channels=HC)
    params = flow.init(jax.random.PRNGKey(60), x.shape)
    y, ld = flow.forward(params, x, h)
    assert y.shape == (B, H // 2, W // 2, 4 * C)  # space-to-depth midway
    x_rec = flow.inverse(params, y, h)
    assert float(jnp.max(jnp.abs(x - x_rec))) < 1e-3


def test_space_to_depth_roundtrip():
    from ipoke_tpu.flows import SpaceToDepth

    flow = SpaceToDepth()
    x, _ = _data(12)
    y, ld = flow.forward({}, x)
    assert y.shape == (B, H // 2, W // 2, 4 * C)
    np.testing.assert_allclose(np.asarray(flow.inverse({}, y)),
                               np.asarray(x))


def test_build_multistack_from_config():
    arch = {"flow_in_channels": C, "flow_mid_channels_factor": 2,
            "h_channels": HC, "multistack": True, "reshape": "none",
            "levels": [[1], [1]], "factors": [4, 4]}
    flow = build_macow_transformer(arch)
    check_flow(flow, key=13, h_channels=HC, check_logdet=False)


def test_multiscale_stack_output_shape_and_ddi():
    """ADVICE r1: sampling must draw z at the reshaped output shape and DDI
    must reach every block (the Flow default was a silent no-op)."""
    from ipoke_tpu.flows import MultiscaleStack

    flow = MultiscaleStack(
        levels=((1,), (1,)), factors=(4, 4), in_channels=8,
        mid_channels_factor=2, h_channels=HC, reshape="down",
    )
    assert flow.output_shape((H, W, 8)) == (H // 2, W // 2, 32)
    x, h = _data(61, h_channels=HC)
    params = flow.init(jax.random.PRNGKey(62), x.shape)
    y, ld, new = flow.ddi(params, x, h)
    assert y.shape == (B, H // 2, W // 2, 32)
    # DDI must actually change per-block params (ActNorm init from stats)
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(params["blocks"]),
                        jax.tree_util.tree_leaves(new["blocks"]))
    )
    assert changed
    # post-DDI inverse still reconstructs
    y2, _ = flow.forward(new, x, h)
    x_rec = flow.inverse(new, y2, h)
    assert float(jnp.max(jnp.abs(x - x_rec))) < 1e-3


def test_flow_conv_rewrites_gradient_parity():
    """NICE trains through conv_im2col / wn_conv_apply_packed: their VJPs
    must match the stock conv emitters."""
    from ipoke_tpu.flows.primitives import (
        conv_im2col,
        plain_conv_apply,
        wn_conv_apply,
        wn_conv_apply_packed,
        wn_conv_init,
    )

    x = jax.random.normal(jax.random.PRNGKey(70), (2, 8, 8, 30))
    w1 = 0.1 * jax.random.normal(jax.random.PRNGKey(71), (3, 3, 30, 24))
    wn = wn_conv_init(jax.random.PRNGKey(72), 3, 3, 24, 4)
    wn["g"] = 0.5 * jax.random.normal(jax.random.PRNGKey(73), wn["g"].shape)

    def loss(w1, wn, x, use_new):
        h = (conv_im2col(w1, x) if use_new
             else plain_conv_apply(w1, x, "SAME"))
        h = jax.nn.elu(h)
        out = (wn_conv_apply_packed(wn, h) if use_new
               else wn_conv_apply(wn, h, "SAME"))
        return jnp.sum(out ** 2)

    g_new = jax.grad(loss, argnums=(0, 1, 2))(w1, wn, x, True)
    g_old = jax.grad(loss, argnums=(0, 1, 2))(w1, wn, x, False)
    for a, b in zip(jax.tree_util.tree_leaves(g_new),
                    jax.tree_util.tree_leaves(g_old)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=3e-4)
