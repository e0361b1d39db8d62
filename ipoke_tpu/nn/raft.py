"""RAFT optical-flow estimator (Teed & Deng, ECCV 2020) — the learned
replacement for the reference's FlowNet2 CUDA stack (reference
``utils/flownet_loader.py:13-77`` loads a FlowNet2 checkpoint + CUDA
correlation/resample ops to produce the ``*.flow.npy`` prep artifacts;
here the same artifact contract is served by a TPU-native JAX RAFT).

TPU-first design notes:
* the recurrent refinement is ONE ``lax.scan`` over a fixed iteration count
  (static shapes, single compilation) rather than a Python loop;
* all-pairs correlation is a single batched matmul (MXU) + 4-level
  avg-pool pyramid; the per-iteration window lookup is a vectorized
  bilinear gather;
* layout is NHWC throughout; convs are plain ``flax.linen.Conv`` so XLA
  fuses the elementwise chains.

Weight compatibility: module/parameter naming mirrors the official RAFT
release (``fnet``/``cnet``/``update_block`` with BasicMotionEncoder +
SepConvGRU + flow/mask heads), and ``load_torch_raft_npz`` converts a dumped
``raft-things``/``raft-small``-style state_dict (npz via
tools/convert_torch_checkpoint.py).  Without weights (no egress) the
estimator can be trained from scratch — ``train_raft_synthetic`` +
tests/test_raft.py prove the pipeline learns real displacements.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# ---------------------------------------------------------------------------
# Encoders
# ---------------------------------------------------------------------------


class _Norm(nn.Module):
    """norm_fn dispatch matching the official encoders: 'instance' (fnet),
    'batch' (cnet; frozen inference-mode stats like eval/i3d.py), 'none'."""

    kind: str

    @nn.compact
    def __call__(self, x):
        if self.kind == "instance":
            # InstanceNorm(affine=False) == GroupNorm(G=C) without scale/bias
            m = jnp.mean(x, axis=(1, 2), keepdims=True)
            v = jnp.var(x, axis=(1, 2), keepdims=True)
            return (x - m) * jax.lax.rsqrt(v + 1e-5)
        if self.kind == "batch":
            return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                                name="bn")(x)
        return x


class _ResUnit(nn.Module):
    planes: int
    stride: int = 1
    norm: str = "instance"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    dtype=self.dtype, name="conv1")(x)
        y = jax.nn.relu(_Norm(self.norm, name="norm1")(y))
        y = nn.Conv(self.planes, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(y)
        y = jax.nn.relu(_Norm(self.norm, name="norm2")(y))
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride,
                        dtype=self.dtype, name="downsample")(x)
            x = _Norm(self.norm, name="norm3")(x)
        return jax.nn.relu(x + y)


class BasicEncoder(nn.Module):
    """1/8-resolution feature tower (official BasicEncoder): 7x7 s2 stem +
    3 residual stages (s1, s2, s2) + output 1x1."""

    output_dim: int = 256
    norm: str = "instance"
    base: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.base, (7, 7), strides=2, padding=3,
                    dtype=self.dtype, name="conv1")(x)
        h = jax.nn.relu(_Norm(self.norm, name="norm1")(h))
        widths = (self.base, int(self.base * 1.5), self.base * 2)
        for i, w in enumerate(widths):
            stride = 1 if i == 0 else 2
            h = _ResUnit(w, stride, self.norm, self.dtype,
                         name=f"layer{i + 1}_0")(h)
            h = _ResUnit(w, 1, self.norm, self.dtype,
                         name=f"layer{i + 1}_1")(h)
        return nn.Conv(self.output_dim, (1, 1), dtype=self.dtype,
                       name="conv2")(h)


# ---------------------------------------------------------------------------
# Correlation pyramid + lookup
# ---------------------------------------------------------------------------


def corr_pyramid(fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                 num_levels: int = 4) -> Sequence[jnp.ndarray]:
    """All-pairs correlation (B, H, W, H, W)/sqrt(D) + avg-pool pyramid over
    the LAST two (target) dims — one big MXU matmul, like the official
    CorrBlock but without the CUDA alt_corr kernel."""
    B, H, W, D = fmap1.shape
    corr = jnp.einsum("bxyd,buvd->bxyuv", fmap1, fmap2) / jnp.sqrt(
        jnp.asarray(D, fmap1.dtype))
    levels = [corr.reshape(B * H * W, H, W, 1)]
    for _ in range(num_levels - 1):
        levels.append(nn.avg_pool(levels[-1], (2, 2), strides=(2, 2)))
    return levels


def bilinear_sample(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """img (N, H, W, C), coords (N, P, 2) as (x, y) -> (N, P, C); zero
    padding outside (matches F.grid_sample(..., padding_mode='zeros',
    align_corners=True) on unnormalized coords)."""
    N, H, W, C = img.shape
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def gather(xi, yi):
        inb = ((xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1))
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        flat = img.reshape(N, H * W, C)
        idx = yc * W + xc
        out = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return out * inb[..., None]

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    return ((1 - wy)[..., None] * ((1 - wx)[..., None] * v00
                                  + wx[..., None] * v01)
            + wy[..., None] * ((1 - wx)[..., None] * v10
                               + wx[..., None] * v11))


def corr_lookup(levels: Sequence[jnp.ndarray], coords: jnp.ndarray,
                radius: int = 4) -> jnp.ndarray:
    """Sample a (2r+1)^2 window around ``coords/2^l`` at every pyramid level.

    coords (B, H, W, 2) in source-resolution pixels -> (B, H, W, L*(2r+1)^2).
    """
    B, H, W, _ = coords.shape
    r = radius
    # 'ij' indexing: channel c = i*(2r+1)+j samples offset (x+o[i], y+o[j]) —
    # the official CorrBlock's meshgrid(dy, dx) enumeration, kept so ported
    # convc1 weights see the window channels in the same order
    d = jnp.stack(jnp.meshgrid(jnp.arange(-r, r + 1), jnp.arange(-r, r + 1),
                               indexing="ij"), axis=-1).reshape(-1, 2)
    out = []
    flat_coords = coords.reshape(B * H * W, 1, 2)
    for lvl, corr in enumerate(levels):
        c = flat_coords / (2.0 ** lvl) + d[None].astype(coords.dtype)
        out.append(bilinear_sample(corr, c).reshape(B, H, W, -1))
    return jnp.concatenate(out, axis=-1)


# ---------------------------------------------------------------------------
# Update block
# ---------------------------------------------------------------------------


class BasicMotionEncoder(nn.Module):
    corr_planes: int
    dtype: Any = None

    @nn.compact
    def __call__(self, flow, corr):
        c = jax.nn.relu(nn.Conv(256, (1, 1), dtype=self.dtype,
                                name="convc1")(corr))
        c = jax.nn.relu(nn.Conv(192, (3, 3), padding=1, dtype=self.dtype,
                                name="convc2")(c))
        f = jax.nn.relu(nn.Conv(128, (7, 7), padding=3, dtype=self.dtype,
                                name="convf1")(flow))
        f = jax.nn.relu(nn.Conv(64, (3, 3), padding=1, dtype=self.dtype,
                                name="convf2")(f))
        out = jax.nn.relu(nn.Conv(128 - 2, (3, 3), padding=1,
                                  dtype=self.dtype,
                                  name="conv")(jnp.concatenate([c, f], -1)))
        return jnp.concatenate([out, flow], axis=-1)


class SepConvGRU(nn.Module):
    hidden_dim: int = 128
    dtype: Any = None

    def _gru(self, h, x, tag, ksize):
        hx = jnp.concatenate([h, x], axis=-1)
        pad = (ksize[0] // 2, ksize[1] // 2)
        z = jax.nn.sigmoid(nn.Conv(self.hidden_dim, ksize, padding=pad,
                                   dtype=self.dtype, name=f"convz{tag}")(hx))
        r = jax.nn.sigmoid(nn.Conv(self.hidden_dim, ksize, padding=pad,
                                   dtype=self.dtype, name=f"convr{tag}")(hx))
        q = jnp.tanh(nn.Conv(
            self.hidden_dim, ksize, padding=pad, dtype=self.dtype,
            name=f"convq{tag}")(jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q

    @nn.compact
    def __call__(self, h, x):
        h = self._gru(h, x, "1", (1, 5))
        h = self._gru(h, x, "2", (5, 1))
        return h


class BasicUpdateBlock(nn.Module):
    corr_planes: int
    hidden_dim: int = 128
    learn_upsample: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        m = BasicMotionEncoder(self.corr_planes, self.dtype,
                               name="encoder")(flow, corr)
        net = SepConvGRU(self.hidden_dim, self.dtype, name="gru")(
            net, jnp.concatenate([inp, m], axis=-1))
        f = jax.nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype,
                                name="flow_head_conv1")(net))
        dflow = nn.Conv(2, (3, 3), padding=1, dtype=self.dtype,
                        name="flow_head_conv2")(f)
        mask = None
        if self.learn_upsample:
            u = jax.nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype,
                                    name="mask_conv1")(net))
            mask = 0.25 * nn.Conv(64 * 9, (1, 1), dtype=self.dtype,
                                  name="mask_conv2")(u)
        return net, dflow, mask


# ---------------------------------------------------------------------------
# RAFT
# ---------------------------------------------------------------------------


def convex_upsample(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Learned 8x upsampling: per-pixel convex combination over the 3x3
    coarse neighborhood (official upsample_flow)."""
    B, H, W, _ = flow.shape
    m = mask.reshape(B, H, W, 9, 8, 8)
    m = jax.nn.softmax(m, axis=3)
    # 3x3 neighborhoods of the (scaled) coarse flow
    f = jnp.pad(flow * 8.0, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack([
        f[:, dy:dy + H, dx:dx + W] for dy in range(3) for dx in range(3)
    ], axis=3)  # (B, H, W, 9, 2)
    up = jnp.einsum("bhwkuv,bhwkc->bhwuvc", m, neigh)
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * 8, W * 8, 2)


def _coords_grid(B, H, W, dtype):
    g = jnp.stack(jnp.meshgrid(jnp.arange(W), jnp.arange(H), indexing="xy"),
                  axis=-1).astype(dtype)
    return jnp.broadcast_to(g, (B, H, W, 2))


@dataclasses.dataclass
class RAFTConfig:
    hidden_dim: int = 128
    context_dim: int = 128
    feature_dim: int = 256
    corr_levels: int = 4
    corr_radius: int = 4
    iters: int = 12
    base: int = 64  # encoder width; 32 -> a "small" variant
    dtype: Any = None


class _RefineStep(nn.Module):
    """One GRU refinement iteration, shaped for ``nn.scan`` (params broadcast
    across iterations == the official weight-tied update block)."""

    cfg: RAFTConfig

    @nn.compact
    def __call__(self, carry, _):
        cfg = self.cfg
        net, flow, inp, coords0, levels = carry
        corr = corr_lookup(levels, coords0 + flow, cfg.corr_radius)
        net, dflow, mask = BasicUpdateBlock(
            cfg.corr_levels * (2 * cfg.corr_radius + 1) ** 2,
            cfg.hidden_dim, dtype=cfg.dtype, name="update_block",
        )(net, inp, corr, flow)
        flow = flow + dflow
        up = convex_upsample(flow, mask)
        return (net, flow, inp, coords0, levels), (flow, up)


class RAFT(nn.Module):
    """images in [-1, 1] NHWC, spatial dims divisible by 8 -> flow (B,H,W,2)
    in pixels (positive x right, y down — same convention as the prep
    ``.flow.npy`` artifacts)."""

    cfg: RAFTConfig = dataclasses.field(default_factory=RAFTConfig)

    @nn.compact
    def __call__(self, image1, image2, iters: Optional[int] = None,
                 with_intermediate: bool = False):
        cfg = self.cfg
        iters = iters or cfg.iters
        fnet = BasicEncoder(cfg.feature_dim, "instance", cfg.base,
                            cfg.dtype, name="fnet")
        cnet = BasicEncoder(cfg.hidden_dim + cfg.context_dim, "batch",
                            cfg.base, cfg.dtype, name="cnet")
        f12 = fnet(jnp.concatenate([image1, image2], axis=0))
        fmap1, fmap2 = jnp.split(f12, 2, axis=0)
        levels = tuple(corr_pyramid(fmap1, fmap2, cfg.corr_levels))

        c = cnet(image1)
        net = jnp.tanh(c[..., : cfg.hidden_dim])
        inp = jax.nn.relu(c[..., cfg.hidden_dim:])

        B, H, W, _ = fmap1.shape
        coords0 = _coords_grid(B, H, W, fmap1.dtype)

        # one scan over the refinement iterations: single trace/compile
        # regardless of iters (vs the reference stack's Python loop)
        scan = nn.scan(
            _RefineStep, variable_broadcast="params",
            split_rngs={"params": False}, length=iters,
        )
        carry = (net, jnp.zeros_like(coords0), inp, coords0, levels)
        _, (flows, ups) = scan(cfg, name="refine")(carry, None)
        final = ups[-1]
        if with_intermediate:
            return final, (flows, ups)
        return final


def init_raft(rng, spatial: int = 64, cfg: Optional[RAFTConfig] = None):
    cfg = cfg or RAFTConfig()
    model = RAFT(cfg)
    x = jnp.zeros((1, spatial, spatial, 3))
    variables = model.init(rng, x, x, iters=1)
    return model, variables


# ---------------------------------------------------------------------------
# Training (synthetic self-supervision / fine-tuning without egress)
# ---------------------------------------------------------------------------


def sequence_loss(flow_preds_up, flow_gt, gamma: float = 0.8):
    """Exponentially-weighted L1 over iteration outputs (official RAFT
    sequence_loss)."""
    n = flow_preds_up.shape[0]
    w = gamma ** jnp.arange(n - 1, -1, -1)
    l1 = jnp.mean(jnp.abs(flow_preds_up - flow_gt[None]), axis=(1, 2, 3, 4))
    return jnp.sum(w * l1)


def make_raft_train_step(model: RAFT, tx):
    """Frozen-BN training (the cnet running stats stay at init; the affine
    scale/bias still learns — sufficient for fine-tuning/synthetic runs)."""

    def train_step(params, stats, opt, batch, _rng):
        def loss_fn(p):
            final, (flows, ups) = model.apply(
                {"params": p, "batch_stats": stats}, batch["image1"],
                batch["image2"], with_intermediate=True)
            loss = sequence_loss(ups, batch["flow"])
            epe = jnp.mean(jnp.linalg.norm(final - batch["flow"], axis=-1))
            return loss, epe

        (loss, epe), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        import optax

        upd, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, upd)
        return params, stats, opt, {"loss": loss, "epe": epe}

    return jax.jit(train_step)


def synthetic_flow_batch(rng: np.random.Generator, batch: int, size: int,
                         max_shift: float = 6.0):
    """Random textured images + random global translations: ground-truth
    flow for smoke-training the estimator without any dataset."""
    import cv2

    imgs1, imgs2, flows = [], [], []
    for _ in range(batch):
        base = rng.normal(size=(size * 2, size * 2, 3)).astype(np.float32)
        base = cv2.GaussianBlur(base, (0, 0), 3.0)
        base = (base - base.min()) / (np.ptp(base) + 1e-6) * 2 - 1
        dx, dy = rng.uniform(-max_shift, max_shift, size=2)
        q = size // 2
        M = np.float32([[1, 0, -dx], [0, 1, -dy]])
        shifted = cv2.warpAffine(base, M, (size * 2, size * 2))
        imgs1.append(base[q: q + size, q: q + size])
        imgs2.append(shifted[q: q + size, q: q + size])
        flows.append(np.full((size, size, 2), (dx, dy), np.float32))
    return {"image1": jnp.asarray(np.stack(imgs1)),
            "image2": jnp.asarray(np.stack(imgs2)),
            "flow": jnp.asarray(np.stack(flows))}


def train_raft_synthetic(steps: int = 400, size: int = 32, batch: int = 8,
                         lr: float = 1e-3, seed: int = 0,
                         cfg: Optional[RAFTConfig] = None, log_every: int = 50):
    """From-scratch smoke training on synthetic translations; returns
    (model, variables, last_epe).  Defaults tuned on CPU: EPE < 1.5 by
    ~350 steps (global-norm clipping matters — the early sequence loss has
    huge gradients)."""
    import optax

    cfg = cfg or RAFTConfig(base=32, feature_dim=96, hidden_dim=64,
                            context_dim=64, corr_levels=2, corr_radius=3,
                            iters=4)
    model, variables = init_raft(jax.random.PRNGKey(seed), size, cfg)
    params, stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(lr, weight_decay=1e-5))
    opt = tx.init(params)
    step_fn = make_raft_train_step(model, tx)
    rng = np.random.default_rng(seed)
    epe = float("inf")
    for i in range(steps):
        batch_data = synthetic_flow_batch(rng, batch, size, max_shift=4.0)
        params, stats, opt, log = step_fn(params, stats, opt, batch_data,
                                          None)
        if log_every and (i + 1) % log_every == 0:
            epe = float(log["epe"])
            print(f"raft step {i + 1}: loss={float(log['loss']):.3f} "
                  f"epe={epe:.3f}")
    return model, {"params": params, "batch_stats": stats}, float(log["epe"])


# ---------------------------------------------------------------------------
# Self-supervised fine-tuning (no labels, no torch checkpoint)
#
# The reference's prep pipeline depends on pretrained FlowNet2 CUDA weights
# (ref models/flownet2/*); this is the egress-free alternative: fine-tune
# the JAX RAFT on raw clip pairs with a photometric warp loss + edge-aware
# smoothness (UnFlow/SelFlow-style, simplified — charbonnier data term,
# out-of-bounds pixels masked instead of occlusion-reasoned).
# ---------------------------------------------------------------------------


def warp_image(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward warp: out(x) = img(x + flow(x)).  img/flow (B, H, W, C/2)."""
    B, H, W, C = img.shape
    gx, gy = jnp.meshgrid(jnp.arange(W), jnp.arange(H))
    base = jnp.stack([gx, gy], axis=-1).astype(flow.dtype)  # (H, W, (x,y))
    coords = base[None] + flow
    return bilinear_sample(img, coords.reshape(B, H * W, 2)).reshape(
        B, H, W, C)


def _charbonnier(x, eps: float = 1e-3):
    return jnp.sqrt(x * x + eps * eps)


def photometric_selfsup_loss(flow_preds_up, image1, image2,
                             gamma: float = 0.8,
                             smooth_weight: float = 0.1,
                             edge_scale: float = 10.0):
    """Exponentially-weighted self-supervised loss over iteration outputs:
    charbonnier photometric error of image1 warped by the predicted flow vs
    image2 — the training-target convention ``image1(x + f(x)) == image2(x)``
    established by ``synthetic_flow_batch``/``sequence_loss`` — with
    out-of-bounds samples masked, + first-order smoothness downweighted at
    image edges."""
    n = flow_preds_up.shape[0]
    w = gamma ** jnp.arange(n - 1, -1, -1)
    B, H, W, _ = image1.shape
    gx, gy = jnp.meshgrid(jnp.arange(W), jnp.arange(H))
    base = jnp.stack([gx, gy], axis=-1).astype(image1.dtype)
    idx = jnp.mean(jnp.abs(image2[:, :, 1:] - image2[:, :, :-1]), axis=-1,
                   keepdims=True)
    idy = jnp.mean(jnp.abs(image2[:, 1:] - image2[:, :-1]), axis=-1,
                   keepdims=True)

    def one(flow):
        coords = base[None] + flow
        inb = ((coords[..., 0] >= 0) & (coords[..., 0] <= W - 1)
               & (coords[..., 1] >= 0) & (coords[..., 1] <= H - 1))
        warped = warp_image(image1, flow)
        photo = jnp.sum(
            _charbonnier(warped - image2) * inb[..., None]
        ) / (jnp.sum(inb) * image1.shape[-1] + 1e-6)
        fdx = flow[:, :, 1:] - flow[:, :, :-1]
        fdy = flow[:, 1:] - flow[:, :-1]
        smooth = (jnp.mean(jnp.abs(fdx) * jnp.exp(-edge_scale * idx))
                  + jnp.mean(jnp.abs(fdy) * jnp.exp(-edge_scale * idy)))
        return photo + smooth_weight * smooth

    losses = jax.vmap(one)(flow_preds_up)
    return jnp.sum(w * losses)


def make_raft_selfsup_step(model: RAFT, tx, gamma: float = 0.8,
                           smooth_weight: float = 0.1):
    """Label-free train step: batches carry only image1/image2 pairs."""
    import optax

    def train_step(params, stats, opt, batch, _rng):
        def loss_fn(p):
            final, (flows, ups) = model.apply(
                {"params": p, "batch_stats": stats}, batch["image1"],
                batch["image2"], with_intermediate=True)
            loss = photometric_selfsup_loss(
                ups, batch["image1"], batch["image2"], gamma, smooth_weight)
            return loss, final

        (loss, final), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        upd, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, upd)
        return params, stats, opt, {"loss": loss, "final": final}

    return jax.jit(train_step)


def finetune_raft_selfsup(model: RAFT, variables, batches, steps: int = 200,
                          lr: float = 2e-4, smooth_weight: float = 0.1,
                          log_every: int = 0):
    """Fine-tune (or train from scratch) on an iterator/callable of
    ``{"image1", "image2"}`` batches — e.g. consecutive frames of the target
    dataset's clips — and return updated variables.

    ``batches`` is either an iterable of batch dicts or a callable
    ``step_idx -> batch``.  Global-norm clipping + AdamW as in the
    supervised recipe."""
    import optax

    params = variables["params"]
    stats = variables.get("batch_stats", {})
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(lr, weight_decay=1e-5))
    opt = tx.init(params)
    step_fn = make_raft_selfsup_step(model, tx, smooth_weight=smooth_weight)
    get = batches if callable(batches) else (
        lambda i, _it=iter(batches): next(_it))
    log = {}
    for i in range(steps):
        batch = get(i)
        params, stats, opt, log = step_fn(params, stats, opt, batch, None)
        if log_every and (i + 1) % log_every == 0:
            print(f"raft selfsup step {i + 1}: "
                  f"loss={float(log['loss']):.4f}")
    return {"params": params, "batch_stats": stats}, log


# ---------------------------------------------------------------------------
# torch weight conversion + prep-estimator registration
# ---------------------------------------------------------------------------


def _cw(w):  # torch conv (out, in, kh, kw) -> flax (kh, kw, in, out)
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def convert_torch_raft(state: dict) -> dict:
    """Official RAFT state_dict (numpy leaves, ``module.`` prefix stripped)
    -> flax variables.  Covers fnet/cnet BasicEncoder (instance/batch norm),
    BasicMotionEncoder, SepConvGRU, flow head, upsample mask head."""
    P: dict = {}
    S: dict = {}

    def put(tree, path, leaf):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = jnp.asarray(leaf)

    def conv(dst, src, bias=True):
        put(P, dst + ["kernel"], _cw(state[f"{src}.weight"]))
        if bias and f"{src}.bias" in state:
            put(P, dst + ["bias"], np.asarray(state[f"{src}.bias"]))

    def bn(dst, src):
        put(P, dst + ["bn", "scale"], np.asarray(state[f"{src}.weight"]))
        put(P, dst + ["bn", "bias"], np.asarray(state[f"{src}.bias"]))
        put(S, dst + ["bn", "mean"], np.asarray(state[f"{src}.running_mean"]))
        put(S, dst + ["bn", "var"], np.asarray(state[f"{src}.running_var"]))

    for enc in ("fnet", "cnet"):
        has_bn = f"{enc}.norm1.running_mean" in state
        conv([enc, "conv1"], f"{enc}.conv1")
        if has_bn:
            bn([enc, "norm1"], f"{enc}.norm1")
        for li in (1, 2, 3):
            for bi in (0, 1):
                t = f"{enc}.layer{li}.{bi}"
                d = [enc, f"layer{li}_{bi}"]
                conv(d + ["conv1"], f"{t}.conv1")
                conv(d + ["conv2"], f"{t}.conv2")
                if has_bn:
                    bn(d + ["norm1"], f"{t}.norm1")
                    bn(d + ["norm2"], f"{t}.norm2")
                if f"{t}.downsample.0.weight" in state:
                    conv(d + ["downsample"], f"{t}.downsample.0")
                    if has_bn:
                        # official BasicEncoder registers the downsample norm
                        # both as .norm3 and inside the Sequential (.1)
                        src = (f"{t}.downsample.1"
                               if f"{t}.downsample.1.weight" in state
                               else f"{t}.norm3")
                        bn(d + ["norm3"], src)
        conv([enc, "conv2"], f"{enc}.conv2")
    u = "update_block"
    d = ["refine", "update_block"]  # scanned wrapper (params broadcast)
    for name in ("convc1", "convc2", "convf1", "convf2", "conv"):
        conv(d + ["encoder", name], f"{u}.encoder.{name}")
    for name in ("convz1", "convr1", "convq1", "convz2", "convr2", "convq2"):
        conv(d + ["gru", name], f"{u}.gru.{name}")
    conv(d + ["flow_head_conv1"], f"{u}.flow_head.conv1")
    conv(d + ["flow_head_conv2"], f"{u}.flow_head.conv2")
    if f"{u}.mask.0.weight" in state:
        conv(d + ["mask_conv1"], f"{u}.mask.0")
        conv(d + ["mask_conv2"], f"{u}.mask.2")
    return {"params": P, "batch_stats": S}


def load_torch_raft_npz(path: str) -> dict:
    """npz of an official RAFT checkpoint state_dict (strip the DataParallel
    ``module.`` prefix when dumping) -> flax variables.

    Acquisition (no egress here): download ``raft-things.pth`` from the
    official RAFT release, ``python tools/convert_torch_checkpoint.py
    --ckpt raft-things.pth --out raft.npz``, point ``IPOKE_RAFT_WEIGHTS`` at
    the npz."""
    raw = np.load(path)
    state = {k[len("module."):] if k.startswith("module.") else k: raw[k]
             for k in raw.files}
    return convert_torch_raft(state)


_RAFT_CACHE: dict = {}


def raft_estimator(img1: np.ndarray, img2: np.ndarray) -> np.ndarray:
    """Prep flow-estimator entry (same contract as ``prep._farneback``:
    uint8 RGB HWC pair -> float32 (2, H, W)).  Uses ``IPOKE_RAFT_WEIGHTS``
    when set; otherwise a fixed-seed net (artifact-contract testing only).

    Pads to a multiple of 8 like the reference pipeline crops to /64
    (flownet_loader.py:54-56)."""
    import os

    H, W = img1.shape[:2]
    ph, pw = (-H) % 8, (-W) % 8
    key = (H + ph, W + pw)
    if key not in _RAFT_CACHE:
        wpath = os.environ.get("IPOKE_RAFT_WEIGHTS")
        if wpath:
            model = RAFT(RAFTConfig())
            variables = load_torch_raft_npz(wpath)
        else:
            model, variables = init_raft(jax.random.PRNGKey(0), key[0])
        fn = jax.jit(lambda v, a, b: model.apply(v, a, b))
        _RAFT_CACHE[key] = (fn, variables)
    fn, variables = _RAFT_CACHE[key]

    def prep(im):
        x = im.astype(np.float32) / 127.5 - 1.0
        return np.pad(x, ((0, ph), (0, pw), (0, 0)), mode="edge")[None]

    flow = np.asarray(fn(variables, jnp.asarray(prep(img1)),
                         jnp.asarray(prep(img2))))[0, :H, :W]
    return np.transpose(flow, (2, 0, 1)).astype(np.float32)
