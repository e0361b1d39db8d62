"""Single-read fused SPADE GroupNorm + modulation Pallas kernel.

The r4 decode attribution (PERFORMANCE.md "Decode render attribution")
measured the four SPADE layers at 20.2 ms of the 51.1 ms shipped-scale
render — ~3x their HBM floor — and concluded the cost is the fusion
*barrier*: the cross-(H, W, C/G) GroupNorm statistics force XLA to read the
full-resolution activation once for the stats and again for the normalize,
plus the gamma/beta map reads (reference hot path:
``models/modules/autoencoders/util.py:473-500`` Spade).

This kernel removes the barrier by keeping each frame VMEM-resident:

* the (N, H, W, C) activation is viewed as (N, R, 128) rows — a
  layout-compatible (free) reshape, all 128 lanes used regardless of C;
* grid over frames: one (R, 128) frame block is auto-pipelined into VMEM
  and read from HBM exactly ONCE — stats (per-lane/phase column sums folded
  into per-group sums by tiny one-hot matmuls) and the normalize both run
  out of VMEM;
* gamma/beta (per-clip, broadcast over the T frames of a clip) and the
  output are streamed through small double-buffered DMA chunks, so the
  whole kernel fits the ~16 MB v5e VMEM even for the 128px x 64ch top
  level (4 MB/frame).

Math is identical to ``nn.blocks.spade_gn_modulate`` (fp32 fast-variance
stats with the max(0) clamp, normalize, ``*(1+gamma)+beta``); parity is
tested CPU-side in interpret mode (tests/test_pallas_ops.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _chunk_rows(R: int, P: int, min_rows: int = 8) -> int:
    """Largest DMA-chunk row count that divides R (multiple of P and the
    dtype's sublane tile: 8 rows fp32, 16 rows bf16)."""
    for cand in (1024, 512, 256, 128, 64, 32, 16, 8):
        if cand % min_rows != 0:
            continue
        if R % cand == 0 and cand % max(P, 1) == 0:
            return cand
    return 0


def _min_rows(dtype) -> int:
    return 16 if dtype == jnp.bfloat16 else 8


def kernel_supported(shape, mod_batch: int, num_groups: int, dtype) -> bool:
    n, h, w, c = shape
    if dtype not in (jnp.float32, jnp.bfloat16):
        # fp32: the original layout; bf16: the SHIPPED decode dtype (the
        # whole sampling pipeline streams bf16) — stats still fp32 in-kernel
        return False
    if c % num_groups != 0:
        return False
    if c <= LANES:
        if LANES % c != 0:
            return False
    elif c % LANES != 0:
        return False
    total = h * w * c
    if total % LANES != 0:
        return False
    R = total // LANES
    P = max(1, c // LANES)
    if _chunk_rows(R, P, _min_rows(dtype)) == 0:
        return False
    return n % mod_batch == 0


def _group_onehots(c: int, num_groups: int, P: int):
    """(fold, unfold) per phase: fold[p] (128, G) sums lane columns into
    group sums; unfold[p] (G, 128) broadcasts per-group scalars back to
    lanes.  Channel of (phase p, lane l): ``(p * 128 + l) % c`` (for
    c <= 128 the modulo folds the repeated channel pattern; for c = P*128
    it is the identity on p*128+l)."""
    cpg = c // num_groups
    folds, unfolds = [], []
    for p in range(P):
        li = jax.lax.broadcasted_iota(jnp.int32, (LANES, num_groups), 0)
        gi = jax.lax.broadcasted_iota(jnp.int32, (LANES, num_groups), 1)
        grp = ((p * LANES + li) % c) // cpg
        m = (grp == gi).astype(jnp.float32)
        folds.append(m)
        unfolds.append(m.T)
    return folds, unfolds


def _spade_gn_kernel(x_ref, g_hbm, b_hbm, out_hbm, gch, bch, och, gsem, bsem,
                     osem, *, R, C, num_groups, eps, t, CH, P):
    i = pl.program_id(0)
    clip = i // t
    nch = R // CH

    def g_dma(j, slot):
        return pltpu.make_async_copy(
            g_hbm.at[clip, pl.ds(j * CH, CH), :], gch.at[slot], gsem.at[slot])

    def b_dma(j, slot):
        return pltpu.make_async_copy(
            b_hbm.at[clip, pl.ds(j * CH, CH), :], bch.at[slot], bsem.at[slot])

    def o_dma(j, slot):
        return pltpu.make_async_copy(
            och.at[slot], out_hbm.at[i, pl.ds(j * CH, CH), :], osem.at[slot])

    # prefetch the first gamma/beta chunks while the stats pass runs
    g_dma(0, 0).start()
    b_dma(0, 0).start()

    # ---- pass 1 (VMEM-only): per-(phase, lane) column sums -> group stats
    # (static python lists per phase — in-kernel scatter/.at[] is not
    # lowerable on TPU)
    colsum = [jnp.zeros((LANES,), jnp.float32) for _ in range(P)]
    colsq = [jnp.zeros((LANES,), jnp.float32) for _ in range(P)]
    for j in range(nch):
        # bf16 inputs: stats accumulate in fp32 (flax GroupNorm semantics)
        xc = x_ref[0, j * CH:(j + 1) * CH, :].astype(jnp.float32)
        if P == 1:
            colsum[0] = colsum[0] + jnp.sum(xc, axis=0)
            colsq[0] = colsq[0] + jnp.sum(xc * xc, axis=0)
        else:
            rp = jax.lax.broadcasted_iota(jnp.int32, (CH, LANES), 0) % P
            for p in range(P):
                m = (rp == p).astype(jnp.float32)
                xm = xc * m
                colsum[p] = colsum[p] + jnp.sum(xm, axis=0)
                colsq[p] = colsq[p] + jnp.sum(xc * xm, axis=0)

    folds, unfolds = _group_onehots(C, num_groups, P)
    gs = jnp.zeros((1, num_groups), jnp.float32)
    gs2 = jnp.zeros((1, num_groups), jnp.float32)
    for p in range(P):
        # precision=HIGHEST: the TPU MXU truncates f32 operands to bf16
        # at default precision — stats folds must be exact
        gs = gs + jnp.dot(colsum[p][None], folds[p],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        gs2 = gs2 + jnp.dot(colsq[p][None], folds[p],
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    cnt = float(R * LANES // num_groups)  # elements per group in one frame
    mu_g = gs / cnt
    var_g = jnp.maximum(gs2 / cnt - mu_g * mu_g, 0.0)
    s_g = jax.lax.rsqrt(var_g + eps)
    mu_pl = [jnp.dot(mu_g, unfolds[p], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
             for p in range(P)]           # each (1, 128)
    s_pl = [jnp.dot(s_g, unfolds[p], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            for p in range(P)]

    # ---- pass 2 (VMEM-only reads): normalize + modulate, stream chunks out
    out_dmas = [None, None]
    for j in range(nch):
        slot = j % 2
        if j + 1 < nch:
            g_dma(j + 1, 1 - slot).start()
            b_dma(j + 1, 1 - slot).start()
        g_dma(j, slot).wait()
        b_dma(j, slot).wait()
        xc = x_ref[0, j * CH:(j + 1) * CH, :].astype(jnp.float32)
        if P == 1:
            mu, s = mu_pl[0], s_pl[0]
        else:
            rp = jax.lax.broadcasted_iota(jnp.int32, (CH, LANES), 0) % P
            mu = mu_pl[0] * (rp == 0) + sum(
                mu_pl[p] * (rp == p) for p in range(1, P))
            s = s_pl[0] * (rp == 0) + sum(
                s_pl[p] * (rp == p) for p in range(1, P))
        # normalized output cast to the IO dtype BEFORE the modulation —
        # exactly the portable form's bf16 semantics (nn/blocks.py)
        normed = ((xc - mu) * s).astype(och.dtype)
        res = normed * (1.0 + gch[slot]) + bch[slot]  # weak 1.0: stays bf16
        if out_dmas[slot] is not None:  # slot buffer free?
            out_dmas[slot].wait()
        och[slot] = res
        dma = o_dma(j, slot)
        dma.start()
        out_dmas[slot] = dma
    for dma in out_dmas:
        if dma is not None:
            dma.wait()


def _portable(x, gamma, beta, num_groups, eps):
    from ..nn.blocks import _spade_gn_portable  # lazy: avoids import cycle

    return _spade_gn_portable(x, gamma, beta, num_groups, eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def spade_gn_fused(x, gamma, beta, num_groups: int, eps: float):
    """Platform-dispatched fused SPADE GN+modulate with portable gradients.

    Primal (inference, the decode hot path): the Pallas kernel on TPU, the
    portable form elsewhere.  Under ``jax.grad`` the custom_vjp fwd rule
    substitutes the portable forward (identical math) so training never
    traces the kernel — ``pallas_call`` has no autodiff and SPADE sits
    inside the first-stage training graph."""
    return jax.lax.platform_dependent(
        x, gamma, beta,
        tpu=lambda xx, gg, bb: spade_gn_modulate_pallas(
            xx, gg, bb, num_groups, eps),
        default=lambda xx, gg, bb: _portable(xx, gg, bb, num_groups, eps),
    )


def _fused_fwd(x, gamma, beta, num_groups, eps):
    return _portable(x, gamma, beta, num_groups, eps), (x, gamma, beta)


def _fused_bwd(num_groups, eps, res, ct):
    x, gamma, beta = res
    _, vjp = jax.vjp(
        lambda a, g_, b_: _portable(a, g_, b_, num_groups, eps),
        x, gamma, beta)
    return vjp(ct)


spade_gn_fused.defvjp(_fused_fwd, _fused_bwd)


def spade_gn_modulate_pallas(x, gamma, beta, num_groups: int,
                             eps: float = 1e-5, interpret: bool = False):
    """Pallas single-read SPADE GN+modulate.  x (N, H, W, C) fp32 or bf16
    (the shipped decode streams bf16; stats run fp32 in-kernel either way);
    gamma and beta (BM, H, W, C) with BM | N (per-clip modulations broadcast
    over the frames of a clip).  Caller must check ``kernel_supported``."""
    n, h, w, c = x.shape
    bm = gamma.shape[0]
    t = n // bm
    R = h * w * c // LANES
    P = max(1, c // LANES)
    CH = _chunk_rows(R, P, _min_rows(x.dtype))
    x2 = x.reshape(n, R, LANES)
    g2 = gamma.astype(x.dtype).reshape(bm, R, LANES)
    b2 = beta.astype(x.dtype).reshape(bm, R, LANES)

    kern = functools.partial(
        _spade_gn_kernel, R=R, C=c, num_groups=num_groups, eps=float(eps),
        t=t, CH=CH, P=P)
    out = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # gamma, DMA-chunked
            pl.BlockSpec(memory_space=pl.ANY),   # beta, DMA-chunked
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # DMA-chunked
        out_shape=jax.ShapeDtypeStruct((n, R, LANES), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, CH, LANES), x.dtype),   # gamma chunks
            pltpu.VMEM((2, CH, LANES), x.dtype),   # beta chunks
            pltpu.VMEM((2, CH, LANES), x.dtype),   # out chunks
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x2, g2, b2)
    return out.reshape(n, h, w, c)
