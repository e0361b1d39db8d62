"""Port reference encoder weights (PyTorch) into this framework.

Covers the frozen sub-models of the second stage's DENSITY path:

* ``ConvEncoder`` (reference fully_conv_models.py:28-109) — the conditioner
  phi(x_0) and poke embedder phi(c) encoders.  Spectral-norm convs are
  collapsed to their effective eval-time weights (W = W_orig / sigma(u, v)),
  so the target is built with ``snorm=False``; NormConv2d's weight-norm g and
  conv bias fold into our (gamma, beta) affine.
* ``ResNetMotionEncoder`` (reference motion_encoder.py:151-244) — the frozen
  first-stage motion encoder producing z_m.

Golden-tested against the torch reference in tests/test_reference_parity.py.
The SPADE decoder (ConvTranspose crop + align_corners resize semantics) is
the remaining porting surface — see TODO.md.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def _conv_w(w):  # OIHW -> HWIO
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _conv3d_w(w):  # OIKTKHKW -> KTKHKWIO
    return np.transpose(np.asarray(w), (2, 3, 4, 1, 0))


def spectral_eval_weight(state, key):
    """Effective eval-time weight of a torch spectral_norm conv:
    W = weight_orig / (u^T W_mat v)."""
    w = np.asarray(state[f"{key}.weight_orig"])
    u = np.asarray(state[f"{key}.weight_u"])
    v = np.asarray(state[f"{key}.weight_v"])
    sigma = float(u @ w.reshape(w.shape[0], -1) @ v)
    return w / sigma


def _conv_block(state, key, snorm=True, has_norm=True):
    """Reference Conv2dBlock -> our Conv2dBlock(snorm=False) params."""
    w = spectral_eval_weight(state, f"{key}.conv") if snorm \
        else np.asarray(state[f"{key}.conv.weight"])
    out = {"Conv_0": {"kernel": _conv_w(w),
                      "bias": np.asarray(state[f"{key}.conv.bias"])}}
    if has_norm and f"{key}.norm.weight" in state:
        out["GroupNorm_0"] = {
            "scale": np.asarray(state[f"{key}.norm.weight"]),
            "bias": np.asarray(state[f"{key}.norm.bias"]),
        }
    return out


def _res_block(state, key, snorm=True, has_res_conv=True):
    out = {
        "Conv2dBlock_0": _conv_block(state, f"{key}.conv1", snorm),
        "Conv2dBlock_1": _conv_block(state, f"{key}.conv2", snorm),
    }
    if has_res_conv:
        # res_conv uses InstanceNorm (no params)
        out["Conv2dBlock_2"] = _conv_block(state, f"{key}.res_conv", snorm,
                                           has_norm=False)
    return out


def _norm_conv(state, key):
    """Reference NormConv2d (weight_norm conv + gamma/beta) -> ours
    (v, gamma, beta): gamma' = gamma*g, beta' = gamma*b + beta."""
    v = np.asarray(state[f"{key}.conv.weight_v"])
    g = np.asarray(state[f"{key}.conv.weight_g"]).reshape(-1)
    b = np.asarray(state[f"{key}.conv.bias"])
    gamma = np.asarray(state[f"{key}.gamma"]).reshape(-1)
    beta = np.asarray(state[f"{key}.beta"]).reshape(-1)
    # our NormConv2d convolves with v/||v|| then applies gamma*y + beta
    return {
        "v": _conv_w(v),
        "gamma": gamma * g,
        "beta": gamma * b + beta,
    }


def port_conv_encoder(state: Dict[str, np.ndarray], n_stages: int,
                      variational: bool = False,
                      prefix: str = "") -> Dict:
    """-> params for ``nn.encoders.ConvEncoder(..., snorm=False)``."""
    if prefix:
        state = {k[len(prefix):]: v for k, v in state.items()
                 if k.startswith(prefix)}
    params = {"Conv2dBlock_0": _conv_block(state, "model.0")}
    for i in range(1, n_stages):
        params[f"ResBlock_{i - 1}"] = _res_block(state, f"model.{i}")
    # bottleneck ResBlock (reference builds it with snorm default False);
    # res_conv present iff nf != nf_max
    has_res = f"bottleneck.0.res_conv.conv.weight" in state
    params[f"ResBlock_{n_stages - 1}"] = _res_block(
        state, "bottleneck.0", snorm=False, has_res_conv=has_res)
    if variational:
        params["NormConv2d_0"] = _norm_conv(state, "make_mu")
        params["NormConv2d_1"] = _norm_conv(state, "make_sigma")
    return params


def _basic_block3d(state, key, has_downsample):
    out = {
        "Conv_0": {"kernel": _conv3d_w(state[f"{key}.conv1.weight"])},
        "GroupNorm_0": {"scale": np.asarray(state[f"{key}.bn1.weight"]),
                        "bias": np.asarray(state[f"{key}.bn1.bias"])},
        "Conv_1": {"kernel": _conv3d_w(state[f"{key}.conv2.weight"])},
        "GroupNorm_1": {"scale": np.asarray(state[f"{key}.bn2.weight"]),
                        "bias": np.asarray(state[f"{key}.bn2.bias"])},
    }
    if has_downsample:
        out["Conv_2"] = {
            "kernel": _conv3d_w(state[f"{key}.downsample.0.weight"])}
        out["GroupNorm_2"] = {
            "scale": np.asarray(state[f"{key}.downsample.1.weight"]),
            "bias": np.asarray(state[f"{key}.downsample.1.bias"])}
    return out


def port_motion_encoder(state: Dict[str, np.ndarray],
                        prefix: str = "") -> Dict:
    """-> params for ``nn.motion.ResNetMotionEncoder`` (same layer plan)."""
    if prefix:
        state = {k[len(prefix):]: v for k, v in state.items()
                 if k.startswith(prefix)}
    params = {
        "Conv_0": {"kernel": _conv3d_w(state["conv1.weight"])},
        "GroupNorm_0": {"scale": np.asarray(state["bn1.weight"]),
                        "bias": np.asarray(state["bn1.bias"])},
    }
    blk = 0
    for layer in ("layer1", "layer2", "layer3", "layer4", "layer5"):
        j = 0
        while f"{layer}.{j}.conv1.weight" in state:
            has_ds = f"{layer}.{j}.downsample.0.weight" in state
            params[f"BasicBlock3d_{blk}"] = _basic_block3d(
                state, f"{layer}.{j}", has_ds)
            blk += 1
            j += 1
    params["Conv_1"] = {"kernel": _conv_w(state["conv_mu.weight"]),
                        "bias": np.asarray(state["conv_mu.bias"])}
    params["Conv_2"] = {"kernel": _conv_w(state["conv_var.weight"]),
                        "bias": np.asarray(state["conv_var.bias"])}
    return params


def spectral_eval_weight_any(state, key, transpose=False):
    """Spectral-norm effective weight for conv OR transpose conv: torch uses
    dim=0 for Conv and dim=1 for ConvTranspose (ambiguous to auto-detect for
    square weights — pass ``transpose`` explicitly)."""
    w = np.asarray(state[f"{key}.weight_orig"])
    u = np.asarray(state[f"{key}.weight_u"])
    v = np.asarray(state[f"{key}.weight_v"])
    dim = 1 if transpose else 0
    w_mat = np.moveaxis(w, dim, 0).reshape(w.shape[dim], -1)
    sigma = float(u @ w_mat @ v)
    return w / sigma


def _convT_w(w):  # torch (in, out, kh, kw) -> flax transpose_kernel (kh, kw, out, in)
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _conv_block_any(state, key, snorm=True, has_norm=True, transpose=False):
    if snorm:
        w = spectral_eval_weight_any(state, f"{key}.conv", transpose=transpose)
    else:
        w = np.asarray(state[f"{key}.conv.weight"])
    kernel = _convT_w(w) if transpose else _conv_w(w)
    conv_name = "ConvTranspose_0" if transpose else "Conv_0"
    out = {conv_name: {"kernel": kernel,
                       "bias": np.asarray(state[f"{key}.conv.bias"])}}
    if has_norm and f"{key}.norm.weight" in state:
        out["GroupNorm_0"] = {
            "scale": np.asarray(state[f"{key}.norm.weight"]),
            "bias": np.asarray(state[f"{key}.norm.bias"]),
        }
    return out


def _res_block_up(state, key, snorm=True):
    """Upsampling ResBlock: conv1 transpose, conv2 conv, res transpose."""
    return {
        "Conv2dTransposeBlock_0": _conv_block_any(state, f"{key}.conv1",
                                                  snorm, transpose=True),
        "Conv2dBlock_0": _conv_block_any(state, f"{key}.conv2", snorm),
        "Conv2dTransposeBlock_1": _conv_block_any(
            state, f"{key}.res_conv", snorm, has_norm=False, transpose=True),
    }


def _spade(state, key):
    def conv(k):
        return {"kernel": _conv_w(state[f"{key}.{k}.weight"]),
                "bias": np.asarray(state[f"{key}.{k}.bias"])}

    return {"Conv_0": conv("conv"), "Conv_1": conv("conv_gamma"),
            "Conv_2": conv("conv_beta")}


def port_spade_decoder(state: Dict[str, np.ndarray], n_blocks: int,
                       in_block_has_res: bool = True,
                       prefix: str = "") -> Dict:
    """Reference ``SpadeCondConvDecoder`` -> params for ours with
    ``snorm=False, torch_compat=True``."""
    if prefix:
        state = {k[len(prefix):]: v for k, v in state.items()
                 if k.startswith(prefix)}
    params = {"ResBlock_0": _res_block(state, "in_block", snorm=True,
                                       has_res_conv=in_block_has_res)}
    for i in range(n_blocks):
        params[f"ResBlock_{i + 1}"] = _res_block_up(state, f"blocks.{i}")
        params[f"Spade_{i}"] = _spade(state, f"spade_blocks.{i}")
    params["Conv2dBlock_0"] = _conv_block_any(state, "out_conv", snorm=False,
                                              has_norm=False)
    return params


def port_conv_gru(state: Dict[str, np.ndarray], n_layers: int,
                  prefix: str = "") -> Dict:
    """Reference ``ConvGRU`` -> params for ``nn.gru.ConvGRU``."""
    if prefix:
        state = {k[len(prefix):]: v for k, v in state.items()
                 if k.startswith(prefix)}
    params = {}
    for i in range(n_layers):
        params[f"cell_{i}"] = {
            gate: {"kernel": _conv_w(state[f"cells.{i}.{gate}.weight"]),
                   "bias": np.asarray(state[f"cells.{i}.{gate}.bias"])}
            for gate in ("update_gate", "reset_gate", "out_gate")
        }
    return params


def port_first_stage(state: Dict[str, np.ndarray], n_gru_layers: int,
                     n_dec_blocks: int, prefix: str = "") -> Dict:
    """Reference ``SpadeCondMotionModel`` state dict -> params for
    ``models.first_stage.FirstStageModel(torch_compat=True)``: motion
    encoder + ConvGRU + motion_bias + SPADE decoder."""
    if prefix:
        state = {k[len(prefix):]: v for k, v in state.items()
                 if k.startswith(prefix)}
    return {
        "enc_motion": port_motion_encoder(state, prefix="enc_motion."),
        "rnn": port_conv_gru(state, n_gru_layers, prefix="rnn."),
        "motion_bias": np.transpose(np.asarray(state["motion_bias"]),
                                    (0, 2, 3, 1)),
        "gen": port_spade_decoder(state, n_dec_blocks, prefix="gen."),
    }
