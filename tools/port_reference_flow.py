"""Port reference MaCow cINN weights (PyTorch state dict) to this framework.

The flow engine's structure mirrors the reference 1:1 by construction
(``flows/macow.py`` vs reference ``models/modules/INN/macow2.py``), so a
trained ``MultiScaleInternal`` state dict maps exactly onto our param tree:

  layers.{i}.{j}.*        -> params[i]['steps'] (stacked over j)
  priors.{i}.*            -> params[i]['prior']
  shuffle_layers.{i}.*    -> params[i]['perm']

Layout transforms: torch conv OIHW -> HWIO; weight-norm (v, g, bias) kept as
(v HWIO, g (out,), b); ActNorm (C,1,1) -> (C,); Shuffle index buffers copied
verbatim.  ``tests/test_reference_parity.py`` golden-tests the ported weights
against the actual reference (torch, CPU) to ~1e-4 on forward outputs AND
logdets.

Usage with a real checkpoint:
    python tools/convert_torch_checkpoint.py --ckpt second_stage.ckpt --out ss.npz
    params = port_multiscale_npz("ss.npz", prefix="flow.flow.",
                                 num_steps=[...], )
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def _conv_w(w):  # OIHW -> HWIO
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _wn(state, key):
    # reference Conv2dWeightNorm wraps a Conv2d: `<key>.conv.weight_{v,g}`
    return {
        "v": _conv_w(state[f"{key}.conv.weight_v"]),
        "g": np.asarray(state[f"{key}.conv.weight_g"]).reshape(-1),
        "b": np.asarray(state[f"{key}.conv.bias"]),
    }


def _actnorm(state, key):
    return {
        "log_scale": np.asarray(state[f"{key}.log_scale"]).reshape(-1),
        "bias": np.asarray(state[f"{key}.bias"]).reshape(-1),
    }


def _shuffle(state, key):
    perm = np.asarray(state[f"{key}.forward_shuffle_idx"]).astype(np.int32)
    return {"buf_perm": perm,
            "buf_inv_perm": np.argsort(perm).astype(np.int32)}


def _masked_conv(state, key):
    return {
        "w_shift": _conv_w(state[f"{key}.net.shift_conv.weight"]),
        "out": _wn(state, f"{key}.net.conv1x1"),
    }


def _nice(state, key):
    return {
        "w1": _conv_w(state[f"{key}.net.conv1.weight"]),
        "w2": _conv_w(state[f"{key}.net.conv2.weight"]),
        "out": _wn(state, f"{key}.net.conv3"),
    }


def _macow_unit(state, key) -> List:
    """[MCF A, MCF B, ActNorm, MCF C, MCF D, ActNorm] (Chain order)."""
    return [
        _masked_conv(state, f"{key}.conv1"),
        _masked_conv(state, f"{key}.conv2"),
        _actnorm(state, f"{key}.actnorm1"),
        _masked_conv(state, f"{key}.conv3"),
        _masked_conv(state, f"{key}.conv4"),
        _actnorm(state, f"{key}.actnorm2"),
    ]


def _macow_step(state, key) -> List:
    """Chain order of flows/macow.make_macow_step."""
    return [
        _actnorm(state, f"{key}.actnorm1"),
        _shuffle(state, f"{key}.conv1x1"),
        _macow_unit(state, f"{key}.units1.0"),
        _macow_unit(state, f"{key}.units1.1"),
        _nice(state, f"{key}.coupling1_up"),
        _nice(state, f"{key}.coupling1_dn"),
        _actnorm(state, f"{key}.actnorm2"),
        _macow_unit(state, f"{key}.units2.0"),
        _macow_unit(state, f"{key}.units2.1"),
        _nice(state, f"{key}.coupling2_up"),
        _nice(state, f"{key}.coupling2_dn"),
    ]


def _prior(state, key):
    return {
        "perm": _shuffle(state, f"{key}.conv1x1"),
        "coupling": _nice(state, f"{key}.coupling"),
        "actnorm": _actnorm(state, f"{key}.actnorm"),
    }


def _stack(trees: List):
    import jax

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *trees)


def port_multiscale_state(state: Dict[str, np.ndarray], num_steps,
                          prefix: str = "") -> List:
    """state: reference ``MultiScaleInternal`` state dict (numpy values);
    returns the param list for ``flows.macow.MultiScaleInternal``."""
    if prefix:
        state = {k[len(prefix):]: v for k, v in state.items()
                 if k.startswith(prefix)}
    params = []
    for i, n in enumerate(num_steps):
        steps = [_macow_step(state, f"layers.{i}.{j}") for j in range(n)]
        params.append({
            "steps": _stack(steps),
            "prior": _prior(state, f"priors.{i}"),
            "perm": _shuffle(state, f"shuffle_layers.{i}"),
        })
    return params


def port_multiscale_npz(path: str, num_steps, prefix: str = "") -> List:
    return port_multiscale_state(dict(np.load(path)), num_steps, prefix)
