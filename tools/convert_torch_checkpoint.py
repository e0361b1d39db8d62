"""Dump a PyTorch checkpoint's state dict to .npz for the JAX-side loaders.

The reference's pretrained models (first stage, encoders, cINN, VGG/I3D/LPIPS
feature nets) are torch ``.ckpt``/``.pth`` files; this environment bakes in
torch (CPU), so conversion is:

    python tools/convert_torch_checkpoint.py --ckpt model.ckpt --out model.npz
    # then load with e.g. ipoke_tpu.nn.vgg.load_torch_vgg19_npz /
    # ipoke_tpu.eval.i3d.load_torch_i3d_npz

Full weight PORTING (state-dict key surgery + layout transposes for every
module family, validated by per-module golden tests) is tracked as the
checkpoint-parity milestone (SURVEY.md §7 hard part 2); this tool is the
first, format-level step and also strips Lightning prefixes.
"""

from __future__ import annotations

import argparse

import numpy as np


def convert(ckpt_path: str, out_path: str, strip_prefixes=("model.", "module.")):
    import torch

    blob = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    state = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    out = {}
    for k, v in state.items():
        if not hasattr(v, "numpy"):
            continue
        for p in strip_prefixes:
            if k.startswith(p):
                k = k[len(p):]
        out[k] = v.detach().cpu().numpy()
    np.savez(out_path, **out)
    print(f"wrote {len(out)} tensors "
          f"({sum(a.size for a in out.values())/1e6:.1f}M params) -> {out_path}")
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args()
    convert(args.ckpt, args.out)


if __name__ == "__main__":
    main()
