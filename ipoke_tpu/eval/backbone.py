"""FVD feature-backbone selection.

The reference computes FVD with a kinetics-pretrained I3D it ships
out-of-band (``utils/metrics.py:919-1170``); with no egress this repo ships
an in-repo-trained MotionFeatureNet (``nn/motion_feat.py``,
``tools/train_motion_feat.py``) as the default instead of round-1/2's
fixed-seed random I3D.  Priority:

1. ``IPOKE_I3D_WEIGHTS`` -> the real converted kinetics I3D (full parity);
2. ``IPOKE_FVD_BACKBONE=random_i3d`` -> fixed-seed random I3D (the old
   default, kept for comparisons);
3. packaged ``eval/weights/motion_feat_v1.npz`` -> trained MotionFeatureNet;
4. fallback: fixed-seed random I3D (if the packaged weights are absent).

``compute_fvd`` accepts either a tagged bundle from ``init_fvd_backbone``
or raw I3D variables (backwards compatible).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

_PACKAGED = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "weights", "motion_feat_v1.npz")


def packaged_weights_path() -> str:
    return _PACKAGED


def init_fvd_backbone(seed: int = 0, spatial: int = 64,
                      frames: int = 10) -> Dict[str, Any]:
    from .i3d import init_i3d_params

    if os.environ.get("IPOKE_I3D_WEIGHTS"):
        return {"kind": "i3d",
                "variables": init_i3d_params(seed, spatial, frames)}
    forced = os.environ.get("IPOKE_FVD_BACKBONE", "")
    if forced == "random_i3d" or (not os.path.exists(_PACKAGED)
                                  and forced != "motion_feat"):
        return {"kind": "i3d",
                "variables": init_i3d_params(seed, spatial, frames)}
    from ..nn.motion_feat import load_motion_feat

    return {"kind": "motion_feat",
            "variables": load_motion_feat(_PACKAGED, frames, spatial)}


def backbone_activations(bundle, videos, batch_size: int = 8) -> np.ndarray:
    """Feature matrix (N, D) for Frechet moments; dispatches on the bundle
    kind, accepting raw I3D variables for backwards compatibility."""
    if not (isinstance(bundle, dict) and "kind" in bundle):
        bundle = {"kind": "i3d", "variables": bundle}
    if bundle["kind"] == "motion_feat":
        from ..nn.motion_feat import motion_feat_activations

        return motion_feat_activations(bundle["variables"], videos,
                                       batch_size)
    from .i3d import i3d_activations

    return i3d_activations(bundle["variables"], videos, batch_size)
