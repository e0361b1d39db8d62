"""Data augmentation (host-side, numpy/cv2).

Replicates the reference's coherent per-sample color and geometric transforms
(``data/base_dataset.py:694-721``): brightness/contrast/hue/saturation with
per-sample probability ``p_col``, and rotation+translation with reflect
padding at ``p_geom``.  The same sampled geometric transform is applied to
every frame AND to the flow field (with vector rotation) so poke/flow stay
consistent with the video.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class _ColorTransform:
    def __init__(self, brightness, contrast, hue, saturation):
        self.b, self.c, self.h, self.s = brightness, contrast, hue, saturation

    def __call__(self, img_u8: np.ndarray) -> np.ndarray:
        import cv2

        img = img_u8.astype(np.float32)
        img = np.clip(img * self.b, 0, 255)                      # brightness
        mean = img.mean()
        img = np.clip((img - mean) * self.c + mean, 0, 255)      # contrast
        if self.h != 0.0 or self.s != 1.0:
            hsv = cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_RGB2HSV).astype(
                np.float32
            )
            hsv[..., 0] = (hsv[..., 0] + self.h * 180.0) % 180.0
            hsv[..., 1] = np.clip(hsv[..., 1] * self.s, 0, 255)
            img = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB).astype(
                np.float32
            )
        return img.astype(np.uint8)


class ColorAugment:
    def __init__(self, config: dict):
        self.p = float(config.get("p_col", 0.0))
        self.ab = float(config.get("augment_b", 0.0))
        self.ac = float(config.get("augment_c", 0.0))
        self.ah = float(config.get("augment_h", 0.0))
        self.a_s = float(config.get("augment_s", 0.0))

    def sample(self, rng: np.random.Generator) -> Optional[_ColorTransform]:
        if rng.random() >= self.p:
            return _ColorTransform(1.0, 1.0, 0.0, 1.0)
        b = 1.0 + (rng.uniform(-self.ab, self.ab) if self.ab > 0 else 0.0)
        c = 1.0 + (rng.uniform(-self.ac, self.ac) if self.ac > 0 else 0.0)
        h = rng.uniform(-self.ah, 2 * self.ah) if self.ah > 0 else 0.0
        s = 1.0 + (rng.uniform(-self.a_s, self.a_s) if self.a_s > 0 else 0.0)
        return _ColorTransform(b, c, h, s)


class _GeomTransform:
    def __init__(self, angle_deg: float, tx: int, ty: int):
        self.angle = angle_deg
        self.tx, self.ty = tx, ty

    def _warp(self, img: np.ndarray, is_flow: bool) -> np.ndarray:
        import cv2

        h, w = img.shape[:2]
        m = cv2.getRotationMatrix2D((w / 2, h / 2), self.angle, 1.0)
        m[0, 2] += self.tx
        m[1, 2] += self.ty
        border = cv2.BORDER_REFLECT if not is_flow else cv2.BORDER_CONSTANT
        out = cv2.warpAffine(
            img, m, (w, h), flags=cv2.INTER_LINEAR, borderMode=border
        )
        return out

    def __call__(self, img: np.ndarray) -> np.ndarray:
        return self._warp(img, is_flow=False)

    def apply_flow(self, flow: np.ndarray) -> np.ndarray:
        """Warp the flow field and rotate the vectors with it."""
        out = self._warp(flow, is_flow=True)
        rad = np.deg2rad(self.angle)
        c, s = np.cos(rad), np.sin(rad)
        fx = c * out[..., 0] + s * out[..., 1]
        fy = -s * out[..., 0] + c * out[..., 1]
        return np.stack([fx, fy], axis=-1)


class GeometricAugment:
    def __init__(self, config: dict):
        self.p = float(config.get("p_geom", 0.0))
        self.deg = float(config.get("aug_deg", 0.0))
        self.trans = tuple(config.get("aug_trans", (0.0, 0.0)))
        self.size = tuple(config["spatial_size"])

    def sample(self, rng: np.random.Generator) -> Optional[_GeomTransform]:
        if rng.random() >= self.p:
            return _GeomTransform(0.0, 0, 0)
        ang = rng.uniform(-self.deg, self.deg) if self.deg > 0 else 0.0
        ty = (int(rng.integers(-int(self.trans[0] * self.size[1] / 2),
                               int(self.trans[0] * self.size[1] / 2) + 1))
              if self.trans[0] > 0 else 0)
        tx = (int(rng.integers(-int(self.trans[1] * self.size[0] / 2),
                               int(self.trans[1] * self.size[0] / 2) + 1))
              if self.trans[1] > 0 else 0)
        return _GeomTransform(ang, tx, ty)
