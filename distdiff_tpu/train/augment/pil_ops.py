"""Severity-scaled PIL op bank (reference ``augmentations/augmentations.py``)
plus the transform-level policies ``train_transform.py`` selects via
``--transform_type`` (randaug / autoaug / cutout, ``:101-144``).

Severity semantics match the reference bank exactly: every application draws
``sample_level(n)`` — uniform in [0.1, n] — then scales by maxval/10
(``augmentations/augmentations.py:10-38``). Ops operate on PIL images sized
dynamically (the reference hardcodes IMAGE_SIZE=32 for translate scaling; we
scale by the actual image size). All ops accept an optional numpy Generator
so the seeded per-item RNG controls them; without one they fall back to the
global numpy stream.
"""

from __future__ import annotations

from typing import Callable, List

import numpy as np
from PIL import Image, ImageEnhance, ImageOps


def _rng(rng):
    return rng if rng is not None else np.random.default_rng(
        np.random.randint(2**31)
    )


def sample_level(n: float, rng=None) -> float:
    """Uniform in [0.1, n] per application (augmentations.py:36-38)."""
    return float(_rng(rng).uniform(0.1, n))


def _int_param(level: float, maxval: float) -> int:
    return int(level * maxval / 10)


def _float_param(level: float, maxval: float) -> float:
    return float(level) * maxval / 10.0


def autocontrast(img, severity=1, rng=None):
    return ImageOps.autocontrast(img)


def equalize(img, severity=1, rng=None):
    return ImageOps.equalize(img)


def posterize(img, severity=1, rng=None):
    bits = 4 - _int_param(sample_level(severity, rng), 4)
    return ImageOps.posterize(img, max(1, bits))


def rotate(img, severity=1, rng=None):
    r = _rng(rng)
    deg = _int_param(sample_level(severity, r), 30)
    if r.random() > 0.5:
        deg = -deg
    return img.rotate(deg, resample=Image.BILINEAR)


def solarize(img, severity=1, rng=None):
    return ImageOps.solarize(
        img, 256 - _int_param(sample_level(severity, rng), 256)
    )


def _affine(img, matrix):
    return img.transform(img.size, Image.AFFINE, matrix, resample=Image.BILINEAR)


def shear_x(img, severity=1, rng=None):
    r = _rng(rng)
    s = _float_param(sample_level(severity, r), 0.3)
    if r.random() > 0.5:
        s = -s
    return _affine(img, (1, s, 0, 0, 1, 0))


def shear_y(img, severity=1, rng=None):
    r = _rng(rng)
    s = _float_param(sample_level(severity, r), 0.3)
    if r.random() > 0.5:
        s = -s
    return _affine(img, (1, 0, 0, s, 1, 0))


def translate_x(img, severity=1, rng=None):
    r = _rng(rng)
    t = _int_param(sample_level(severity, r), img.size[0] / 3)
    if r.random() > 0.5:
        t = -t
    return _affine(img, (1, 0, t, 0, 1, 0))


def translate_y(img, severity=1, rng=None):
    r = _rng(rng)
    t = _int_param(sample_level(severity, r), img.size[1] / 3)
    if r.random() > 0.5:
        t = -t
    return _affine(img, (1, 0, 0, 0, 1, t))


def color(img, severity=1, rng=None):
    lv = _float_param(sample_level(severity, rng), 1.8) + 0.1
    return ImageEnhance.Color(img).enhance(lv)


def contrast(img, severity=1, rng=None):
    lv = _float_param(sample_level(severity, rng), 1.8) + 0.1
    return ImageEnhance.Contrast(img).enhance(lv)


def brightness(img, severity=1, rng=None):
    lv = _float_param(sample_level(severity, rng), 1.8) + 0.1
    return ImageEnhance.Brightness(img).enhance(lv)


def sharpness(img, severity=1, rng=None):
    lv = _float_param(sample_level(severity, rng), 1.8) + 0.1
    return ImageEnhance.Sharpness(img).enhance(lv)


# AugMix's default bank excludes the color ops that overlap ImageNet-C
# (reference ``augmentations`` list, augmentations/augmentations.py:127-131).
AUGMENTATIONS: List[Callable] = [
    autocontrast, equalize, posterize, rotate, solarize,
    shear_x, shear_y, translate_x, translate_y,
]

AUGMENTATIONS_ALL: List[Callable] = AUGMENTATIONS + [
    color, contrast, brightness, sharpness,
]


# Transform-level 'randaug'/'autoaug' are the torchvision-exact policies
# (published 25-sub-policy CIFAR-10 table, 14-op RandAugment space and
# magnitude bins) — see tv_policies.py. Re-exported here so the historical
# import surface (pil_ops.RandAugment / pil_ops.AutoAugmentCIFAR) stands.
from distdiff_tpu.train.augment.tv_policies import (  # noqa: E402,F401
    AutoAugmentCIFAR10,
    RandAugment,
)

AutoAugmentCIFAR = AutoAugmentCIFAR10


class Cutout:
    """Zero out a random square patch (transform-level 'cutout')."""

    def __init__(self, length: int = 16):
        self.length = length

    def __call__(self, arr: np.ndarray, rng=None) -> np.ndarray:
        r = _rng(rng)
        h, w = arr.shape[:2]
        y = int(r.integers(h))
        x = int(r.integers(w))
        y1, y2 = np.clip([y - self.length // 2, y + self.length // 2], 0, h)
        x1, x2 = np.clip([x - self.length // 2, x + self.length // 2], 0, w)
        arr = arr.copy()
        arr[y1:y2, x1:x2] = 0.0
        return arr
