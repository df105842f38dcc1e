"""Severity-scaled PIL op bank (reference ``augmentations/augmentations.py``)
plus the transform-level policies ``train_transform.py`` selects via
``--transform_type`` (randaug / autoaug / cutout, ``:101-144``).

Ops operate on PIL images sized dynamically (the reference hardcodes
IMAGE_SIZE=32 for translate scaling; we scale by the actual image size).
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import numpy as np
from PIL import Image, ImageEnhance, ImageOps


def _level(severity: int, maxval: float) -> float:
    return float(severity) * maxval / 10.0


def autocontrast(img, severity=1):
    return ImageOps.autocontrast(img)


def equalize(img, severity=1):
    return ImageOps.equalize(img)


def posterize(img, severity=1):
    bits = 4 - int(_level(severity, 4))
    return ImageOps.posterize(img, max(1, bits))


def rotate(img, severity=1):
    deg = _level(severity, 30)
    if np.random.rand() > 0.5:
        deg = -deg
    return img.rotate(deg, resample=Image.BILINEAR)


def solarize(img, severity=1):
    return ImageOps.solarize(img, 256 - int(_level(severity, 256)))


def _affine(img, matrix):
    return img.transform(img.size, Image.AFFINE, matrix, resample=Image.BILINEAR)


def shear_x(img, severity=1):
    s = _level(severity, 0.3)
    if np.random.rand() > 0.5:
        s = -s
    return _affine(img, (1, s, 0, 0, 1, 0))


def shear_y(img, severity=1):
    s = _level(severity, 0.3)
    if np.random.rand() > 0.5:
        s = -s
    return _affine(img, (1, 0, 0, s, 1, 0))


def translate_x(img, severity=1):
    t = _level(severity, img.size[0] / 3)
    if np.random.rand() > 0.5:
        t = -t
    return _affine(img, (1, 0, t, 0, 1, 0))


def translate_y(img, severity=1):
    t = _level(severity, img.size[1] / 3)
    if np.random.rand() > 0.5:
        t = -t
    return _affine(img, (1, 0, 0, 0, 1, t))


def color(img, severity=1):
    return ImageEnhance.Color(img).enhance(0.1 + 1.8 * np.random.rand())


def contrast(img, severity=1):
    return ImageEnhance.Contrast(img).enhance(0.1 + 1.8 * np.random.rand())


def brightness(img, severity=1):
    return ImageEnhance.Brightness(img).enhance(0.1 + 1.8 * np.random.rand())


def sharpness(img, severity=1):
    return ImageEnhance.Sharpness(img).enhance(0.1 + 1.8 * np.random.rand())


# AugMix's default bank excludes the color ops that overlap ImageNet-C
# (reference ``augmentations`` list, augmentations/augmentations.py:127-131).
AUGMENTATIONS: List[Callable] = [
    autocontrast, equalize, posterize, rotate, solarize,
    shear_x, shear_y, translate_x, translate_y,
]

AUGMENTATIONS_ALL: List[Callable] = AUGMENTATIONS + [
    color, contrast, brightness, sharpness,
]


class RandAugment:
    """Apply N random ops at magnitude M (transform-level 'randaug')."""

    def __init__(self, n: int = 2, m: int = 9):
        self.n = n
        self.m = m

    def __call__(self, img: Image.Image, rng=None) -> Image.Image:
        ops = np.random.choice(len(AUGMENTATIONS_ALL), self.n)
        for oi in ops:
            img = AUGMENTATIONS_ALL[oi](img, severity=self.m)
        return img


class AutoAugmentCIFAR:
    """Compact CIFAR AutoAugment stand-in: a sampled sub-policy of two
    (op, prob, severity) stages from the published policy distribution."""

    _POLICIES = [
        [(rotate, 0.7, 2), (translate_x, 0.3, 9)],
        [(sharpness, 0.8, 1), (sharpness, 0.9, 3)],
        [(shear_y, 0.5, 8), (translate_y, 0.7, 9)],
        [(autocontrast, 0.5, 8), (equalize, 0.9, 2)],
        [(shear_y, 0.2, 7), (posterize, 0.3, 7)],
        [(color, 0.4, 3), (brightness, 0.6, 7)],
        [(sharpness, 0.3, 9), (brightness, 0.7, 9)],
        [(equalize, 0.6, 5), (equalize, 0.5, 1)],
        [(contrast, 0.6, 7), (sharpness, 0.6, 5)],
        [(color, 0.7, 7), (translate_x, 0.5, 8)],
    ]

    def __call__(self, img: Image.Image, rng=None) -> Image.Image:
        policy = self._POLICIES[np.random.randint(len(self._POLICIES))]
        for op, prob, severity in policy:
            if np.random.rand() < prob:
                img = op(img, severity=severity)
        return img


class Cutout:
    """Zero out a random square patch (transform-level 'cutout')."""

    def __init__(self, length: int = 16):
        self.length = length

    def __call__(self, arr: np.ndarray, rng=None) -> np.ndarray:
        h, w = arr.shape[:2]
        y = np.random.randint(h)
        x = np.random.randint(w)
        y1, y2 = np.clip([y - self.length // 2, y + self.length // 2], 0, h)
        x1, x2 = np.clip([x - self.length // 2, x + self.length // 2], 0, w)
        arr = arr.copy()
        arr[y1:y2, x1:x2] = 0.0
        return arr
