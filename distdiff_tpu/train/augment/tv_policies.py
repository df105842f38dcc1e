"""torchvision-exact AutoAugment (CIFAR-10 policy) and RandAugment.

The reference's ``--transform_type autoaug``/``randaug`` delegate to
``torchvision.transforms.AutoAugment(AutoAugmentPolicy.CIFAR10)`` and
``torchvision.transforms.RandAugment()`` (``/root/reference/
train_transform.py:101-144``). torchvision is not installed in this image,
so this module re-implements both *exactly*:

- the 25-sub-policy CIFAR-10 AutoAugment table (Cubuk et al. 2019, as
  shipped in ``torchvision/transforms/autoaugment.py``),
- torchvision's ``_augmentation_space`` magnitude bins (10 bins for
  AutoAugment, ``num_magnitude_bins`` (default 31) for RandAugment, with
  its 14-op space including Identity),
- torchvision's ``_apply_op`` PIL semantics: enhancement ops as
  ``enhance(1 + magnitude)``, shear as the PIL affine matrix
  ``(1, m, 0, 0, 1, 0)`` (torchvision passes ``degrees(atan(m))`` with
  ``center=[0, 0]``, whose inverse matrix reduces to exactly that),
  integer-truncated translations of up to ``150/331`` of the image size,
  NEAREST resampling, zero fill.

Randomness comes from a caller-supplied numpy ``Generator`` (the same
seeded per-item stream the rest of ``train/augment`` uses), so outputs are
reproducible; the *distribution* (which op, sign flip with p=1/2,
application probability) matches torchvision's torch-RNG draws.

Golden-tested against the published tables in
``tests/test_tv_policies.py``.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageEnhance, ImageOps


# --------------------------------------------------------------------------
# The published CIFAR-10 policy: 25 sub-policies of two
# (op_name, probability, magnitude_bin) stages; bin is None for
# parameterless ops. Verbatim torchvision AutoAugmentPolicy.CIFAR10.
# --------------------------------------------------------------------------
CIFAR10_POLICY: List[Tuple[Tuple[str, float, Optional[int]],
                           Tuple[str, float, Optional[int]]]] = [
    (("Invert", 0.1, None), ("Contrast", 0.2, 6)),
    (("Rotate", 0.7, 2), ("TranslateX", 0.3, 9)),
    (("Sharpness", 0.8, 1), ("Sharpness", 0.9, 3)),
    (("ShearY", 0.5, 8), ("TranslateY", 0.7, 9)),
    (("AutoContrast", 0.5, None), ("Equalize", 0.9, None)),
    (("ShearY", 0.2, 7), ("Posterize", 0.3, 7)),
    (("Color", 0.4, 3), ("Brightness", 0.6, 7)),
    (("Sharpness", 0.3, 9), ("Brightness", 0.7, 9)),
    (("Equalize", 0.6, None), ("Equalize", 0.5, None)),
    (("Contrast", 0.6, 7), ("Sharpness", 0.6, 5)),
    (("Color", 0.7, 7), ("TranslateX", 0.5, 8)),
    (("Equalize", 0.3, None), ("AutoContrast", 0.4, None)),
    (("TranslateY", 0.4, 3), ("Sharpness", 0.2, 6)),
    (("Brightness", 0.9, 6), ("Color", 0.2, 8)),
    (("Solarize", 0.5, 2), ("Invert", 0.0, None)),
    (("Equalize", 0.2, None), ("AutoContrast", 0.6, None)),
    (("Equalize", 0.2, None), ("Equalize", 0.6, None)),
    (("Color", 0.9, 9), ("Equalize", 0.6, None)),
    (("AutoContrast", 0.8, None), ("Solarize", 0.2, 8)),
    (("Brightness", 0.1, 3), ("Color", 0.7, 0)),
    (("Solarize", 0.4, 5), ("AutoContrast", 0.9, None)),
    (("TranslateY", 0.9, 9), ("TranslateY", 0.7, 9)),
    (("AutoContrast", 0.9, None), ("Solarize", 0.8, 3)),
    (("Equalize", 0.8, None), ("Invert", 0.1, None)),
    (("TranslateY", 0.7, 9), ("AutoContrast", 0.9, None)),
]


def _round_half_even(x: np.ndarray) -> np.ndarray:
    # numpy rounds half-to-even like torch.round — stated for the Posterize
    # bin table where bin edges land exactly on .5 only at num_bins values
    # that keep the published tables intact either way
    return np.round(x)


def augmentation_space(num_bins: int, height: int, width: int,
                       *, include_identity: bool,
                       include_invert: bool) -> Dict[str, Tuple[np.ndarray, bool]]:
    """torchvision ``_augmentation_space``: name -> (magnitude bins, signed).

    AutoAugment uses ``num_bins=10`` with Invert and no Identity;
    RandAugment uses ``num_bins=num_magnitude_bins`` with Identity and no
    Invert. Dict ORDER is part of the contract (RandAugment samples op
    indices uniformly over it).
    """
    space: Dict[str, Tuple[np.ndarray, bool]] = {}
    if include_identity:
        space["Identity"] = (np.array(0.0), False)
    space.update({
        "ShearX": (np.linspace(0.0, 0.3, num_bins), True),
        "ShearY": (np.linspace(0.0, 0.3, num_bins), True),
        "TranslateX": (np.linspace(0.0, 150.0 / 331.0 * width, num_bins), True),
        "TranslateY": (np.linspace(0.0, 150.0 / 331.0 * height, num_bins), True),
        "Rotate": (np.linspace(0.0, 30.0, num_bins), True),
        "Brightness": (np.linspace(0.0, 0.9, num_bins), True),
        "Color": (np.linspace(0.0, 0.9, num_bins), True),
        "Contrast": (np.linspace(0.0, 0.9, num_bins), True),
        "Sharpness": (np.linspace(0.0, 0.9, num_bins), True),
        "Posterize": (
            8 - _round_half_even(np.arange(num_bins) / ((num_bins - 1) / 4)),
            False,
        ),
        "Solarize": (np.linspace(255.0, 0.0, num_bins), False),
        "AutoContrast": (np.array(0.0), False),
        "Equalize": (np.array(0.0), False),
    })
    if include_invert:
        space["Invert"] = (np.array(0.0), False)
    return space


def apply_op(img: Image.Image, op_name: str, magnitude: float,
             resample: int = Image.NEAREST) -> Image.Image:
    """torchvision ``_apply_op`` on the PIL backend (NEAREST, zero fill)."""
    if op_name == "ShearX":
        # F.affine(shear=[degrees(atan(m)), 0], center=[0,0]) — the inverse
        # affine matrix at angle 0 reduces to the classic PIL shear matrix
        return img.transform(img.size, Image.AFFINE,
                             (1.0, magnitude, 0.0, 0.0, 1.0, 0.0),
                             resample=resample)
    if op_name == "ShearY":
        return img.transform(img.size, Image.AFFINE,
                             (1.0, 0.0, 0.0, magnitude, 1.0, 0.0),
                             resample=resample)
    if op_name == "TranslateX":
        # F.affine(translate=[int(m), 0]) about the image center: the PIL
        # inverse matrix is a pure offset of -int(m)
        return img.transform(img.size, Image.AFFINE,
                             (1.0, 0.0, -int(magnitude), 0.0, 1.0, 0.0),
                             resample=resample)
    if op_name == "TranslateY":
        return img.transform(img.size, Image.AFFINE,
                             (1.0, 0.0, 0.0, 0.0, 1.0, -int(magnitude)),
                             resample=resample)
    if op_name == "Rotate":
        return img.rotate(magnitude, resample=resample)
    if op_name == "Brightness":
        return ImageEnhance.Brightness(img).enhance(1.0 + magnitude)
    if op_name == "Color":
        return ImageEnhance.Color(img).enhance(1.0 + magnitude)
    if op_name == "Contrast":
        return ImageEnhance.Contrast(img).enhance(1.0 + magnitude)
    if op_name == "Sharpness":
        return ImageEnhance.Sharpness(img).enhance(1.0 + magnitude)
    if op_name == "Posterize":
        return ImageOps.posterize(img, int(magnitude))
    if op_name == "Solarize":
        return ImageOps.solarize(img, magnitude)
    if op_name == "AutoContrast":
        return ImageOps.autocontrast(img)
    if op_name == "Equalize":
        return ImageOps.equalize(img)
    if op_name == "Invert":
        return ImageOps.invert(img)
    if op_name == "Identity":
        return img
    raise ValueError(f"unknown op {op_name!r}")


def _default_rng(rng):
    if rng is None:
        return np.random.default_rng(np.random.randint(2 ** 31))
    return rng


class AutoAugmentCIFAR10:
    """Exact torchvision ``AutoAugment(AutoAugmentPolicy.CIFAR10)``.

    Per call: pick one of the 25 sub-policies uniformly; for each of its
    two stages draw an application coin against the stage probability and
    an independent sign coin; look the stage's magnitude bin up in the
    10-bin space for the actual image size; apply with NEAREST resampling.
    """

    policies = CIFAR10_POLICY

    def __call__(self, img: Image.Image, rng=None) -> Image.Image:
        r = _default_rng(rng)
        sub = self.policies[int(r.integers(len(self.policies)))]
        space = augmentation_space(10, img.size[1], img.size[0],
                                   include_identity=False,
                                   include_invert=True)
        for op_name, prob, magnitude_id in sub:
            if r.random() > prob:
                continue
            magnitudes, signed = space[op_name]
            magnitude = (float(magnitudes[magnitude_id])
                         if magnitude_id is not None else 0.0)
            if signed and int(r.integers(2)) == 0:
                magnitude = -magnitude
            img = apply_op(img, op_name, magnitude)
        return img


class RandAugment:
    """Exact torchvision ``RandAugment(num_ops, magnitude,
    num_magnitude_bins)``: ``num_ops`` uniform draws over the 14-op space
    (Identity included, Invert excluded), each applied unconditionally at
    the fixed ``magnitude`` bin with a fair sign flip on signed ops."""

    def __init__(self, num_ops: int = 2, magnitude: int = 9,
                 num_magnitude_bins: int = 31):
        self.num_ops = num_ops
        self.magnitude = magnitude
        self.num_magnitude_bins = num_magnitude_bins

    def __call__(self, img: Image.Image, rng=None) -> Image.Image:
        r = _default_rng(rng)
        space = augmentation_space(self.num_magnitude_bins,
                                   img.size[1], img.size[0],
                                   include_identity=True,
                                   include_invert=False)
        names: Sequence[str] = list(space)
        for _ in range(self.num_ops):
            op_name = names[int(r.integers(len(names)))]
            magnitudes, signed = space[op_name]
            magnitude = (float(magnitudes[self.magnitude])
                         if magnitudes.ndim > 0 else 0.0)
            if signed and int(r.integers(2)):
                magnitude = -magnitude
            img = apply_op(img, op_name, magnitude)
        return img
