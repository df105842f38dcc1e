"""Host-side image transforms (PIL + numpy; no torchvision dependency).

Covers the transform stacks the reference builds with torchvision:
  * SD preprocessing: resize-short-side + center/random crop + [-1,1]
    (``dataloader.py:757-764``)
  * guide/eval training: resize 256, random rotation 15, random crop 224,
    horizontal flip, ImageNet normalize (``train.py:122-135``)
  * prototype extraction: resize (224,224) + ImageNet normalize
    (``dataloader.py:736-742``)

All transforms are ``fn(PIL.Image, rng: np.random.Generator) -> PIL/array``
composed with ``Compose``; outputs are NHWC fp32 numpy arrays.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
from PIL import Image

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, img, rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng()
        for t in self.transforms:
            img = t(img, rng)
        return img


class Resize:
    """Resize: int -> short side; (h, w) -> exact size. Bilinear (PIL)."""

    def __init__(self, size, interpolation=Image.BILINEAR):
        self.size = size
        self.interpolation = interpolation

    def __call__(self, img: Image.Image, rng) -> Image.Image:
        if isinstance(self.size, int):
            w, h = img.size
            short = min(w, h)
            scale = self.size / short
            new = (max(1, round(w * scale)), max(1, round(h * scale)))
        else:
            new = (self.size[1], self.size[0])  # PIL takes (w, h)
        return img.resize(new, self.interpolation)


class CenterCrop:
    def __init__(self, size: int):
        self.size = size

    def __call__(self, img: Image.Image, rng) -> Image.Image:
        w, h = img.size
        s = self.size
        left = max(0, (w - s) // 2)
        top = max(0, (h - s) // 2)
        img = img.crop((left, top, left + s, top + s))
        if img.size != (s, s):  # pad-up if the image was smaller
            canvas = Image.new(img.mode, (s, s))
            canvas.paste(img, ((s - img.size[0]) // 2, (s - img.size[1]) // 2))
            img = canvas
        return img


class RandomCrop:
    def __init__(self, size: int):
        self.size = size

    def __call__(self, img: Image.Image, rng) -> Image.Image:
        w, h = img.size
        s = self.size
        if w < s or h < s:
            img = img.resize((max(w, s), max(h, s)), Image.BILINEAR)
            w, h = img.size
        left = int(rng.integers(0, w - s + 1))
        top = int(rng.integers(0, h - s + 1))
        return img.crop((left, top, left + s, top + s))


class RandomHorizontalFlip:
    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, img: Image.Image, rng) -> Image.Image:
        if rng.random() < self.p:
            return img.transpose(Image.FLIP_LEFT_RIGHT)
        return img


class RandomRotation:
    def __init__(self, degrees: float):
        self.degrees = degrees

    def __call__(self, img: Image.Image, rng) -> Image.Image:
        angle = float(rng.uniform(-self.degrees, self.degrees))
        return img.rotate(angle, resample=Image.BILINEAR)


class ToArray:
    """PIL -> fp32 HWC in [0, 1]."""

    def __call__(self, img, rng=None) -> np.ndarray:
        if isinstance(img, np.ndarray):
            return img
        arr = np.asarray(img, np.float32) / 255.0
        if arr.ndim == 2:
            arr = np.repeat(arr[:, :, None], 3, axis=2)
        return arr


class Normalize:
    def __init__(self, mean, std):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, arr: np.ndarray, rng=None) -> np.ndarray:
        return (arr - self.mean) / self.std


def sd_transform(size: int = 512, center_crop: bool = False) -> Compose:
    """SDDataset preprocessing -> [-1, 1] (``dataloader.py:757-764``)."""
    return Compose([
        Resize(size),
        CenterCrop(size) if center_crop else RandomCrop(size),
        ToArray(),
        Normalize([0.5, 0.5, 0.5], [0.5, 0.5, 0.5]),
    ])


def train_transform(size: int = 224) -> Compose:
    """Downstream training augmentation (``train.py:122-129``)."""
    return Compose([
        Resize(int(size * 256 / 224)),
        RandomRotation(15),
        RandomCrop(size),
        RandomHorizontalFlip(),
        ToArray(),
        Normalize(IMAGENET_MEAN, IMAGENET_STD),
    ])


def eval_transform(size: int = 224) -> Compose:
    """Test-time transform (``train.py:130-135``)."""
    return Compose([
        Resize(int(size * 256 / 224)),
        CenterCrop(size),
        ToArray(),
        Normalize(IMAGENET_MEAN, IMAGENET_STD),
    ])


def prototype_transform(size: int = 224) -> Compose:
    """Exact-resize + ImageNet normalize (``dataloader.py:736-742``)."""
    return Compose([
        Resize((size, size)),
        ToArray(),
        Normalize(IMAGENET_MEAN, IMAGENET_STD),
    ])
