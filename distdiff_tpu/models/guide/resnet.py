"""Flax ResNet family for the guide/eval classifier.

Covers the reference's timm archs (``model_utils.py:47-73``): ``resnet50``,
``resnext50`` (resnext50_32x4d), ``wideresnet50`` (wide_resnet50_2), with
the same ``encode_image(x, pooling)`` contract the reference monkey-patches
on (``model_utils.py:29-41``): pooled pre-logit features ([B, 2048]).

NHWC, BatchNorm with an explicit ``train`` flag (batch_stats collection);
bf16-friendly but defaults to fp32 — guide features feed fp32 energy math.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    stage_sizes: Tuple[int, ...] = (3, 4, 6, 3)
    base_width: int = 64
    groups: int = 1
    width_per_group: int = 64
    width_mult: float = 1.0  # wide_resnet50_2 doubles the bottleneck width
    num_classes: int = 1000
    dtype: jnp.dtype = jnp.float32

    @property
    def feature_dim(self) -> int:
        # last stage planes * bottleneck expansion; 2048 for the 50-layer family
        return self.base_width * (2 ** (len(self.stage_sizes) - 1)) * 4


def resnet50_config(num_classes: int) -> ResNetConfig:
    return ResNetConfig(num_classes=num_classes)


def resnext50_config(num_classes: int) -> ResNetConfig:
    return ResNetConfig(num_classes=num_classes, groups=32, width_per_group=4)


def wideresnet50_config(num_classes: int) -> ResNetConfig:
    return ResNetConfig(num_classes=num_classes, width_mult=2.0)


def tiny_resnet_config(num_classes: int) -> ResNetConfig:
    """CPU-testable miniature with the same topology."""
    return ResNetConfig(stage_sizes=(1, 1), base_width=8, num_classes=num_classes)


class Bottleneck(nn.Module):
    cfg: ResNetConfig
    planes: int       # stage base planes (64/128/256/512 * base_width/64)
    strides: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        cfg = self.cfg
        width = int(self.planes * (cfg.width_per_group / 64.0) * cfg.width_mult) * cfg.groups
        out_ch = self.planes * 4

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=cfg.dtype, name=name,
            )

        residual = x
        h = nn.Conv(width, (1, 1), use_bias=False, dtype=cfg.dtype, name="conv1")(x)
        h = nn.relu(bn("bn1")(h))
        h = nn.Conv(
            width, (3, 3), strides=self.strides, padding=1, use_bias=False,
            feature_group_count=cfg.groups, dtype=cfg.dtype, name="conv2",
        )(h)
        h = nn.relu(bn("bn2")(h))
        h = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=cfg.dtype, name="conv3")(h)
        h = bn("bn3")(h)
        if residual.shape[-1] != out_ch or self.strides != 1:
            residual = nn.Conv(
                out_ch, (1, 1), strides=self.strides, use_bias=False,
                dtype=cfg.dtype, name="downsample_conv",
            )(residual)
            residual = bn("downsample_bn")(residual)
        return nn.relu(h + residual)


class ResNet(nn.Module):
    cfg: ResNetConfig

    def setup(self):
        cfg = self.cfg
        self.conv1 = nn.Conv(cfg.base_width, (7, 7), strides=2, padding=3,
                             use_bias=False, dtype=cfg.dtype, name="conv1")
        self.bn1 = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=cfg.dtype,
                                name="bn1")
        blocks = []
        for si, n_blocks in enumerate(cfg.stage_sizes):
            planes = cfg.base_width * (2**si)
            for bi in range(n_blocks):
                strides = 2 if (si > 0 and bi == 0) else 1
                blocks.append(
                    Bottleneck(cfg, planes, strides, name=f"layer{si + 1}_{bi}")
                )
        self.blocks = blocks
        self.fc = nn.Dense(cfg.num_classes, dtype=jnp.float32, name="fc")

    def features(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Pre-pool feature map [B, h, w, C]."""
        h = self.conv1(x)
        h = self.bn1(h, use_running_average=not train)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for block in self.blocks:
            h = block(h, train)
        return h

    def encode_image(self, x: jnp.ndarray, pooling: str = "avg",
                     train: bool = False) -> jnp.ndarray:
        """Pooled features — the guide-feature API (``model_utils.py:29-41``)."""
        h = self.features(x, train)
        if pooling == "avg":
            return h.mean(axis=(1, 2))
        if pooling == "max":
            return h.max(axis=(1, 2))
        raise ValueError(f"unknown pooling: {pooling}")

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        feats = self.encode_image(x, "avg", train)
        return self.fc(feats)
