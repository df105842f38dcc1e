"""Flax MobileNetV2 guide model (reference arch ``mobilenetv2`` =
timm mobilenetv2_100, ``model_utils.py:55-58``). Feature dim 1280."""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

# (expansion t, out channels c, repeats n, stride s) — the MobileNetV2 table.
_V2_TABLE: Tuple[Tuple[int, int, int, int], ...] = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


@dataclasses.dataclass(frozen=True)
class MobileNetV2Config:
    num_classes: int = 1000
    width_mult: float = 1.0
    feature_dim: int = 1280
    dtype: jnp.dtype = jnp.float32


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class InvertedResidual(nn.Module):
    cfg: MobileNetV2Config
    out_ch: int
    stride: int
    expand: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        cfg = self.cfg
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand

        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=cfg.dtype, name=name)

        h = x
        if self.expand != 1:
            h = nn.Conv(hidden, (1, 1), use_bias=False, dtype=cfg.dtype,
                        name="expand_conv")(h)
            h = nn.relu6(bn("expand_bn")(h))
        h = nn.Conv(hidden, (3, 3), strides=self.stride, padding=1, use_bias=False,
                    feature_group_count=hidden, dtype=cfg.dtype, name="dw_conv")(h)
        h = nn.relu6(bn("dw_bn")(h))
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=cfg.dtype,
                    name="project_conv")(h)
        h = bn("project_bn")(h)
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + x
        return h


class MobileNetV2(nn.Module):
    cfg: MobileNetV2Config

    def setup(self):
        cfg = self.cfg
        first_ch = _make_divisible(32 * cfg.width_mult)
        self.stem_conv = nn.Conv(first_ch, (3, 3), strides=2, padding=1,
                                 use_bias=False, dtype=cfg.dtype, name="stem_conv")
        self.stem_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=cfg.dtype,
                                    name="stem_bn")
        blocks = []
        idx = 0
        for t, c, n, s in _V2_TABLE:
            out_ch = _make_divisible(c * cfg.width_mult)
            for bi in range(n):
                blocks.append(
                    InvertedResidual(cfg, out_ch, s if bi == 0 else 1, t,
                                     name=f"block_{idx}")
                )
                idx += 1
        self.blocks = blocks
        self.head_conv = nn.Conv(cfg.feature_dim, (1, 1), use_bias=False,
                                 dtype=cfg.dtype, name="head_conv")
        self.head_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=cfg.dtype,
                                    name="head_bn")
        self.classifier = nn.Dense(cfg.num_classes, dtype=jnp.float32,
                                   name="classifier")

    def features(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = self.stem_conv(x)
        h = nn.relu6(self.stem_bn(h, use_running_average=not train))
        for block in self.blocks:
            h = block(h, train)
        h = self.head_conv(h)
        h = nn.relu6(self.head_bn(h, use_running_average=not train))
        return h

    def encode_image(self, x: jnp.ndarray, pooling: str = "avg",
                     train: bool = False) -> jnp.ndarray:
        h = self.features(x, train)
        if pooling == "avg":
            return h.mean(axis=(1, 2))
        if pooling == "max":
            return h.max(axis=(1, 2))
        raise ValueError(f"unknown pooling: {pooling}")

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.classifier(self.encode_image(x, "avg", train))
