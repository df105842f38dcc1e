"""CLIP ViT-B/32 image tower + zero-shot text head (reference arch
``open_clip_vit_b32``, ``model_utils.py:74-85``).

``encode_image`` returns the projected embedding ([B, 512]); the zero-shot
classifier is a Dense whose rows are L2-normalized class-template text
features — the same construction as the reference's ``wrap_clip_forward``
(``model_utils.py:14-27``), built by ``zero_shot_head`` below.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from distdiff_tpu.ops import attention as attn_op


@dataclasses.dataclass(frozen=True)
class CLIPViTConfig:
    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    embed_dim: int = 512  # projected output dim
    dtype: jnp.dtype = jnp.float32


def tiny_clip_vit_config() -> CLIPViTConfig:
    return CLIPViTConfig(image_size=32, patch_size=8, width=32, layers=2,
                         heads=2, embed_dim=16)


class ViTBlock(nn.Module):
    cfg: CLIPViTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        d = cfg.width
        h = cfg.heads
        hd = d // h
        b, t, _ = x.shape

        y = nn.LayerNorm(dtype=cfg.dtype, name="ln_1")(x)
        q = nn.Dense(d, dtype=cfg.dtype, name="q_proj")(y).reshape(b, t, h, hd)
        k = nn.Dense(d, dtype=cfg.dtype, name="k_proj")(y).reshape(b, t, h, hd)
        v = nn.Dense(d, dtype=cfg.dtype, name="v_proj")(y).reshape(b, t, h, hd)
        out = attn_op.attention(q, k, v).reshape(b, t, d)
        x = x + nn.Dense(d, dtype=cfg.dtype, name="out_proj")(out)

        y = nn.LayerNorm(dtype=cfg.dtype, name="ln_2")(x)
        y = nn.Dense(d * 4, dtype=cfg.dtype, name="c_fc")(y)
        y = y * nn.sigmoid(1.702 * y)  # quick_gelu
        y = nn.Dense(d, dtype=cfg.dtype, name="c_proj")(y)
        return x + y


class CLIPViT(nn.Module):
    cfg: CLIPViTConfig

    def setup(self):
        cfg = self.cfg
        self.patch_embed = nn.Conv(
            cfg.width, (cfg.patch_size, cfg.patch_size),
            strides=cfg.patch_size, use_bias=False, dtype=cfg.dtype,
            name="patch_embed",
        )
        n_patches = (cfg.image_size // cfg.patch_size) ** 2
        self.class_embedding = self.param(
            "class_embedding", nn.initializers.normal(0.02), (cfg.width,),
            jnp.float32,
        )
        self.positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(0.02),
            (n_patches + 1, cfg.width), jnp.float32,
        )
        self.ln_pre = nn.LayerNorm(dtype=cfg.dtype, name="ln_pre")
        self.resblocks = [
            ViTBlock(cfg, name=f"resblocks_{i}") for i in range(cfg.layers)
        ]
        self.ln_post = nn.LayerNorm(dtype=cfg.dtype, name="ln_post")
        self.proj = self.param(
            "proj", nn.initializers.normal(0.02), (cfg.width, cfg.embed_dim),
            jnp.float32,
        )

    def encode_image(self, x: jnp.ndarray, pooling: str = "cls",
                     train: bool = False) -> jnp.ndarray:
        del pooling, train  # CLIP uses the class token; kept for API parity
        cfg = self.cfg
        h = self.patch_embed(x)  # [B, gh, gw, width]
        b, gh, gw, w = h.shape
        h = h.reshape(b, gh * gw, w)
        cls = jnp.broadcast_to(
            self.class_embedding.astype(h.dtype)[None, None, :], (b, 1, w)
        )
        h = jnp.concatenate([cls, h], axis=1)
        h = h + self.positional_embedding[None].astype(h.dtype)
        h = self.ln_pre(h)
        for blk in self.resblocks:
            h = blk(h)
        h = self.ln_post(h[:, 0, :])
        return h @ self.proj.astype(h.dtype)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.encode_image(x, train=train)


def zero_shot_logits(
    image_features: jnp.ndarray,
    class_text_features: jnp.ndarray,
    logit_scale: float = 100.0,
) -> jnp.ndarray:
    """Zero-shot classification head (reference ``wrap_clip_forward``):
    logits = scale * normalize(img) @ normalize(text).T"""
    img = image_features / (
        jnp.linalg.norm(image_features, axis=-1, keepdims=True) + 1e-8
    )
    txt = class_text_features / (
        jnp.linalg.norm(class_text_features, axis=-1, keepdims=True) + 1e-8
    )
    return logit_scale * img @ txt.T
