"""Flax AutoencoderKL — the latent codec the reference loads from SD
(``generate_data.py:910-917``) and differentiates through during guidance
(``vae.decode`` inside ``transform_guidance``, ``generate_data.py:701``).

NHWC from-scratch implementation. The decoder is the hot gradient path (the
energy backprops through it), so it stays bf16 with fp32 GroupNorm stats and
is remat-friendly (pure function of params).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from distdiff_tpu.config import VAEConfig
from distdiff_tpu.models.layers import (
    Downsample, GroupNorm, ResnetBlock, SmallConv3x3, Upsample,
)
from distdiff_tpu.ops import attention as attn_op


class VAEAttention(nn.Module):
    """Single-head full self-attention over spatial positions (VAE mid block)."""

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        residual = x
        y = GroupNorm(dtype=self.dtype, name="group_norm")(x).reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        out = attn_op.attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        )[:, :, 0, :]
        out = nn.Dense(c, dtype=self.dtype, name="to_out")(out)
        return residual + out.reshape(b, h, w, c)


class Encoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        dtype = cfg.dtype
        x = x.astype(dtype)
        x = SmallConv3x3(cfg.block_out_channels[0], dtype=dtype,
                         name="conv_in")(x)  # Ci=3: im2col form
        n = len(cfg.block_out_channels)
        for bi, ch in enumerate(cfg.block_out_channels):
            for li in range(cfg.layers_per_block):
                x = ResnetBlock(ch, use_time_emb=False, dtype=dtype,
                                name=f"down_{bi}_res_{li}")(x)
            if bi < n - 1:
                x = Downsample(ch, dtype=dtype, name=f"down_{bi}_downsample")(x)
        mid = cfg.block_out_channels[-1]
        x = ResnetBlock(mid, use_time_emb=False, dtype=dtype, name="mid_res_0")(x)
        x = VAEAttention(dtype=dtype, name="mid_attn")(x)
        x = ResnetBlock(mid, use_time_emb=False, dtype=dtype, name="mid_res_1")(x)
        x = GroupNorm(dtype=dtype, act="silu", name="conv_norm_out")(x)
        x = SmallConv3x3(2 * cfg.latent_channels, dtype=dtype,
                         out_dtype=jnp.float32, name="conv_out")(x)
        return x.astype(jnp.float32)  # moments: [mean | logvar]


class Decoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        dtype = cfg.dtype
        Res = nn.remat(ResnetBlock) if cfg.remat else ResnetBlock
        z = z.astype(dtype)
        mid = cfg.block_out_channels[-1]
        x = SmallConv3x3(mid, dtype=dtype, name="conv_in")(z)  # Ci=4
        x = Res(mid, use_time_emb=False, dtype=dtype, name="mid_res_0")(x)
        x = VAEAttention(dtype=dtype, name="mid_attn")(x)
        x = Res(mid, use_time_emb=False, dtype=dtype, name="mid_res_1")(x)
        n = len(cfg.block_out_channels)
        for ui, bi in enumerate(reversed(range(n))):
            ch = cfg.block_out_channels[bi]
            for li in range(cfg.layers_per_block + 1):
                x = Res(ch, use_time_emb=False, dtype=dtype,
                        name=f"up_{ui}_res_{li}")(x)
            if bi > 0:
                x = Upsample(ch, dtype=dtype, name=f"up_{ui}_upsample")(x)
        x = GroupNorm(dtype=dtype, act="silu", name="conv_norm_out")(x)
        # Co=3 at 512^2: XLA's direct conv is ~1% MXU here — the tap-einsum
        # form is ~4x faster fwd and avoids the pathological dx conv in the
        # guidance backward (scripts/vae_breakdown.py, smallconv_probe.py).
        x = SmallConv3x3(cfg.out_channels, dtype=dtype, out_dtype=jnp.float32,
                         name="conv_out")(x)
        return x.astype(jnp.float32)


class AutoencoderKL(nn.Module):
    """encode -> (mean, logvar) moments; decode -> image in [-1, 1]."""

    config: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.config, name="encoder")
        self.decoder = Decoder(self.config, name="decoder")
        dtype = self.config.dtype
        self.quant_conv = nn.Conv(
            2 * self.config.latent_channels, (1, 1), dtype=jnp.float32,
            name="quant_conv",
        )
        self.post_quant_conv = nn.Conv(
            self.config.latent_channels, (1, 1), dtype=jnp.float32,
            name="post_quant_conv",
        )

    def encode_moments(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x: jnp.ndarray, rng=None) -> jnp.ndarray:
        """Sample (or take the mode of) the latent posterior, unscaled."""
        mean, logvar = self.encode_moments(x)
        if rng is None:
            return mean
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jnp.ndarray, rng=None) -> jnp.ndarray:
        return self.decode(self.encode(x, rng))
