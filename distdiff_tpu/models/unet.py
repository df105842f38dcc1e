"""Flax UNet2DCondition — the denoiser behind the reference's
``unet(latent, t, prompt_embeds)`` calls (``generate_data.py:109-121``).

A from-scratch NHWC implementation with the SD-1.x geometry expressed as a
config (`UNetConfig`), not a port: attention rides the Pallas flash kernel,
normalization statistics stay fp32 while matmuls/convs run bf16, and the
module is shape-polymorphic over batch and resolution so one compiled
program serves CFG-duplicated batches.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from distdiff_tpu.config import UNetConfig
from distdiff_tpu.models.layers import (
    Downsample,
    GroupNorm,
    ResnetBlock,
    SmallConv3x3,
    SpatialTransformer,
    TimestepMLP,
    Upsample,
    timestep_embedding,
)


class UNet2DCondition(nn.Module):
    config: UNetConfig

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,            # [B, H, W, C_in]
        timestep: jnp.ndarray,          # [] or [B], int or float
        encoder_hidden_states: jnp.ndarray,  # [B, T_text, D_ctx]
        added_cond: jnp.ndarray = None,  # [B, addition_embed_dim] (SDXL)
    ) -> jnp.ndarray:
        cfg = self.config
        dtype = cfg.dtype
        timestep = jnp.atleast_1d(timestep)
        if timestep.shape[0] == 1 and sample.shape[0] > 1:
            timestep = jnp.broadcast_to(timestep, (sample.shape[0],))

        temb = timestep_embedding(timestep, cfg.block_out_channels[0])
        temb = TimestepMLP(cfg.time_embed_dim, dtype=dtype, name="time_embedding")(temb)
        if cfg.addition_embed_dim is not None:
            assert added_cond is not None, (
                "this config requires added_cond ([pooled text | time-id "
                "embeddings], SDXL additive conditioning)"
            )
            temb = temb + TimestepMLP(
                cfg.time_embed_dim, dtype=dtype, name="add_embedding"
            )(added_cond.astype(jnp.float32))
        context = encoder_hidden_states.astype(dtype)
        x = sample.astype(dtype)

        x = SmallConv3x3(cfg.block_out_channels[0], dtype=dtype,
                         name="conv_in")(x)  # Ci=4: lane-filling im2col form

        Res = nn.remat(ResnetBlock) if cfg.remat else ResnetBlock
        ST = nn.remat(SpatialTransformer) if cfg.remat else SpatialTransformer

        def transformer(ch, bi, name):
            heads = cfg.heads_at(bi)
            return ST(
                num_heads=heads,
                head_dim=ch // heads,
                depth=cfg.depth_at(bi),
                dtype=dtype,
                name=name,
            )

        # ---- down path, collecting skip states (conv_in output included)
        skips = [x]
        n_blocks = len(cfg.block_out_channels)
        for bi, ch in enumerate(cfg.block_out_channels):
            for li in range(cfg.layers_per_block):
                x = Res(ch, dtype=dtype, name=f"down_{bi}_res_{li}")(x, temb)
                if cfg.cross_attention[bi] and cfg.depth_at(bi) > 0:
                    x = transformer(ch, bi, f"down_{bi}_attn_{li}")(x, context)
                skips.append(x)
            if bi < n_blocks - 1:
                x = Downsample(ch, dtype=dtype, name=f"down_{bi}_downsample")(x)
                skips.append(x)

        # ---- mid
        mid_ch = cfg.block_out_channels[-1]
        x = Res(mid_ch, dtype=dtype, name="mid_res_0")(x, temb)
        x = transformer(mid_ch, len(cfg.block_out_channels) - 1, "mid_attn")(x, context)
        x = Res(mid_ch, dtype=dtype, name="mid_res_1")(x, temb)

        # ---- up path (reversed blocks, layers_per_block+1 resnets each)
        for ui, bi in enumerate(reversed(range(n_blocks))):
            ch = cfg.block_out_channels[bi]
            for li in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = Res(ch, dtype=dtype, name=f"up_{ui}_res_{li}")(x, temb)
                if cfg.cross_attention[bi] and cfg.depth_at(bi) > 0:
                    x = transformer(ch, bi, f"up_{ui}_attn_{li}")(x, context)
            if bi > 0:
                x = Upsample(ch, dtype=dtype, name=f"up_{ui}_upsample")(x)

        assert not skips, f"unconsumed skip states: {len(skips)}"

        x = GroupNorm(dtype=dtype, act="silu", name="conv_norm_out")(x)
        x = SmallConv3x3(cfg.out_channels, dtype=dtype, out_dtype=jnp.float32,
                         name="conv_out")(x)  # Co=4: tap-einsum form
        return x.astype(jnp.float32)
