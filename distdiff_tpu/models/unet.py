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
        deep_cache: jnp.ndarray = None,  # cached deep feature (see below)
        return_cache: bool = False,      # also return this step's feature
        cache_branch: int = 0,           # down level the cache cuts below
        segment: tuple = None,           # (unit_start, unit_end) PP slice
        skips: tuple = (),               # carried skip states (PP segments)
    ) -> jnp.ndarray:
        """Denoiser forward; optionally a DeepCache-style partial forward.

        The deep-feature cache (Ma et al. 2023 DeepCache / the "Cache Me if
        You Can" block-caching family) exploits that a UNet's deep features
        change slowly across adjacent denoise steps while the shallow
        high-resolution layers carry the step-to-step detail:

          * ``return_cache=True`` (full step): run everything and ALSO
            return the feature entering up-group ``n_blocks-1-cache_branch``
            (i.e. the output of the entire subnetwork below down level
            ``cache_branch``).
          * ``deep_cache=<that feature>`` (cached step): run ONLY the down
            levels ``<= cache_branch`` (to refresh the shallow skips),
            substitute the cached feature for the deep subnetwork, and run
            the remaining up groups.

        Both variants share parameter names, so one converted checkpoint
        serves both; the default call (no cache args) traces the exact same
        program as before. The cached loop lives in
        ``sampling/deepcache.py``; this is OPT-IN approximate acceleration
        (beyond-reference), never the default DDIM-50 parity path.

        ``segment=(a, b)`` runs only pipeline units ``a <= u < b`` of the
        linear unit list (pipeline parallelism, ``parallel/pp.py``):

          unit 0             conv_in
          units 1..N         down level ``bi = u-1`` (resnets/attn + down)
          unit N+1           mid
          units N+2..2N+1    up group ``ui = u-N-2``
          unit 2N+2          conv_norm_out + conv_out

        (N = len(block_out_channels); 2N+3 units total.) A non-final
        segment takes the carried hidden state as ``sample`` plus the
        ``skips`` tuple produced so far and returns ``(x, skips)``; the
        final segment returns the normal eps output. Parameter names are
        position-independent, so each stage's params are a plain subtree of
        the full tree (``parallel.pp.split_unet_params``). Mutually
        exclusive with the deep-cache arguments.
        """
        cfg = self.config
        dtype = cfg.dtype
        n_units = 2 * len(cfg.block_out_channels) + 3
        if segment is not None:
            assert deep_cache is None and not return_cache, (
                "segment (pipeline parallelism) and deep_cache are "
                "mutually exclusive")
            seg_a, seg_b = segment
            assert 0 <= seg_a < seg_b <= n_units, (segment, n_units)
        else:
            seg_a, seg_b = 0, n_units

        def runs(u):
            return seg_a <= u < seg_b

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

        if runs(0):
            x = SmallConv3x3(cfg.block_out_channels[0], dtype=dtype,
                             name="conv_in")(x)  # Ci=4: lane-filling im2col

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
        n_blocks = len(cfg.block_out_channels)
        shallow = deep_cache is not None
        if shallow or return_cache:
            assert 0 <= cache_branch < n_blocks - 1, (cache_branch, n_blocks)
        cache_ui = n_blocks - 1 - cache_branch  # up group the cache enters

        skips = [x] if runs(0) else list(skips)
        down_levels = range(cache_branch + 1) if shallow else range(n_blocks)
        for bi in down_levels:
            if not runs(1 + bi):
                continue
            ch = cfg.block_out_channels[bi]
            for li in range(cfg.layers_per_block):
                x = Res(ch, dtype=dtype, name=f"down_{bi}_res_{li}")(x, temb)
                if cfg.cross_attention[bi] and cfg.depth_at(bi) > 0:
                    x = transformer(ch, bi, f"down_{bi}_attn_{li}")(x, context)
                skips.append(x)
            # the shallow path stops BEFORE cache_branch's downsample: its
            # output skip belongs to the (cached) deeper subnetwork
            if bi < n_blocks - 1 and not (shallow and bi == cache_branch):
                x = Downsample(ch, dtype=dtype, name=f"down_{bi}_downsample")(x)
                skips.append(x)

        cache_out = None
        if shallow:
            x = deep_cache.astype(dtype)
            up_groups = range(cache_ui, n_blocks)
        else:
            # ---- mid
            if runs(n_blocks + 1):
                mid_ch = cfg.block_out_channels[-1]
                x = Res(mid_ch, dtype=dtype, name="mid_res_0")(x, temb)
                x = transformer(mid_ch, n_blocks - 1, "mid_attn")(x, context)
                x = Res(mid_ch, dtype=dtype, name="mid_res_1")(x, temb)
            up_groups = range(n_blocks)

        # ---- up path (reversed blocks, layers_per_block+1 resnets each)
        for ui in up_groups:
            if not runs(n_blocks + 2 + ui):
                continue
            bi = n_blocks - 1 - ui
            if return_cache and ui == cache_ui:
                cache_out = x
            ch = cfg.block_out_channels[bi]
            for li in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = Res(ch, dtype=dtype, name=f"up_{ui}_res_{li}")(x, temb)
                if cfg.cross_attention[bi] and cfg.depth_at(bi) > 0:
                    x = transformer(ch, bi, f"up_{ui}_attn_{li}")(x, context)
            if bi > 0:
                x = Upsample(ch, dtype=dtype, name=f"up_{ui}_upsample")(x)

        if segment is not None and seg_b < n_units:
            # non-final pipeline segment: hand (hidden, skips) to the next
            # stage; dtype stays the compute dtype across the wire
            return x, tuple(skips)

        assert not skips, f"unconsumed skip states: {len(skips)}"

        x = GroupNorm(dtype=dtype, act="silu", name="conv_norm_out")(x)
        x = SmallConv3x3(cfg.out_channels, dtype=dtype, out_dtype=jnp.float32,
                         name="conv_out")(x)  # Co=4: tap-einsum form
        out = x.astype(jnp.float32)
        if return_cache:
            return out, cache_out
        return out
