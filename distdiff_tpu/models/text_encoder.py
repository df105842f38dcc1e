"""Flax CLIP text transformer — SD's prompt conditioner.

Replaces the reference's HF ``CLIPTextModel`` load (``generate_data.py:
903-907``; it resolves the class dynamically at ``:140-161`` — we support
the CLIP family; T5/DeepFloyd is out of scope for parity). Returns the
last hidden state ``[B, T, D]`` consumed by the UNet's cross-attention.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from distdiff_tpu.config import TextEncoderConfig
from distdiff_tpu.ops import attention as attn_op


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * nn.sigmoid(1.702 * x)


class CLIPTextBlock(nn.Module):
    cfg: TextEncoderConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        d = cfg.hidden_size
        h = cfg.num_heads
        hd = d // h
        dtype = cfg.dtype

        y = nn.LayerNorm(dtype=dtype, name="layer_norm1")(x)
        b, t, _ = y.shape
        q = nn.Dense(d, dtype=dtype, name="q_proj")(y).reshape(b, t, h, hd)
        k = nn.Dense(d, dtype=dtype, name="k_proj")(y).reshape(b, t, h, hd)
        v = nn.Dense(d, dtype=dtype, name="v_proj")(y).reshape(b, t, h, hd)
        # Causal masking: 77 tokens is tiny, do masked XLA attention directly
        # (flash kernels are for the UNet's 4k-16k spatial maps).
        scale = 1.0 / np.sqrt(hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        logits = jnp.where(mask[None, None, :, :], logits, -1e30)
        probs = nn.softmax(logits, axis=-1).astype(dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, d)
        x = x + nn.Dense(d, dtype=dtype, name="out_proj")(out)

        y = nn.LayerNorm(dtype=dtype, name="layer_norm2")(x)
        act = quick_gelu if cfg.activation == "quick_gelu" else nn.gelu
        y = nn.Dense(d * cfg.mlp_ratio, dtype=dtype, name="fc1")(y)
        y = act(y)
        y = nn.Dense(d, dtype=dtype, name="fc2")(y)
        return x + y


class CLIPTextEncoder(nn.Module):
    config: TextEncoderConfig

    def setup(self):
        cfg = self.config
        self.token_embedding = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype,
            name="token_embedding",
        )
        self.position_embedding = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (cfg.max_length, cfg.hidden_size),
            jnp.float32,
        )
        self.blocks = [
            CLIPTextBlock(cfg, name=f"layers_{i}") for i in range(cfg.num_layers)
        ]
        self.final_layer_norm = nn.LayerNorm(dtype=cfg.dtype,
                                             name="final_layer_norm")
        if cfg.embed_dim is not None:
            self.text_projection = self.param(
                "text_projection", nn.initializers.normal(0.02),
                (cfg.hidden_size, cfg.embed_dim), jnp.float32,
            )

    def hidden_states(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        b, t = input_ids.shape
        tok = self.token_embedding(input_ids)
        x = tok + self.position_embedding[None, :t, :].astype(cfg.dtype)
        causal = jnp.tril(jnp.ones((t, t), bool))
        for blk in self.blocks:
            x = blk(x, causal)
        return self.final_layer_norm(x).astype(jnp.float32)

    def penultimate_hidden(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """Hidden state after all but the LAST block, WITHOUT the final
        layer norm — SDXL's conditioning tap (diffusers
        ``hidden_states[-2]`` with ``output_hidden_states=True``)."""
        cfg = self.config
        b, t = input_ids.shape
        tok = self.token_embedding(input_ids)
        x = tok + self.position_embedding[None, :t, :].astype(cfg.dtype)
        causal = jnp.tril(jnp.ones((t, t), bool))
        for blk in self.blocks[:-1]:
            x = blk(x, causal)
        return x.astype(jnp.float32)

    def sdxl_outputs(self, input_ids: jnp.ndarray):
        """(penultimate_hidden [B,T,D], pooled_projected [B,embed] or None)
        in one pass — the pooled path runs the full stack + final LN +
        projection, the conditioning tap skips the last block and the LN."""
        cfg = self.config
        b, t = input_ids.shape
        tok = self.token_embedding(input_ids)
        x = tok + self.position_embedding[None, :t, :].astype(cfg.dtype)
        causal = jnp.tril(jnp.ones((t, t), bool))
        for blk in self.blocks[:-1]:
            x = blk(x, causal)
        penult = x.astype(jnp.float32)
        pooled = None
        if cfg.embed_dim is not None:
            x = self.blocks[-1](x, causal)
            h = self.final_layer_norm(x).astype(jnp.float32)
            eot = jnp.argmax(input_ids, axis=-1)
            pooled = h[jnp.arange(h.shape[0]), eot] @ self.text_projection
        return penult, pooled

    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """Last hidden state [B, T, D] — the SD conditioning path."""
        return self.hidden_states(input_ids)

    def encode_pooled(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """Pooled + projected embedding [B, embed_dim]: hidden state at the
        highest-id token (eot in CLIP vocab) through the text projection —
        the contrastive space zero-shot heads live in."""
        assert self.config.embed_dim is not None, (
            "encode_pooled requires TextEncoderConfig.embed_dim"
        )
        h = self.hidden_states(input_ids)
        eot = jnp.argmax(input_ids, axis=-1)
        pooled = h[jnp.arange(h.shape[0]), eot]
        return pooled @ self.text_projection
