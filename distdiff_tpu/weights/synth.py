"""Synthesize an exactly-diffusers-layout SD checkpoint on disk.

No real SD checkpoint is reachable in this air-gapped environment, so the
real-weights load path is proven mechanically: write a checkpoint directory
with the EXACT key set, shapes, dtypes, and file layout a diffusers
``runwayml/stable-diffusion-v1-5`` save produces (per
``sd15_geometry``), plus structurally valid ``tokenizer/merges.txt`` +
``vocab.json``, then run conversion + strict validation + generation on it.
Point the same code at a genuine checkpoint and only the tensor values
change. Reference load path: ``generate_data.py:863-922``.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from distdiff_tpu.weights.sd15_geometry import (
    sd15_text_state_shapes,
    sd15_unet_state_shapes,
    sd15_vae_state_shapes,
    sdxl_unet_state_shapes,
)


def state_shapes_for_config(config):
    """The diffusers state-dict key/shape sets for a PipelineConfig.
    SDXL configs (text_encoder_2 set / addition_embed_dim) get the SDXL
    layout: per-block transformer depth, linear projections, add_embedding,
    plus a projected ``text_2`` encoder."""
    u, v, t = config.unet, config.vae, config.text_encoder
    out = {
        "vae": sd15_vae_state_shapes(
            chans=v.block_out_channels, layers=v.layers_per_block,
            lat=v.latent_channels,
        ),
        "text": sd15_text_state_shapes(
            d=t.hidden_size, ff=t.hidden_size * t.mlp_ratio,
            layers=t.num_layers, vocab=t.vocab_size, pos=t.max_length,
        ),
    }
    if u.addition_embed_dim is not None:
        depth = u.transformer_depth
        if not isinstance(depth, (tuple, list)):
            depth = tuple(depth for _ in u.block_out_channels)
        out["unet"] = sdxl_unet_state_shapes(
            chans=u.block_out_channels, layers=u.layers_per_block,
            ctx=u.cross_attention_dim, cross_attention=u.cross_attention,
            transformer_depth=depth,
            addition_embed_dim=u.addition_embed_dim,
            in_channels=u.in_channels, out_channels=u.out_channels,
            temb_mult=u.time_embed_dim_mult,
        )
    else:
        out["unet"] = sd15_unet_state_shapes(
            chans=u.block_out_channels, layers=u.layers_per_block,
            ctx=u.cross_attention_dim, cross_attention=u.cross_attention,
            in_channels=u.in_channels, out_channels=u.out_channels,
            temb_mult=u.time_embed_dim_mult,
            linear_proj=u.linear_projection,
        )
    t2 = config.text_encoder_2
    if t2 is not None:
        shapes2 = sd15_text_state_shapes(
            d=t2.hidden_size, ff=t2.hidden_size * t2.mlp_ratio,
            layers=t2.num_layers, vocab=t2.vocab_size, pos=t2.max_length,
        )
        shapes2["text_projection.weight"] = (t2.embed_dim, t2.hidden_size)
        out["text_2"] = shapes2
    return out


def write_synth_tokenizer(checkpoint_dir: str, vocab_size: int) -> None:
    """Write merges.txt + vocab.json with CLIP's structural layout:
    256 byte tokens, 256 ``</w>`` byte tokens, ``vocab_size - 514`` merge
    tokens, 2 specials. (49408 -> exactly CLIP's 48894 merges.)"""
    from distdiff_tpu.models.tokenizer import _bytes_to_unicode

    tok_dir = os.path.join(checkpoint_dir, "tokenizer")
    os.makedirs(tok_dir, exist_ok=True)
    syms = list(_bytes_to_unicode().values())
    n_merges = vocab_size - 2 * len(syms) - 2
    assert 0 < n_merges <= len(syms) ** 2, vocab_size
    merges = [
        (syms[i // len(syms)], syms[i % len(syms)]) for i in range(n_merges)
    ]
    with open(os.path.join(tok_dir, "merges.txt"), "w", encoding="utf-8") as f:
        f.write("#version: synthetic\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    vocab = syms + [v + "</w>" for v in syms]
    vocab += ["".join(m) for m in merges]
    vocab += ["<|startoftext|>", "<|endoftext|>"]
    with open(os.path.join(tok_dir, "vocab.json"), "w", encoding="utf-8") as f:
        json.dump({v: i for i, v in enumerate(vocab)}, f)


_COMPONENT_FILES = {
    "unet": ("unet", "diffusion_pytorch_model.safetensors"),
    "vae": ("vae", "diffusion_pytorch_model.safetensors"),
    "text": ("text_encoder", "model.safetensors"),
    "text_2": ("text_encoder_2", "model.safetensors"),
}


def write_synth_checkpoint(
    checkpoint_dir: str,
    config=None,
    seed: int = 0,
    scale: float = 0.05,
    dtype=np.float16,
    tokenizer: bool = True,
) -> str:
    """Write the full diffusers-layout checkpoint; returns checkpoint_dir.

    fp16 tensors by default (halves the 4.3GB fp32 footprint of the real
    geometry; diffusers ships fp16 variants the same way)."""
    from safetensors.numpy import save_file

    from distdiff_tpu.config import PipelineConfig

    config = config or PipelineConfig.sd15()
    shapes = state_shapes_for_config(config)
    rng = np.random.default_rng(seed)
    for comp in shapes:
        sub, fname = _COMPONENT_FILES[comp]
        d = os.path.join(checkpoint_dir, sub)
        os.makedirs(d, exist_ok=True)
        state = {
            k: (rng.standard_normal(s, np.float32) * scale).astype(dtype)
            for k, s in shapes[comp].items()
        }
        save_file(state, os.path.join(d, fname))
    if tokenizer:
        write_synth_tokenizer(checkpoint_dir, config.text_encoder.vocab_size)
    return checkpoint_dir
