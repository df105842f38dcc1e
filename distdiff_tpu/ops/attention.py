"""Attention ops: Pallas flash attention on TPU, XLA reference elsewhere.

This covers the role xFormers memory-efficient attention plays in the
reference (optional flag at ``generate_data.py:544-546,964-975``): the UNet's
self-attention over up to 64x64=4096 latent tokens and cross-attention over
77 text tokens.

Design:
  * public ``attention(q, k, v)`` with shapes ``[B, Tq, H, D]`` /
    ``[B, Tk, H, D]`` -> ``[B, Tq, H, D]``.
  * On TPU the forward runs a blockwise online-softmax Pallas kernel
    (head_dim padded to the 128-lane width, kv length masked to handle the
    77-token text context).
  * Gradients (needed because DistDiff guidance backprops through the UNet)
    flow through a custom VJP whose backward is the Pallas backward kernel in
    ``flash_bwd``; set ``DISTDIFF_FORCE_XLA_ATTENTION=1`` to bypass Pallas
    entirely.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def _use_pallas() -> bool:
    if os.environ.get("DISTDIFF_FORCE_XLA_ATTENTION"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Reference attention in pure XLA (fp32 softmax). [B,T,H,D] layout."""
    scale = 1.0 / (q.shape[-1] ** 0.5)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    return out.astype(q.dtype)


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Multi-head attention, dispatching to the fastest available path."""
    if _use_pallas():
        from distdiff_tpu.ops import flash  # deferred: pallas import is TPU-only

        return flash.flash_attention(q, k, v)
    return xla_attention(q, k, v)
