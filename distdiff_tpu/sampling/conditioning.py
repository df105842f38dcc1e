"""Conditioning pytree helpers.

SD-1.x conditions the UNet on a single text-context array ``[B, T, D]``.
SDXL conditions on TWO tensors: the concatenated dual-encoder context
``[B, T, 2048]`` and the additive ``[B, 2816]`` [pooled | time-id] embedding
(reference scope is SD-1.x only — ``generate_data.py:166-172``; SDXL is
beyond-reference surface).

Rather than fork every signature, ``cond``/``uncond`` are treated as opaque
pytrees everywhere (a bare array for SD-1.x, ``{"ctx": ..., "add": ...}``
for SDXL): the sampler CFG-concats them leaf-wise, the chunked guidance path
slices them leaf-wise, and the dataset/driver stack them leaf-wise. Leading
axis of every leaf is the batch axis.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def cond_concat(uncond: Any, cond: Any) -> Any:
    """CFG pair: leaf-wise [uncond ; cond] along the batch axis."""
    return jax.tree.map(
        lambda u, c: jnp.concatenate([u, c], axis=0), uncond, cond
    )


def cond_slice(cond: Any, lo: int, hi: int) -> Any:
    """Leaf-wise batch-axis slice (host-side chunking)."""
    return jax.tree.map(lambda a: a[lo:hi], cond)


def cond_index(cond: Any, idx: int) -> Any:
    """Leaf-wise indexing along the leading axis (dataset lookup)."""
    return jax.tree.map(lambda a: a[idx], cond)


def cond_stack(items: Sequence[Any]) -> Any:
    """Stack per-item conds (arrays or dicts) into batched leaves."""
    return jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]),
                        *items)


def cond_leading_dim(cond: Any) -> int:
    return jax.tree.leaves(cond)[0].shape[0]


def cond_asarray(cond: Any) -> Any:
    return jax.tree.map(np.asarray, cond)
