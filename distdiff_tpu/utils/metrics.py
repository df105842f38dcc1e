"""Evaluation metrics (reference ``utils/eval.py:5-18``)."""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def accuracy(
    logits: jnp.ndarray, targets: jnp.ndarray, topk: Sequence[int] = (1,)
) -> Tuple[jnp.ndarray, ...]:
    """Top-k precision (in percent) on a batch of logits."""
    maxk = max(topk)
    pred = jnp.argsort(-logits, axis=-1)[:, :maxk]  # [B, maxk]
    correct = pred == targets[:, None]
    out = []
    for k in topk:
        out.append(100.0 * jnp.mean(jnp.any(correct[:, :k], axis=-1)))
    return tuple(out)
