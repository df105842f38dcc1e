"""Prototype extraction: guide features -> class/global + cluster/local means.

Reference pipeline (``dataloader.py:664-747``): full-trainset feature pass
with ``encode_image`` on 224² ImageNet-normalized images, L2-normalize,
group per class, global prototype = class mean, local prototypes = means of
K average-linkage clusters. Feature extraction here is a single jitted
batched device loop; clustering stays on host (tiny data).

On load the reference re-normalizes both prototype arrays
(``generate_data.py:1113-1127``) — ``load_prototypes`` mirrors that.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from distdiff_tpu.prototypes.cluster import agglomerative_average


def extract_features(
    encode_fn: Callable[[jnp.ndarray], jnp.ndarray],
    batches: Iterable[Tuple[np.ndarray, np.ndarray]],
) -> Tuple[np.ndarray, np.ndarray]:
    """Run ``encode_fn`` (jit it once outside) over (images, labels) batches.

    Returns (features [N, D] L2-normalized fp32, labels [N]).
    """
    feats, labels = [], []
    for images, targets in batches:
        f = encode_fn(jnp.asarray(images))
        f = np.asarray(f, np.float32)
        f = f / (np.linalg.norm(f, axis=-1, keepdims=True) + 1e-12)
        feats.append(f)
        labels.append(np.asarray(targets))
    return np.concatenate(feats, 0), np.concatenate(labels, 0)


def build_prototypes(
    features: np.ndarray,
    labels: np.ndarray,
    num_classes: int,
    k: int = 3,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (global [C, D], local [C, K, D]) prototype arrays.

    Classes with fewer than ``k`` samples replicate their cluster means to
    keep the [C, K, D] shape static (XLA needs it; the reference's ragged
    ``np.array`` would fail there anyway for such classes).
    """
    d = features.shape[1]
    global_p = np.zeros((num_classes, d), np.float32)
    local_p = np.zeros((num_classes, k, d), np.float32)
    for c in range(num_classes):
        cls = features[labels == c]
        if len(cls) == 0:
            continue
        global_p[c] = cls.mean(0)
        cluster_labels = agglomerative_average(cls, min(k, len(cls)))
        means = [cls[cluster_labels == li].mean(0)
                 for li in range(cluster_labels.max() + 1)]
        for ki in range(k):
            local_p[c, ki] = means[ki % len(means)]
    return global_p, local_p


def normalize_prototypes(
    global_p: np.ndarray, local_p: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Row-normalize both arrays (reference load-time behavior)."""
    g = global_p / (np.linalg.norm(global_p, axis=-1, keepdims=True) + 1e-12)
    l = local_p / (np.linalg.norm(local_p, axis=-1, keepdims=True) + 1e-12)
    return g.astype(np.float32), l.astype(np.float32)


def save_prototypes(path: str, global_p: np.ndarray, local_p: np.ndarray) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, global_prototypes=global_p, local_prototypes=local_p)


def load_prototypes(path: str) -> Tuple[np.ndarray, np.ndarray]:
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    return normalize_prototypes(
        data["global_prototypes"], data["local_prototypes"]
    )
