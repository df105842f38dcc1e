"""Hierarchical prototype energy — DistDiff's core objective.

Re-expresses the reference's energy accumulation (``generate_data.py:
706-717`` in transform mode, ``:749-759`` in direct mode) as a pure fp32
function of (features, targets, prototypes):

  E = gs * mean_b ||f_b - G[y_b]||2                      (global / class level)
    + ls * mean_b ||f_b - L[y_b, argmax_k <f_b, L[y_b,k]>]||2   (local / cluster)

The cluster is selected by maximum dot-product and the prototype is treated
as a constant (the reference detaches it); gradients flow only through the
features. The argmax is non-differentiable — under ``jax.grad`` it behaves
exactly like the reference's eager autograd (piecewise-constant selection).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def global_energy_per_sample(
    features: jnp.ndarray,         # [B, D] fp32
    targets: jnp.ndarray,          # [B] int
    global_protos: jnp.ndarray,    # [C, D] fp32
) -> jnp.ndarray:
    proto = jax.lax.stop_gradient(global_protos[targets])  # [B, D]
    return jnp.linalg.norm(features - proto, axis=-1)      # [B]


def local_energy_per_sample(
    features: jnp.ndarray,         # [B, D] fp32
    targets: jnp.ndarray,          # [B] int
    local_protos: jnp.ndarray,     # [C, K, D] fp32
) -> jnp.ndarray:
    protos = local_protos[targets]                      # [B, K, D]
    sims = jnp.einsum("bd,bkd->bk", features, protos)   # dot-product selection
    idx = jnp.argmax(sims, axis=-1)                     # [B]
    chosen = jax.lax.stop_gradient(
        jnp.take_along_axis(protos, idx[:, None, None], axis=1)[:, 0]
    )  # [B, D]
    return jnp.linalg.norm(features - chosen, axis=-1)  # [B]


def hierarchical_energy_per_sample(
    features: jnp.ndarray,
    targets: jnp.ndarray,
    global_protos: Optional[jnp.ndarray],
    local_protos: Optional[jnp.ndarray],
    gs: float = 1.0,
    ls: float = 1.0,
) -> jnp.ndarray:
    """Per-sample energies [B]. Samples are independent: guidance gradients
    wrt per-sample parameters are identical to running batch 1 (the
    reference's recipe, ``train_batch_size=1``) — summing instead of the
    reference's batch mean keeps gradient magnitudes batch-size invariant."""
    f32 = features.astype(jnp.float32)
    score = jnp.zeros(features.shape[0], jnp.float32)
    if global_protos is not None:
        score = score + gs * global_energy_per_sample(f32, targets, global_protos)
    if local_protos is not None:
        score = score + ls * local_energy_per_sample(f32, targets, local_protos)
    return score


def global_energy(features, targets, global_protos) -> jnp.ndarray:
    return global_energy_per_sample(
        features.astype(jnp.float32), targets, global_protos
    ).mean()


def local_energy(features, targets, local_protos) -> jnp.ndarray:
    return local_energy_per_sample(
        features.astype(jnp.float32), targets, local_protos
    ).mean()


def hierarchical_energy(
    features: jnp.ndarray,
    targets: jnp.ndarray,
    global_protos: Optional[jnp.ndarray],
    local_protos: Optional[jnp.ndarray],
    gs: float = 1.0,
    ls: float = 1.0,
) -> jnp.ndarray:
    """Batch-mean scalar energy (the reference's exact reduction,
    ``generate_data.py:707-717``)."""
    return hierarchical_energy_per_sample(
        features, targets, global_protos, local_protos, gs, ls
    ).mean()


def normalize(features: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """L2 row-normalization (direct_guidance normalizes features at
    ``generate_data.py:747``; transform_guidance does not — the asymmetry is
    preserved by the caller via ``GuidanceConfig.normalize_features``)."""
    return features / (jnp.linalg.norm(features, axis=-1, keepdims=True) + eps)
