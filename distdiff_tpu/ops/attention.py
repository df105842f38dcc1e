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

import contextlib
import functools
import os

import jax
import jax.numpy as jnp


def _use_pallas() -> bool:
    if os.environ.get("DISTDIFF_FORCE_XLA_ATTENTION"):
        return False
    if os.environ.get("DISTDIFF_FORCE_PALLAS_ATTENTION"):
        # test hook: Pallas even off-TPU (pairs with interpreter mode)
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# --------------------------------------------------- tensor-parallel context
#
# GSPMD cannot partition a Pallas custom call, so under tensor parallelism
# the kernel is wrapped in jax.shard_map instead: attention is independent
# per (batch, head), so each device runs the kernel on its local
# [B/nd, T, H/nm, D] block with NO collectives — the qkv projections ahead
# of it are column-parallel (head-sliced) and to_out behind it row-parallel,
# exactly the Megatron layout parallel/tp.py annotates. Enter the context
# around TRACING (the jit call) of a TP-sharded program.

_TP_CTX = {"mesh": None, "data_axis": None, "model_axis": None}


def set_tp_attention(mesh, data_axis: str = "data",
                     model_axis: str = "model") -> None:
    """Persistent (process-lifetime) variant of ``tp_sharded_attention``
    for CLI drivers whose jitted programs trace lazily at first dispatch —
    a ``with`` block around construction would have exited by then. Pass
    ``mesh=None`` to reset."""
    if mesh is None:
        _TP_CTX.update(mesh=None, data_axis=None, model_axis=None)
    else:
        _TP_CTX.update(mesh=mesh, data_axis=data_axis, model_axis=model_axis)


@contextlib.contextmanager
def tp_sharded_attention(mesh, data_axis: str = "data",
                         model_axis: str = "model"):
    """Route ``attention`` through a shard_map'd flash kernel over ``mesh``
    while tracing. Heads shard over ``model_axis`` (falls back to
    head-replicated compute when the head count does not divide)."""
    old = dict(_TP_CTX)
    _TP_CTX.update(mesh=mesh, data_axis=data_axis, model_axis=model_axis)
    try:
        yield
    finally:
        _TP_CTX.update(old)


def _tp_attention(q, k, v, mesh, data_axis, model_axis):
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax layout
        from jax.experimental.shard_map import shard_map

    from distdiff_tpu.ops import flash

    h = q.shape[2]
    nm = mesh.shape[model_axis]
    head_axis = model_axis if (h % nm == 0 and h >= nm) else None
    spec = P(data_axis, None, head_axis, None)
    f = shard_map(
        flash.flash_attention, mesh=mesh,
        in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    return f(q, k, v)


def xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Reference attention in pure XLA (fp32 softmax). [B,T,H,D] layout."""
    scale = 1.0 / (q.shape[-1] ** 0.5)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    return out.astype(q.dtype)


# r3 probe (scripts in /tmp, recorded in CLAUDE.md): at the 77-token cross
# shapes the flash path costs 1.4-1.7ms/layer (CFG-16 T4096) against XLA's
# 0.50ms — the [B,T,H,D]->[BH,T,D] relayout + per-block launches dwarf the
# ~4 GFLOP of real work, while XLA folds the transposes into its einsums.
# Small-kv attention therefore dispatches to XLA; flash handles the big
# self-attention where it is 2.4-4x ahead.
_XLA_SMALL_KV = int(os.environ.get("DISTDIFF_XLA_CROSS_KV", "256"))


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Multi-head attention, dispatching to the fastest available path."""
    if _use_pallas() and k.shape[1] > _XLA_SMALL_KV:
        if _TP_CTX["mesh"] is not None:
            return _tp_attention(q, k, v, _TP_CTX["mesh"],
                                 _TP_CTX["data_axis"], _TP_CTX["model_axis"])
        from distdiff_tpu.ops import flash  # deferred: pallas import is TPU-only

        return flash.flash_attention(q, k, v)
    return xla_attention(q, k, v)


# ------------------------------------------------------ head-major variant
#
# Producers that project qkv straight into head-major [B,H,T,D] (one einsum,
# transpose folded into the dot's output layout — scripts/headmajor_probe.py)
# call this variant; it skips flash's [B,T,H,D]->[BH,T,D] relayout entirely.
# Worth using when T is large enough that the relayout passes dominate the
# projection (>= ~1024 tokens at SD widths); tiny-T stages keep Dense.

def wants_head_major(tq: int) -> bool:
    min_t = int(os.environ.get("DISTDIFF_HEAD_MAJOR_MIN_T", "1024"))
    return min_t > 0 and tq >= min_t


def xla_attention_hm(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Reference attention in pure XLA over head-major [B,H,T,D] tensors."""
    scale = 1.0 / (q.shape[-1] ** 0.5)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
    return out.astype(q.dtype)


def _tp_attention_hm(q, k, v, mesh, data_axis, model_axis):
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax layout
        from jax.experimental.shard_map import shard_map

    from distdiff_tpu.ops import flash

    h = q.shape[1]
    nm = mesh.shape[model_axis]
    head_axis = model_axis if (h % nm == 0 and h >= nm) else None
    spec = P(data_axis, head_axis, None, None)
    f = shard_map(
        flash.flash_attention_hm, mesh=mesh,
        in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    return f(q, k, v)


def attention_hm(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Multi-head attention over head-major [B,H,T,D] q/k/v -> [B,H,T,D]."""
    if _use_pallas() and k.shape[2] > _XLA_SMALL_KV:
        if _TP_CTX["mesh"] is not None:
            return _tp_attention_hm(q, k, v, _TP_CTX["mesh"],
                                    _TP_CTX["data_axis"], _TP_CTX["model_axis"])
        from distdiff_tpu.ops import flash  # deferred: pallas import is TPU-only

        return flash.flash_attention_hm(q, k, v)
    return xla_attention_hm(q, k, v)
