"""Sequence-parallel (ring) attention over a device-mesh axis.

The reference has no model or sequence parallelism (its workload is
embarrassingly data-parallel — SURVEY §2.7); this is TPU-native framework
surface beyond it, completing the mesh story next to ``parallel/tp.py``:
when a single chip cannot hold one image's attention activations (long
token counts — SDXL-scale resolutions and above), shard the TOKEN axis
across devices and keep attention exact with a ring:

  * every device holds a ``[B, T/n, H, D]`` shard of q, k and v;
  * ``n`` ring steps: each device runs the local flash kernel against the
    kv shard it currently holds (``ops.flash.flash_attention_lse``), merges
    the partial output into a running (out, lse) accumulator with a
    numerically-stable logsumexp combine, and ``ppermute``s the kv shard to
    its neighbour — the collective rides ICI and overlaps with the next
    step's compute under XLA's async collectives;
  * after ``n`` steps every kv shard has visited every device (and is back
    home), and the accumulator equals exact full-sequence attention.

The ring is written as a ``lax.scan`` over ``ppermute`` so reverse-mode AD
derives the backward ring automatically: the lse cotangent that carries the
global-softmax normalization across shards flows into the flash kernel's
custom VJP (``flash.py: delta_sub``) — guidance can differentiate through
sequence-parallel attention just like through the single-chip kernel.

Cross-attention needs no ring: the 77-token text context is tiny, so kv is
replicated and only q is sharded (``sp_cross_attention``).

Exercised on the 8-virtual-device CPU mesh in ``tests/test_parallel_sp.py``
and by ``__graft_entry__.dryrun_multichip``'s sp segment.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax layout
    from jax.experimental.shard_map import shard_map  # type: ignore

SEQ_AXIS = "seq"

_NEG = -1e30  # avoid -inf: exp(-inf - (-inf)) is nan in the first merge


def _attn_lse(q, k, v):
    """Local (single-device) attention returning (out, lse).

    Pallas flash on TPU (or when forced for interpreter-mode tests), XLA
    reference elsewhere — same dispatch contract as ``ops.attention``.
    """
    from distdiff_tpu.ops.attention import _use_pallas

    if _use_pallas():
        from distdiff_tpu.ops import flash

        return flash.flash_attention_lse(q, k, v)
    return xla_attention_lse(q, k, v)


def xla_attention_lse(q, k, v):
    """Pure-XLA attention with the row logsumexp (fp32 softmax)."""
    scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    lse = jax.scipy.special.logsumexp(s, axis=-1)  # [B,H,Tq]
    p = jnp.exp(s - lse[..., None])
    out = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v)
    return out.astype(q.dtype), jnp.transpose(lse, (0, 2, 1))


def _merge(o_a, l_a, o_b, l_b):
    """Combine two attention partials over disjoint kv sets.

    o_* [B,T,H,D] (o_a fp32 accumulator), l_* [B,T,H] fp32 logsumexp.
    """
    m = jnp.maximum(l_a, l_b)
    wa = jnp.exp(l_a - m)
    wb = jnp.exp(l_b - m)
    den = wa + wb
    o = (wa[..., None] * o_a + wb[..., None] * o_b.astype(jnp.float32))
    return o / den[..., None], m + jnp.log(den)


def ring_attention(q, k, v, *, axis_name: str, axis_size: int):
    """Exact full-sequence attention from per-device token shards.

    Call INSIDE ``shard_map`` over ``axis_name``; all of q/k/v are the local
    ``[B, T/axis_size, H, D]`` shards. Returns the local out shard.
    """
    o0 = jnp.zeros(q.shape, jnp.float32)
    l0 = jnp.full(q.shape[:3], _NEG, jnp.float32)
    # kv shard i travels i -> i+1 each step; after axis_size steps it is
    # home again (the scan carry ends where it started — no re-layout).
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]

    def step(carry, _):
        o, l, kc, vc = carry
        oi, li = _attn_lse(q, kc, vc)
        o, l = _merge(o, l, oi, li)
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        return (o, l, kc, vc), None

    (o, _, _, _), _ = jax.lax.scan(step, (o0, l0, k, v), None,
                                   length=axis_size)
    return o.astype(q.dtype)


def make_sp_mesh(n_seq: int, devices=None) -> Mesh:
    import numpy as np

    devices = list(devices) if devices is not None else jax.devices()
    assert len(devices) >= n_seq, (len(devices), n_seq)
    return Mesh(np.asarray(devices[:n_seq]), (SEQ_AXIS,))


def sp_attention(q, k, v, mesh: Mesh, seq_axis: str = SEQ_AXIS):
    """Self-attention with the TOKEN axis sharded over ``mesh[seq_axis]``.

    Global shapes ``[B, T, H, D]`` (T divisible by the axis size); returns
    the global-shape result, sharded the same way. Exact — not windowed.
    """
    n = mesh.shape[seq_axis]
    spec = P(None, seq_axis, None, None)
    f = shard_map(
        functools.partial(ring_attention, axis_name=seq_axis, axis_size=n),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    return f(q, k, v)


def sp_cross_attention(q, k, v, mesh: Mesh, seq_axis: str = SEQ_AXIS):
    """Cross-attention under sequence parallelism: q sharded over tokens,
    the (short) kv context replicated — no collectives at all."""
    qspec = P(None, seq_axis, None, None)
    kvspec = P(None, None, None, None)

    def local(qs, ks, vs):
        out, _ = _attn_lse(qs, ks, vs)
        return out

    f = shard_map(local, mesh=mesh, in_specs=(qspec, kvspec, kvspec),
                  out_specs=qspec, check_vma=False)
    return f(q, k, v)
