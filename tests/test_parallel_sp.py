"""Sequence-parallel ring attention (parallel/sp.py) on the 8-device CPU
mesh: the ring must be EXACT vs full attention (forward and gradients —
the lse cotangent carries the global softmax normalization across shards),
with both the XLA local op and the Pallas kernel (interpreter mode)."""

import os

import numpy as np
import pytest

os.environ.setdefault("DISTDIFF_PALLAS_INTERPRET", "1")

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from distdiff_tpu.ops import flash  # noqa: E402
from distdiff_tpu.ops.attention import xla_attention  # noqa: E402
from distdiff_tpu.parallel.sp import (  # noqa: E402
    make_sp_mesh,
    ring_attention,
    sp_attention,
    sp_cross_attention,
    xla_attention_lse,
)

flash.INTERPRET = True  # in case another module imported flash first


def _rand(shape, seed, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(*shape), dtype)


def test_xla_attention_lse_matches_oracle():
    q = _rand((2, 16, 2, 8), 0)
    k = _rand((2, 24, 2, 8), 1)
    v = _rand((2, 24, 2, 8), 2)
    out, lse = xla_attention_lse(q, k, v)
    np.testing.assert_allclose(out, xla_attention(q, k, v), atol=1e-5)
    s = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(q.shape[-1])
    ref = np.log(np.exp(s - s.max(-1, keepdims=True)).sum(-1)) + s.max(-1)
    np.testing.assert_allclose(lse, np.transpose(ref, (0, 2, 1)), atol=1e-5)


def test_flash_lse_forward_and_grads():
    """flash_attention_lse == xla_attention_lse including BOTH cotangents
    (g_out and g_lse -> the delta_sub fold in the backward kernels)."""
    q = _rand((1, 48, 2, 16), 3)
    k = _rand((1, 40, 2, 16), 4)
    v = _rand((1, 40, 2, 16), 5)
    w_o = _rand((1, 48, 2, 16), 6)
    w_l = _rand((1, 48, 2), 7)

    def loss(fn, q, k, v):
        out, lse = fn(q, k, v)
        return jnp.sum(out * w_o) + jnp.sum(lse * w_l)

    ref_out, ref_lse = xla_attention_lse(q, k, v)
    out, lse = flash.flash_attention_lse(q, k, v)
    np.testing.assert_allclose(out, ref_out, atol=2e-4)
    np.testing.assert_allclose(lse, ref_lse, atol=2e-4)

    g_ref = jax.grad(lambda *a: loss(xla_attention_lse, *a), (0, 1, 2))(q, k, v)
    g = jax.grad(lambda *a: loss(flash.flash_attention_lse, *a), (0, 1, 2))(
        q, k, v)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(a, b, atol=5e-4)


@pytest.mark.parametrize("n_seq", [2, 4])
def test_sp_attention_matches_full(n_seq):
    mesh = make_sp_mesh(n_seq)
    q = _rand((2, 64, 2, 8), 10)
    k = _rand((2, 64, 2, 8), 11)
    v = _rand((2, 64, 2, 8), 12)
    out = jax.jit(lambda a, b, c: sp_attention(a, b, c, mesh))(q, k, v)
    np.testing.assert_allclose(out, xla_attention(q, k, v), atol=1e-5)


def test_sp_attention_grads_match_full():
    """Gradients through the ring (scan + ppermute + logsumexp merge) must
    equal full-attention gradients — this is where the cross-shard softmax
    normalization cotangent matters."""
    mesh = make_sp_mesh(4)
    q = _rand((1, 32, 2, 8), 20)
    k = _rand((1, 32, 2, 8), 21)
    v = _rand((1, 32, 2, 8), 22)
    w = _rand((1, 32, 2, 8), 23)

    def ring_loss(q, k, v):
        return jnp.sum(sp_attention(q, k, v, mesh) * w)

    def full_loss(q, k, v):
        return jnp.sum(xla_attention(q, k, v) * w)

    g = jax.jit(jax.grad(ring_loss, (0, 1, 2)))(q, k, v)
    g_ref = jax.grad(full_loss, (0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_sp_attention_pallas_local_op(monkeypatch):
    """The ring with the Pallas flash kernel (interpreter mode) as the
    local op — the TPU configuration, exactness included."""
    monkeypatch.setenv("DISTDIFF_FORCE_PALLAS_ATTENTION", "1")
    mesh = make_sp_mesh(2)
    q = _rand((1, 64, 1, 16), 30)
    k = _rand((1, 64, 1, 16), 31)
    v = _rand((1, 64, 1, 16), 32)
    w = _rand((1, 64, 1, 16), 33)
    out = sp_attention(q, k, v, mesh)
    np.testing.assert_allclose(out, xla_attention(q, k, v), atol=2e-4)

    g = jax.grad(lambda *a: jnp.sum(sp_attention(*a, mesh) * w), (0, 1, 2))(
        q, k, v)
    g_ref = jax.grad(lambda *a: jnp.sum(xla_attention(*a) * w), (0, 1, 2))(
        q, k, v)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(a, b, atol=5e-4)


def test_sp_cross_attention():
    mesh = make_sp_mesh(4)
    q = _rand((2, 64, 2, 8), 40)
    k = _rand((2, 12, 2, 8), 41)  # short replicated context (text tokens)
    v = _rand((2, 12, 2, 8), 42)
    out = jax.jit(lambda a, b, c: sp_cross_attention(a, b, c, mesh))(q, k, v)
    np.testing.assert_allclose(out, xla_attention(q, k, v), atol=1e-5)


def test_ring_attention_single_device_degenerates():
    """axis_size=1: the ring is one local attention call, no collectives."""
    mesh = make_sp_mesh(1)
    q = _rand((1, 32, 2, 8), 50)
    k = _rand((1, 32, 2, 8), 51)
    v = _rand((1, 32, 2, 8), 52)
    out = sp_attention(q, k, v, mesh)
    np.testing.assert_allclose(out, xla_attention(q, k, v), atol=1e-5)
