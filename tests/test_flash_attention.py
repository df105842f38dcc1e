"""Flash attention kernels vs the XLA reference, in interpreter mode on CPU.

The same kernels are validated on real TPU hardware by `bench.py --check`.
"""

import os

os.environ["DISTDIFF_PALLAS_INTERPRET"] = "1"

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from distdiff_tpu.ops.attention import xla_attention
from distdiff_tpu.ops.flash import flash_attention


@pytest.mark.parametrize(
    "b,tq,tk,h,d",
    [
        (1, 128, 128, 2, 40),   # self-attention, unpadded head dim 40
        (1, 200, 77, 2, 64),    # cross-attention, ragged q and kv lengths
        (2, 64, 64, 1, 160),    # small spatial map, large head dim
        (1, 256, 256, 2, 40),   # single-block kernel, mask elided (exact)
        (1, 300, 130, 2, 40),   # single-block kernel, padded q AND kv
        (2, 512, 512, 1, 512),  # multi-block via the large-head shrink
    ],
)
def test_flash_forward_matches_xla(b, tq, tk, h, d):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, tq, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, tk, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, tk, h, d), jnp.float32)
    out = flash_attention(q, k, v)
    ref = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize(
    "tq,tk,d",
    [
        (256, 256, 40),   # exact multiples: bwd masks elided
        (200, 130, 64),   # padded q and kv rows in the bwd kernels
    ],
)
def test_flash_grads_match_xla_shapes(tq, tk, d):
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(1, tq, 2, d), jnp.float32)
    k = jnp.asarray(rng.randn(1, tk, 2, d), jnp.float32)
    v = jnp.asarray(rng.randn(1, tk, 2, d), jnp.float32)
    g1 = jax.grad(lambda *a: jnp.sum(flash_attention(*a) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda *a: jnp.sum(xla_attention(*a) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-5, rtol=5e-4)


def test_flash_grads_match_xla():
    rng = np.random.RandomState(1)
    b, tq, tk, h, d = 1, 160, 77, 2, 40
    q = jnp.asarray(rng.randn(b, tq, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, tk, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, tk, h, d), jnp.float32)
    w = jnp.asarray(rng.randn(b, tq, h, d), jnp.float32)

    g1 = jax.grad(lambda *a: jnp.sum(flash_attention(*a) * w), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda *a: jnp.sum(xla_attention(*a) * w), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5, rtol=5e-4)


# -------------------------------------------------- round-3 softmax variants

def _run_fwd(b=1, tq=256, tk=384, h=2, d=40, seed=5):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(b, tq, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, tk, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, tk, h, d), jnp.float32)
    return flash_attention(q, k, v), xla_attention(q, k, v)


def test_online_kernel_matl_path(monkeypatch):
    """Multi-kv-block online kernel with l in the accumulator's ones
    column: force small kv blocks so nk > 1 at d=40."""
    monkeypatch.setenv("DISTDIFF_FLASH_BK", "128")
    monkeypatch.setenv("DISTDIFF_FLASH_BQ", "128")
    out, ref = _run_fwd(tq=256, tk=384)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # and with a padded (non-multiple) kv length
    out, ref = _run_fwd(tq=256, tk=300)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_matl_off_matches(monkeypatch):
    import distdiff_tpu.ops.flash as fl

    monkeypatch.setattr(fl, "_MAT_L", False)
    monkeypatch.setenv("DISTDIFF_FLASH_BK", "128")
    out, ref = _run_fwd(tq=128, tk=384)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_nomax_constant_shift(monkeypatch):
    """Constant-shift softmax (no row max): same probabilities, same lse,
    also through the backward (lse is what the bwd kernels consume)."""
    import distdiff_tpu.ops.flash as fl

    monkeypatch.setattr(fl, "_NO_MAX", True)
    out, ref = _run_fwd(tq=128, tk=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # online path too
    monkeypatch.setenv("DISTDIFF_FLASH_BK", "128")
    out, ref = _run_fwd(tq=128, tk=384)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    rng = np.random.RandomState(6)
    q = jnp.asarray(rng.randn(1, 128, 2, 40), jnp.float32)
    k = jnp.asarray(rng.randn(1, 128, 2, 40), jnp.float32)
    v = jnp.asarray(rng.randn(1, 128, 2, 40), jnp.float32)
    g1 = jax.grad(lambda *a: jnp.sum(flash_attention(*a) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda *a: jnp.sum(xla_attention(*a) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-5, rtol=5e-4)


def test_bf16_p_close(monkeypatch):
    """bf16 exp path: looser tolerance (p carries ~3 decimal digits)."""
    import distdiff_tpu.ops.flash as fl

    monkeypatch.setattr(fl, "_BF16_P", True)
    out, ref = _run_fwd(tq=128, tk=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_split_bwd_matches_fused(monkeypatch):
    """Both backward implementations (fused single-kernel and the split
    dq/dkv pair) stay available and agree."""
    import distdiff_tpu.ops.flash as fl

    rng = np.random.RandomState(9)
    q = jnp.asarray(rng.randn(1, 200, 2, 40), jnp.float32)
    k = jnp.asarray(rng.randn(1, 130, 2, 40), jnp.float32)
    v = jnp.asarray(rng.randn(1, 130, 2, 40), jnp.float32)
    loss = lambda *a: jnp.sum(flash_attention(*a) ** 2)

    monkeypatch.setattr(fl, "_FUSED_BWD", True)
    g_f = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    monkeypatch.setattr(fl, "_FUSED_BWD", False)
    g_s = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_f, g_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize(
    "b,h,tq,tk,d",
    [
        (1, 2, 128, 128, 40),   # unpadded head dim
        (1, 2, 300, 130, 40),   # padded q AND kv tails
        (2, 1, 256, 256, 512),  # big-D shrink + split backward
    ],
)
def test_flash_head_major_matches_xla(b, h, tq, tk, d):
    """Head-major entry: fwd + grads agree with the (transposed) 4-D path,
    so the relayout-free projection path is numerically identical."""
    from distdiff_tpu.ops.attention import xla_attention_hm
    from distdiff_tpu.ops.flash import flash_attention_hm

    rng = np.random.RandomState(11)
    q = jnp.asarray(rng.randn(b, h, tq, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, tk, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, tk, d), jnp.float32)
    out = flash_attention_hm(q, k, v)
    ref = xla_attention_hm(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    g1 = jax.grad(lambda *a: jnp.sum(flash_attention_hm(*a) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda *a: jnp.sum(xla_attention_hm(*a) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-5, rtol=5e-4)


def test_attention_module_head_major_equivalent(monkeypatch):
    """The Attention module's head-major path (HeadMajorProj + attention_hm)
    matches the Dense path bit-for-bit in param tree and numerically in
    output, self- AND cross-attention."""
    from distdiff_tpu.models.layers import Attention

    b, t, c = 2, 64, 32
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(b, t, c), jnp.float32)
    ctx = jnp.asarray(rng.randn(b, 7, c), jnp.float32)
    mod = Attention(num_heads=4, head_dim=8, dtype=jnp.float32)

    monkeypatch.setenv("DISTDIFF_HEAD_MAJOR_MIN_T", "0")
    p_dense = mod.init(jax.random.PRNGKey(0), x, ctx)
    y_self_dense = mod.apply(mod.init(jax.random.PRNGKey(0), x), x)
    y_cross_dense = mod.apply(p_dense, x, ctx)

    monkeypatch.setenv("DISTDIFF_HEAD_MAJOR_MIN_T", "1")
    p_hm = mod.init(jax.random.PRNGKey(0), x, ctx)
    assert jax.tree_util.tree_structure(p_dense) == jax.tree_util.tree_structure(p_hm)
    assert [a.shape for a in jax.tree_util.tree_leaves(p_dense)] == \
           [a.shape for a in jax.tree_util.tree_leaves(p_hm)]
    y_self_hm = mod.apply(mod.init(jax.random.PRNGKey(0), x), x)
    y_cross_hm = mod.apply(p_dense, x, ctx)
    np.testing.assert_allclose(np.asarray(y_self_hm), np.asarray(y_self_dense),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(y_cross_hm), np.asarray(y_cross_dense),
                               atol=2e-5, rtol=2e-5)
