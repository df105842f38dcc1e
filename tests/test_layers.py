"""Layer-level golden tests (GroupNorm vs numpy oracle, timestep embedding)."""

import jax
import jax.numpy as jnp
import numpy as np

from distdiff_tpu.models.layers import GroupNorm, timestep_embedding


def _gn_oracle(x, groups, scale, bias, eps=1e-5):
    b, h, w, c = x.shape
    xg = x.reshape(b, h, w, groups, c // groups).astype(np.float64)
    mean = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = xg.var(axis=(1, 2, 4), keepdims=True)
    xn = (xg - mean) / np.sqrt(var + eps)
    return (xn.reshape(b, h, w, c) * scale + bias).astype(np.float32)


def test_groupnorm_matches_oracle():
    rng = np.random.RandomState(0)
    for c, groups in [(32, 32), (64, 32), (40, 8), (16, 4)]:
        x = rng.randn(2, 5, 7, c).astype(np.float32) * 3 + 1
        gn = GroupNorm(num_groups=groups, dtype=jnp.float32)
        variables = gn.init(jax.random.PRNGKey(0), jnp.asarray(x))
        scale = rng.randn(c).astype(np.float32)
        bias = rng.randn(c).astype(np.float32)
        variables = {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}
        out = gn.apply(variables, jnp.asarray(x))
        ref = _gn_oracle(x, min(groups, c), scale, bias)
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-4)


def test_groupnorm_3d_tokens():
    # GroupNorm over [B, T, C] (SpatialTransformer applies it pre-reshape,
    # but keep the op shape-generic)
    rng = np.random.RandomState(1)
    x = rng.randn(2, 9, 32).astype(np.float32)
    gn = GroupNorm(num_groups=8, dtype=jnp.float32)
    v = gn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = gn.apply(v, jnp.asarray(x))
    assert out.shape == x.shape
    # unit scale/zero bias init -> per-group standardization
    xg = x.reshape(2, 9, 8, 4)
    ref = (xg - xg.mean(axis=(1, 3), keepdims=True)) / np.sqrt(
        xg.var(axis=(1, 3), keepdims=True) + 1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out), ref.reshape(2, 9, 32), atol=2e-4, rtol=2e-4
    )


def test_timestep_embedding():
    emb = timestep_embedding(jnp.asarray([0, 500]), 320)
    assert emb.shape == (2, 320)
    # t=0: cos half = 1, sin half = 0
    np.testing.assert_allclose(np.asarray(emb[0, :160]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 160:]), 0.0, atol=1e-6)
