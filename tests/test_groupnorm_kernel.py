"""Pallas GroupNorm kernel vs the XLA reference (interpreter mode on CPU)."""

import os

os.environ["DISTDIFF_PALLAS_INTERPRET"] = "1"

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from distdiff_tpu.ops.groupnorm import (
    _pallas_group_norm,
    group_norm,
    xla_group_norm,
)


@pytest.mark.parametrize("b,hw,c,groups", [
    (2, 64, 128, 32),
    (1, 16, 256, 32),
    (3, 9, 128, 8),
])
def test_pallas_matches_xla(b, hw, c, groups):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, hw, c) * 2 + 1, jnp.float32)
    scale = jnp.asarray(rng.randn(c), jnp.float32)
    bias = jnp.asarray(rng.randn(c), jnp.float32)
    ref = xla_group_norm(x, scale, bias, groups)
    out = _pallas_group_norm(x, scale, bias, groups, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_group_norm_4d_and_grad():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 8, 128), jnp.float32)
    scale = jnp.ones(128)
    bias = jnp.zeros(128)
    out = group_norm(x, scale, bias, 32)
    ref = xla_group_norm(x, scale, bias, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    # custom-vjp backward equals the XLA gradient
    g1 = jax.grad(lambda xx: jnp.sum(group_norm(xx, scale, bias, 32) ** 2))(x)
    g2 = jax.grad(lambda xx: jnp.sum(xla_group_norm(xx, scale, bias, 32) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-3,
                               rtol=2e-3)
