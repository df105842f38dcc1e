"""SDXL-base UNet geometry: per-block heads/depth + additive conditioning
(BASELINE config 5 groundwork). Uses a scaled-down SDXL-shaped config so it
runs on CPU."""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from distdiff_tpu.config import UNetConfig
from distdiff_tpu.models import UNet2DCondition


def _sdxl_tiny():
    return UNetConfig(
        block_out_channels=(16, 32, 64),
        layers_per_block=1,
        cross_attention=(False, True, True),
        transformer_depth=(0, 1, 2),
        num_attention_heads=(2, 2, 4),
        cross_attention_dim=32,
        addition_embed_dim=24,
        dtype=jnp.float32,
        remat=False,
    )


def test_sdxl_tiny_forward():
    cfg = _sdxl_tiny()
    unet = UNet2DCondition(cfg)
    x = jnp.zeros((2, 16, 16, 4))
    ctx = jnp.zeros((2, 12, 32))
    added = jnp.zeros((2, 24))
    params = jax.jit(unet.init)(jax.random.PRNGKey(0), x, jnp.array([1]), ctx, added)
    out = jax.jit(unet.apply)(params, x, jnp.array([3, 7]), ctx, added)
    assert out.shape == (2, 16, 16, 4)

    # first block has depth 0: no attention modules under down_0
    names = set(params["params"].keys())
    assert not any(n.startswith("down_0_attn") for n in names)
    assert any(n.startswith("down_1_attn") for n in names)
    assert "add_embedding" in names


def test_added_cond_required():
    cfg = _sdxl_tiny()
    unet = UNet2DCondition(cfg)
    x = jnp.zeros((1, 16, 16, 4))
    ctx = jnp.zeros((1, 12, 32))
    with pytest.raises(AssertionError, match="added_cond"):
        unet.init(jax.random.PRNGKey(0), x, jnp.array([1]), ctx)


def test_sdxl_base_config_shape():
    cfg = UNetConfig.sdxl_base()
    assert cfg.depth_at(2) == 10 and cfg.depth_at(0) == 0
    assert cfg.heads_at(2) == 20
    assert cfg.block_out_channels == (320, 640, 1280)
    assert cfg.addition_embed_dim == 2816
