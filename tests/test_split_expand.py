"""Split-program expansion path: matches the fused program's semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from distdiff_tpu.config import GuidanceConfig, PipelineConfig
from distdiff_tpu.models.guide import create_model
from distdiff_tpu.parallel import make_mesh
from distdiff_tpu.sampling import ExpansionPipeline, SamplerConfig


def _pipe(gtype):
    cfg = PipelineConfig.tiny(sample_size=32)
    guide = create_model("tiny_resnet", num_classes=3, input_size=32)
    rng = np.random.RandomState(0)
    return ExpansionPipeline.create(
        cfg,
        sampler_cfg=SamplerConfig(guidance_scale=3.0),
        guidance_cfg=GuidanceConfig(
            guidance_type=gtype, guidance_step=4, guidance_period=2, K=2,
            guide_input_size=32, rho=0.5,
        ),
        guide=guide,
        global_protos=rng.randn(3, guide.feature_dim).astype(np.float32),
        local_protos=rng.randn(3, 2, guide.feature_dim).astype(np.float32),
    )


@pytest.mark.parametrize("gtype", ["none", "transform_guidance", "direct_guidance"])
def test_split_matches_fused(gtype):
    pipe = _pipe(gtype)
    params = pipe.full_params()
    ls = pipe.config.latent_size
    rng = np.random.RandomState(1)
    lat = jnp.asarray(rng.randn(2, ls, ls, 4), jnp.float32) * 0.2
    cond = jnp.asarray(rng.randn(2, 8, 32), jnp.float32)
    uncond = jnp.asarray(rng.randn(2, 8, 32), jnp.float32)
    targets = jnp.asarray([0, 2])
    keys = jnp.stack([jax.random.PRNGKey(3), jax.random.PRNGKey(9)])

    fused = jax.jit(pipe.make_expand_fn())
    split = pipe.make_split_expand()
    a = fused(params, lat, cond, uncond, targets, keys)
    b = split(params, lat, cond, uncond, targets, keys)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_decode_chunk_matches_unchunked():
    """decode_chunk slices the tail denoise+decode span per sub-batch —
    samples are independent, so chunked == unchunked exactly (it is the
    same compiled program applied to slices)."""
    pipe = _pipe("transform_guidance")
    params = pipe.full_params()
    ls = pipe.config.latent_size
    rng = np.random.RandomState(4)
    lat = jnp.asarray(rng.randn(4, ls, ls, 4), jnp.float32) * 0.2
    cond = jnp.asarray(rng.randn(4, 8, 32), jnp.float32)
    uncond = jnp.asarray(rng.randn(4, 8, 32), jnp.float32)
    targets = jnp.asarray([0, 2, 1, 0])
    keys = jnp.stack([jax.random.PRNGKey(i) for i in range(4)])

    plain = pipe.make_split_expand()
    chunked = pipe.make_split_expand(decode_chunk=2)
    a = plain(params, lat, cond, uncond, targets, keys)
    b = chunked(params, lat, cond, uncond, targets, keys)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_split_sharded_on_mesh():
    pipe = _pipe("transform_guidance")
    mesh = make_mesh()
    split = pipe.make_split_expand(mesh=mesh)
    params = pipe.full_params()
    ls = pipe.config.latent_size
    b = mesh.devices.size
    rng = np.random.RandomState(2)
    lat = jnp.asarray(rng.randn(b, ls, ls, 4), jnp.float32) * 0.2
    cond = jnp.asarray(rng.randn(b, 8, 32), jnp.float32)
    uncond = jnp.asarray(rng.randn(b, 8, 32), jnp.float32)
    targets = jnp.asarray(np.arange(b) % 3)
    keys = jnp.stack([jax.random.PRNGKey(i) for i in range(b)])
    out = split(params, lat, cond, uncond, targets, keys)
    assert out.shape == (b, 32, 32, 3)
    # per-sample determinism: the same key in a different batch slot on a
    # single-sample call gives the same image
    single = pipe.make_split_expand()
    one = single(params, lat[3:4], cond[3:4], uncond[3:4], targets[3:4], keys[3:4])
    # The 8-device and single-device programs fuse/reassociate differently;
    # ~1e-3 drift over 25 fp32 steps is layout noise, not a semantics bug
    # (the PRNG draws are identical by construction — fused-vs-split above
    # matches at 2e-5 on the same device layout).
    np.testing.assert_allclose(np.asarray(out[3]), np.asarray(one[0]), atol=8e-3)
