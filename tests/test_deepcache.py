"""DeepCache-style cached UNet path (models/unet.py cache args +
sampling/deepcache.py loop)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from distdiff_tpu.config import GuidanceConfig, PipelineConfig
from distdiff_tpu.models import UNet2DCondition
from distdiff_tpu.models.guide import create_model
from distdiff_tpu.sampling import ExpansionPipeline, SamplerConfig


def _unet_and_params(cfg):
    unet = UNet2DCondition(cfg.unet)
    key = jax.random.PRNGKey(0)
    ls = cfg.latent_size
    x = jnp.zeros((1, ls, ls, 4), jnp.float32)
    ctx = jnp.zeros((1, 8, cfg.unet.cross_attention_dim), jnp.float32)
    params = unet.init(key, x, jnp.asarray([0]), ctx)["params"]
    return unet, params


def test_shallow_apply_reproduces_full_given_fresh_cache():
    """Feeding the full pass's own cache into the shallow pass at the SAME
    (x, t) must reproduce the full output exactly — the substitution point
    and skip bookkeeping are correct iff this holds."""
    cfg = PipelineConfig.tiny(sample_size=32)
    unet, params = _unet_and_params(cfg)
    rng = np.random.RandomState(0)
    ls = cfg.latent_size
    x = jnp.asarray(rng.randn(2, ls, ls, 4), jnp.float32)
    ctx = jnp.asarray(rng.randn(2, 8, cfg.unet.cross_attention_dim),
                      jnp.float32)
    t = jnp.asarray([7, 7])

    out_full, cache = unet.apply({"params": params}, x, t, ctx,
                                 return_cache=True)
    out_plain = unet.apply({"params": params}, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(out_plain),
                               rtol=1e-6, atol=1e-6)

    out_shallow = unet.apply({"params": params}, x, t, ctx,
                             deep_cache=cache)
    np.testing.assert_allclose(np.asarray(out_shallow),
                               np.asarray(out_full), rtol=1e-5, atol=1e-5)

    # a perturbed cache must change the output (the cache is live)
    out_pert = unet.apply({"params": params}, x, t, ctx,
                          deep_cache=cache + 1.0)
    assert float(jnp.abs(out_pert - out_full).max()) > 1e-3


def _pipe(deep_cache, interval=2, scheduler="ddim",
          gtype="transform_guidance", guide=None, protos=None):
    cfg = dataclasses.replace(
        PipelineConfig.tiny(sample_size=32),
        deep_cache=deep_cache, cache_interval=interval, scheduler=scheduler)
    gp, lp = protos
    return ExpansionPipeline.create(
        cfg,
        sampler_cfg=SamplerConfig(guidance_scale=3.0),
        guidance_cfg=GuidanceConfig(
            guidance_type=gtype, guidance_step=4, guidance_period=2, K=2,
            guide_input_size=32, rho=0.5,
        ),
        guide=guide, global_protos=gp, local_protos=lp, seed=0,
    )


@pytest.fixture(scope="module")
def guide_and_protos():
    guide = create_model("tiny_resnet", num_classes=3, input_size=32)
    rng = np.random.RandomState(0)
    return guide, (rng.randn(3, guide.feature_dim).astype(np.float32),
                   rng.randn(3, 2, guide.feature_dim).astype(np.float32))


def _bench_args(pipe):
    rng = np.random.RandomState(1)
    ls = pipe.config.latent_size
    lat = jnp.asarray(rng.randn(2, ls, ls, 4), jnp.float32) * 0.2
    cond = jnp.asarray(rng.randn(2, 8, 32), jnp.float32)
    uncond = jnp.asarray(rng.randn(2, 8, 32), jnp.float32)
    targets = jnp.asarray([0, 2])
    keys = jnp.stack([jax.random.PRNGKey(3), jax.random.PRNGKey(9)])
    return pipe.full_params(), lat, cond, uncond, targets, keys


def test_interval_one_equals_uncached(guide_and_protos):
    """cache_interval=1 takes a full step every step — the cached loop must
    reproduce the plain trajectory bit-for-bit (up to op reassociation)."""
    guide, protos = guide_and_protos
    cached = _pipe(True, interval=1, guide=guide, protos=protos)
    plain = _pipe(False, guide=guide, protos=protos)
    args = _bench_args(plain)
    a = jax.jit(cached.make_expand_fn())(*args)
    b = jax.jit(plain.make_expand_fn())(*args)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_cached_pipeline_runs_and_split_matches(guide_and_protos):
    guide, protos = guide_and_protos
    pipe = _pipe(True, interval=2, guide=guide, protos=protos)
    args = _bench_args(pipe)
    a = jax.jit(pipe.make_expand_fn())(*args)
    assert np.all(np.isfinite(np.asarray(a)))
    assert float(jnp.min(a)) >= 0.0 and float(jnp.max(a)) <= 1.0
    b = pipe.make_split_expand()(*args)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    # caching actually changes the (approximate) trajectory...
    plain = _pipe(False, guide=guide, protos=protos)
    c = jax.jit(plain.make_expand_fn())(*args)
    d = float(jnp.abs(a - c).max())
    assert d > 1e-6
    # ...but stays a bounded approximation of it (random tiny weights are
    # the hardest case — real UNets have far smoother features)
    assert d < 0.5, d


def test_deep_cache_rejects_dpmpp(guide_and_protos):
    guide, protos = guide_and_protos
    pipe = _pipe(True, scheduler="dpmpp", guide=guide, protos=protos)
    with pytest.raises(NotImplementedError):
        pipe.make_expand_fn()
