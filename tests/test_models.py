"""Shape/dtype/grad smoke tests for the Flax SD components (tiny configs).

Everything is jitted: this host has one CPU core, and eager per-op dispatch
is ~100x slower than a single compiled program (which also hits the
persistent compilation cache across pytest runs).
"""

import jax
import jax.numpy as jnp
import numpy as np

from distdiff_tpu.config import PipelineConfig
from distdiff_tpu.models import AutoencoderKL, CLIPTextEncoder, UNet2DCondition


def _tiny():
    return PipelineConfig.tiny(sample_size=32)


def test_unet_shapes_and_grad():
    cfg = _tiny()
    unet = UNet2DCondition(cfg.unet)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 4, 4, 4), jnp.float32)
    ctx = jnp.zeros((2, 16, cfg.unet.cross_attention_dim), jnp.float32)
    params = jax.jit(unet.init)(key, x, jnp.array([1]), ctx)
    out = jax.jit(unet.apply)(params, x, jnp.array([10, 20]), ctx)
    assert out.shape == (2, 4, 4, 4)
    assert out.dtype == jnp.float32

    # guidance differentiates through the UNet: grad wrt input must exist
    g = jax.jit(
        jax.grad(lambda z: jnp.sum(unet.apply(params, z, jnp.array([5]), ctx) ** 2))
    )(x)
    assert g.shape == x.shape
    assert bool(jnp.any(g != 0))


def test_vae_roundtrip_shapes_and_grad():
    cfg = _tiny()
    vae = AutoencoderKL(cfg.vae)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 32, 32, 3))
    params = jax.jit(vae.init)(key, x)
    mean, logvar = jax.jit(lambda p, xx: vae.apply(p, xx, method=vae.encode_moments))(
        params, x
    )
    # two blocks -> one downsample -> 16x16 latents
    assert mean.shape == (1, 16, 16, 4) and logvar.shape == mean.shape

    encode = jax.jit(lambda p, xx: vae.apply(p, xx, method=vae.encode))
    decode = jax.jit(lambda p, zz: vae.apply(p, zz, method=vae.decode))
    z = encode(params, x)
    rec = decode(params, z)
    assert rec.shape == x.shape

    # stochastic encode draws from the posterior
    z2 = jax.jit(lambda p, xx, k: vae.apply(p, xx, k, method=vae.encode))(
        params, x, jax.random.PRNGKey(1)
    )
    assert bool(jnp.any(z2 != z))

    # decoder must be differentiable wrt latents (energy guidance path)
    g = jax.jit(
        jax.grad(lambda zz: jnp.sum(vae.apply(params, zz, method=vae.decode) ** 2))
    )(z)
    assert g.shape == z.shape and bool(jnp.any(g != 0))


def test_text_encoder_causality():
    cfg = _tiny()
    te = CLIPTextEncoder(cfg.text_encoder)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 999, (2, 16)), jnp.int32)
    params = jax.jit(te.init)(jax.random.PRNGKey(0), ids)
    apply = jax.jit(te.apply)
    out = apply(params, ids)
    assert out.shape == (2, 16, cfg.text_encoder.hidden_size)

    # causal: changing a late token must not affect earlier positions
    ids2 = ids.at[:, 10].set((ids[:, 10] + 1) % 999)
    out2 = apply(params, ids2)
    np.testing.assert_allclose(
        np.asarray(out[:, :10]), np.asarray(out2[:, :10]), atol=1e-5
    )
    assert bool(jnp.any(jnp.abs(out[:, 10:] - out2[:, 10:]) > 1e-6))
