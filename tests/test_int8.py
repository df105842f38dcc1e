"""int8 w8a8 inference mode (ops/quant.py + QConv/QDense + config.int8).

Covers: numerical parity of the Q layers with nn.Conv/nn.Dense when the
flag is off (the default path must stay bit-identical to r4), bounded
quantization error when on, and the pipeline split — int8 only in the
plain denoise spans, never the guidance leg (eps_fn(exact=True)).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from flax import linen as nn  # noqa: E402

from distdiff_tpu.models.layers import QConv, QDense
from distdiff_tpu.ops import quant


def test_qconv_matches_nnconv_when_disabled():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 16), jnp.float32)
    qc = QConv(24, (3, 3))
    p = qc.init(jax.random.PRNGKey(0), x)
    ref_mod = nn.Conv(24, (3, 3), padding=1, dtype=jnp.bfloat16)
    out_q = qc.apply(p, x)
    out_ref = ref_mod.apply(p, x)
    np.testing.assert_array_equal(np.asarray(out_q, np.float32),
                                  np.asarray(out_ref, np.float32))
    # strided variant (Downsample)
    qs = QConv(24, (3, 3), strides=(2, 2))
    ps = qs.init(jax.random.PRNGKey(1), x)
    ref_s = nn.Conv(24, (3, 3), strides=(2, 2), padding=1, dtype=jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(qs.apply(ps, x), np.float32),
        np.asarray(ref_s.apply(ps, x), np.float32))


def test_qdense_matches_nndense_when_disabled():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, 16), jnp.float32)
    qd = QDense(32)
    p = qd.init(jax.random.PRNGKey(0), x)
    ref = nn.Dense(32, dtype=jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(qd.apply(p, x), np.float32),
        np.asarray(ref.apply(p, x), np.float32))


def test_int8_quant_error_bounded():
    """w8a8 with per-channel weight scales: relative error ~1e-2 on
    well-conditioned inputs (the approximation the mode trades on)."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(64, 48), jnp.float32)
    w = jnp.asarray(rng.randn(48, 32) / np.sqrt(48), jnp.float32)
    exact = np.asarray(x @ w)
    q = np.asarray(quant.qdot(x, w, out_dtype=jnp.float32))
    rel = np.abs(q - exact).max() / np.abs(exact).max()
    assert 1e-4 < rel < 3e-2, rel  # small but NOT exact (int8 really ran)

    xc = jnp.asarray(rng.randn(1, 8, 8, 16), jnp.float32)
    wc = jnp.asarray(rng.randn(3, 3, 16, 16) / 12.0, jnp.float32)
    from jax import lax

    exact_c = np.asarray(lax.conv_general_dilated(
        xc, wc, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    qc = np.asarray(quant.qconv(xc, wc, out_dtype=jnp.float32))
    rel_c = np.abs(qc - exact_c).max() / np.abs(exact_c).max()
    assert 1e-4 < rel_c < 3e-2, rel_c


def test_int8_context_routes_layers():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 16), jnp.float32)
    qc = QConv(16, (3, 3))
    p = qc.init(jax.random.PRNGKey(0), x)
    off = np.asarray(qc.apply(p, x), np.float32)
    with quant.int8_inference():
        on = np.asarray(qc.apply(p, x), np.float32)
    assert not quant.int8_enabled()
    assert np.abs(on - off).max() > 0  # path switched
    rel = np.abs(on - off).max() / (np.abs(off).max() + 1e-9)
    assert rel < 5e-2


def _tiny_pipe(int8):
    import dataclasses

    from distdiff_tpu.config import GuidanceConfig, PipelineConfig
    from distdiff_tpu.models.guide import create_model
    from distdiff_tpu.sampling import ExpansionPipeline, SamplerConfig

    rng = np.random.RandomState(0)
    config = PipelineConfig.tiny(sample_size=32)
    config = dataclasses.replace(config, int8=int8)
    guide = create_model("tiny_resnet", num_classes=4, input_size=32)
    return ExpansionPipeline.create(
        config,
        sampler_cfg=SamplerConfig(guidance_scale=3.0),
        guidance_cfg=GuidanceConfig(
            guidance_type="transform_guidance", guidance_step=4,
            guidance_period=2, K=2, guide_input_size=32,
        ),
        guide=guide,
        global_protos=rng.randn(4, guide.feature_dim).astype(np.float32),
        local_protos=rng.randn(4, 2, guide.feature_dim).astype(np.float32),
    )


def test_pipeline_int8_spans_guide_exact():
    """config.int8 changes the span output (int8 really active) but the
    guidance leg's eps_fn(exact=True) stays bit-identical to the bf16
    pipeline — guidance energies/gradients never see quantization."""
    rng = np.random.RandomState(0)
    pipe_bf = _tiny_pipe(False)
    pipe_q = _tiny_pipe(True)
    params = pipe_bf.params  # same seed -> same tree
    x = jnp.asarray(rng.randn(2, 4, 4, 4), jnp.float32)
    cond = jnp.asarray(rng.randn(2, 8, 32), jnp.float32)
    uncond = jnp.asarray(rng.randn(2, 8, 32), jnp.float32)
    t = jnp.asarray(3)

    e_bf = np.asarray(jax.jit(pipe_bf.eps_fn())(params, x, t, cond, uncond),
                      np.float32)
    e_q = np.asarray(jax.jit(pipe_q.eps_fn())(params, x, t, cond, uncond),
                     np.float32)
    assert np.abs(e_q - e_bf).max() > 0  # int8 active in the span eps

    e_exact = np.asarray(
        jax.jit(pipe_q.eps_fn(exact=True))(params, x, t, cond, uncond),
        np.float32)
    np.testing.assert_array_equal(e_exact, e_bf)  # guide leg untouched


def test_sdxl_sample_runs_with_int8():
    """config.int8 routes the SDXL t2i eps through the w8a8 path too
    (sampling/sdxl.py; bench --preset sdxl --int8)."""
    import dataclasses

    from distdiff_tpu.config import PipelineConfig
    from distdiff_tpu.sampling.sdxl import SDXLPipeline

    cfg = dataclasses.replace(PipelineConfig.sdxl_tiny(sample_size=32),
                              int8=True)
    pipe = SDXLPipeline.create(cfg, seed=0)
    rng = np.random.RandomState(0)
    ls = cfg.latent_size
    d = cfg.unet.cross_attention_dim
    lat = jnp.zeros((1, ls, ls, 4), jnp.float32)
    ctx = jnp.asarray(rng.randn(1, 8, d), jnp.float32)
    pooled = jnp.asarray(
        rng.randn(1, cfg.text_encoder_2.embed_dim), jnp.float32)
    add = pipe.added_cond(pooled)
    sample = jax.jit(pipe.make_sample_fn(text_to_img=True))
    out = sample(pipe.params, lat, ctx, add,
                 jnp.zeros_like(ctx), jax.tree.map(jnp.zeros_like, add),
                 jax.random.PRNGKey(0))
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_split_expand_runs_with_int8():
    pipe = _tiny_pipe(True)
    rng = np.random.RandomState(0)
    b = 2
    ls = pipe.config.latent_size
    lat = np.asarray(rng.randn(b, ls, ls, 4), np.float32) * 0.2
    cond = np.asarray(rng.randn(b, 8, 32), np.float32)
    uncond = np.asarray(rng.randn(b, 8, 32), np.float32)
    targets = np.arange(b, dtype=np.int32) % 4
    keys = np.stack([np.asarray(jax.random.PRNGKey(i)) for i in range(b)])
    se = pipe.make_split_expand()
    out = se(pipe.full_params(), lat, cond, uncond, targets, keys)
    assert out.shape == (b, pipe.config.sample_size,
                         pipe.config.sample_size, 3)
    assert np.isfinite(np.asarray(out)).all()
