"""SDXL pipeline assembly (VERDICT r1 #10 stretch): dual text encoders,
pooled + time-id additive conditioning, converter coverage against the
published SDXL geometry, and a tiny-geometry end-to-end sample — including
the full diffusers-layout load path on a synthesized SDXL checkpoint.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from distdiff_tpu.config import PipelineConfig
from distdiff_tpu.sampling.sdxl import (
    SDXLPipeline,
    default_time_ids,
    time_ids_embedding,
)
from distdiff_tpu.weights.sd15_geometry import (
    PARAM_TOTALS,
    sdxl_text2_state_shapes,
    sdxl_unet_state_shapes,
)


def test_sdxl_enumerations_match_published_totals():
    total = sum(int(np.prod(s)) for s in sdxl_unet_state_shapes().values())
    assert total == PARAM_TOTALS["sdxl_unet"], total
    total2 = sum(int(np.prod(s)) for s in sdxl_text2_state_shapes().values())
    assert total2 == PARAM_TOTALS["sdxl_text2"], total2


def test_real_sdxl_key_coverage_is_exact():
    """EVERY diffusers SDXL-base key converts onto our full-geometry
    templates: 0 missing / 0 extra / 0 mismatched (shape-only check —
    broadcast views keep the 2.57B-param tree memory-free)."""
    from distdiff_tpu.weights.convert import (
        build_param_templates,
        convert_state_dict,
        map_text_key,
        map_unet_key,
        unflatten,
        validate_against_template,
    )

    tpl = build_param_templates(PipelineConfig.sdxl_base(), sdxl=True)
    for comp, shapes, mapper in (
        ("unet", sdxl_unet_state_shapes(), map_unet_key),
        ("text_2", sdxl_text2_state_shapes(), map_text_key),
    ):
        state = {k: np.broadcast_to(np.float32(0), s)
                 for k, s in shapes.items()}
        converted = unflatten(convert_state_dict(state, mapper))
        m, e, x = validate_against_template(converted, tpl[comp])
        assert not (m or e or x), (comp, m[:5], e[:5], x[:5])


def test_time_ids_embedding_shape_and_convention():
    ids = default_time_ids(2, 1024)
    assert ids.shape == (2, 6)
    emb = time_ids_embedding(ids, 256)
    assert emb.shape == (2, 6 * 256)
    # 1280 pooled + 1536 = 2816: SDXL-base's addition_embed_dim
    assert 1280 + emb.shape[-1] == 2816


@pytest.fixture(scope="module")
def tiny_pipe():
    cfg = PipelineConfig.sdxl_tiny(sample_size=32)
    return SDXLPipeline.create(cfg, seed=0)


def test_sdxl_tiny_conditioning_shapes(tiny_pipe):
    pipe = tiny_pipe
    cfg = pipe.config
    ids1 = jnp.zeros((2, cfg.text_encoder.max_length), jnp.int32).at[:, 0].set(5)
    ids2 = jnp.zeros((2, cfg.text_encoder_2.max_length), jnp.int32).at[:, 0].set(9)
    ctx, pooled = jax.jit(pipe.encode_prompt)(pipe.params, ids1, ids2)
    d = cfg.text_encoder.hidden_size + cfg.text_encoder_2.hidden_size
    assert ctx.shape == (2, cfg.text_encoder.max_length, d)
    assert pooled.shape == (2, cfg.text_encoder_2.embed_dim)
    add = pipe.added_cond(pooled)
    assert add.shape == (2, cfg.unet.addition_embed_dim)


def test_sdxl_tiny_end_to_end_sample(tiny_pipe):
    pipe = tiny_pipe
    cfg = pipe.config
    ids1 = jnp.zeros((2, cfg.text_encoder.max_length), jnp.int32).at[:, 0].set(5)
    ids2 = jnp.zeros((2, cfg.text_encoder_2.max_length), jnp.int32).at[:, 0].set(9)
    ctx, pooled = pipe.encode_prompt(pipe.params, ids1, ids2)
    uctx, upooled = pipe.encode_prompt(pipe.params, ids1 * 0, ids2 * 0)
    sample = jax.jit(pipe.make_sample_fn(text_to_img=True))
    lat = jnp.zeros((2, cfg.latent_size, cfg.latent_size, 4), jnp.float32)
    img = np.asarray(sample(
        pipe.params, lat, ctx, pipe.added_cond(pooled),
        uctx, pipe.added_cond(upooled), jax.random.PRNGKey(0),
    ))
    assert img.shape == (2, 32, 32, 3)
    assert np.isfinite(img).all() and img.min() >= 0 and img.max() <= 1


def test_sdxl_synth_checkpoint_converts_strict(tmp_path):
    """The diffusers-layout SDXL load path end-to-end at tiny geometry:
    write -> convert (strict, all four components) -> sample."""
    from distdiff_tpu.weights.convert import convert_sdxl_checkpoint
    from distdiff_tpu.weights.synth import write_synth_checkpoint

    cfg = PipelineConfig.sdxl_tiny(sample_size=32)
    ckpt = write_synth_checkpoint(str(tmp_path / "sdxl"), cfg, seed=5,
                                  tokenizer=False)
    params = convert_sdxl_checkpoint(ckpt, config=cfg)  # strict: raises on gaps
    assert set(params) == {"unet", "vae", "text", "text_2"}

    pipe = SDXLPipeline.create(cfg, params=params)
    ids1 = jnp.zeros((1, cfg.text_encoder.max_length), jnp.int32)
    ids2 = jnp.zeros((1, cfg.text_encoder_2.max_length), jnp.int32)
    ctx, pooled = pipe.encode_prompt(params, ids1, ids2)
    sample = jax.jit(pipe.make_sample_fn(text_to_img=True))
    lat = jnp.zeros((1, cfg.latent_size, cfg.latent_size, 4), jnp.float32)
    img = np.asarray(sample(params, lat, ctx, pipe.added_cond(pooled),
                            ctx, pipe.added_cond(pooled),
                            jax.random.PRNGKey(1)))
    assert img.shape == (1, 32, 32, 3) and np.isfinite(img).all()
