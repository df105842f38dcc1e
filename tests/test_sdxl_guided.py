"""SDXL as a first-class guided-expansion target (VERDICT r2 #2).

The reference is SD-1.x-only (``generate_data.py:166-172``); these tests
pin the beyond-reference SDXL path through the SAME engine contract the
reference defines for SD (``generate_data.py:687-767,1130-1245``): img2img
init -> CFG DDIM -> transform/direct guidance at the window -> decode —
with SDXL's dual-tower {"ctx","add"} conditioning pytree flowing through
ExpansionPipeline, SplitExpand, chunked guidance, the dataset/driver, and
the generate_data CLI.
"""

import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from distdiff_tpu.config import GuidanceConfig, PipelineConfig
from distdiff_tpu.models.guide import create_model
from distdiff_tpu.sampling import ExpansionPipeline, SamplerConfig

CLASSES = ("alpha", "beta")


def _sdxl_pipe(guidance_type="transform_guidance", strength=0.5):
    config = PipelineConfig.sdxl_tiny(sample_size=32)
    guide = create_model("tiny_resnet", num_classes=2, input_size=32)
    rng = np.random.RandomState(0)
    gp = rng.randn(2, guide.feature_dim).astype(np.float32)
    lp = rng.randn(2, 2, guide.feature_dim).astype(np.float32)
    return ExpansionPipeline.create(
        config,
        sampler_cfg=SamplerConfig(guidance_scale=5.0),
        guidance_cfg=GuidanceConfig(
            guidance_type=guidance_type, guidance_step=4,
            guidance_period=2, K=2, guide_input_size=32,
        ),
        guide=guide, global_protos=gp, local_protos=lp,
        strength=strength,
    )


def _sdxl_batch(pipe, b=2, seed=3):
    rng = np.random.RandomState(seed)
    ls = pipe.config.latent_size
    lat = jnp.asarray(rng.randn(b, ls, ls, 4), jnp.float32) * 0.13
    tl = pipe.config.text_encoder.max_length
    ids = jnp.asarray(rng.randint(1, 900, (b, tl)), jnp.int32)
    uids = jnp.zeros_like(ids)
    cond = pipe.encode_text_pair(pipe.params, ids, ids)
    uncond = pipe.encode_text_pair(pipe.params, uids, uids)
    targets = jnp.asarray(rng.randint(0, 2, b))
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(b))
    return lat, cond, uncond, targets, keys


def test_encode_text_pair_shapes():
    pipe = _sdxl_pipe()
    _, cond, _, _, _ = _sdxl_batch(pipe)
    assert set(cond) == {"ctx", "add"}
    b, tl = 2, pipe.config.text_encoder.max_length
    assert cond["ctx"].shape == (b, tl,
                                 pipe.config.unet.cross_attention_dim)
    assert cond["add"].shape == (b, pipe.config.unet.addition_embed_dim)


@pytest.mark.parametrize("gtype", ["transform_guidance", "direct_guidance"])
def test_sdxl_guided_expand(gtype):
    """Fused guided expansion runs on the SDXL geometry and produces
    finite [0,1] images; guidance changes the output vs 'none'."""
    pipe = _sdxl_pipe(gtype)
    args = _sdxl_batch(pipe)
    out = jax.jit(pipe.make_expand_fn())(pipe.full_params(), *args)
    img = np.asarray(out)
    assert img.shape == (2, 32, 32, 3)
    assert np.isfinite(img).all()
    assert img.min() >= 0.0 and img.max() <= 1.0

    unguided = _sdxl_pipe("none")
    unguided.params = pipe.params  # same weights, no guidance
    out_u = jax.jit(unguided.make_expand_fn())(unguided.full_params(), *args)
    assert not np.allclose(np.asarray(out), np.asarray(out_u))


def test_sdxl_split_matches_fused():
    pipe = _sdxl_pipe()
    args = _sdxl_batch(pipe)
    fused = jax.jit(pipe.make_expand_fn())(pipe.full_params(), *args)
    split = pipe.make_split_expand()(pipe.full_params(), *args)
    np.testing.assert_allclose(np.asarray(split), np.asarray(fused),
                               atol=2e-4, rtol=2e-4)


def test_sdxl_guide_chunk_dict_cond():
    """Chunked guidance slices the {"ctx","add"} pytree leaf-wise and is
    exact (per-sample energies are independent)."""
    pipe = _sdxl_pipe()
    lat, cond, uncond, targets, keys = _sdxl_batch(pipe, b=4)
    whole = pipe.make_split_expand()(
        pipe.full_params(), lat, cond, uncond, targets, keys)
    chunked = pipe.make_split_expand(guide_chunk=2)(
        pipe.full_params(), lat, cond, uncond, targets, keys)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(whole),
                               atol=2e-5, rtol=2e-5)


def test_cond_helpers_on_dicts():
    from distdiff_tpu.sampling.conditioning import (
        cond_concat,
        cond_index,
        cond_leading_dim,
        cond_slice,
        cond_stack,
    )

    a = {"ctx": np.arange(24.0).reshape(4, 3, 2), "add": np.arange(8.0).reshape(4, 2)}
    assert cond_leading_dim(a) == 4
    s = cond_slice(a, 1, 3)
    assert s["ctx"].shape == (2, 3, 2) and s["add"].shape == (2, 2)
    i = cond_index(a, 2)
    assert i["ctx"].shape == (3, 2) and np.allclose(i["add"], a["add"][2])
    st = cond_stack([i, i, i])
    assert st["ctx"].shape == (3, 3, 2)
    cc = cond_concat({"ctx": jnp.ones((2, 3)), "add": jnp.ones((2, 1))},
                     {"ctx": jnp.zeros((2, 3)), "add": jnp.zeros((2, 1))})
    assert cc["ctx"].shape == (4, 3)


def _write_img(path, color, size=(20, 20)):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.new("RGB", size, color).save(path)


@pytest.fixture(scope="module")
def toy_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    base = root / "medmnist" / "breastmnist"
    for ci, cat in enumerate(CLASSES):
        shade = 40 + 170 * ci
        for k in range(3):
            _write_img(str(base / "train" / cat / f"img_{k}.png"),
                       (shade, shade // 2, 10 + k))
        _write_img(str(base / "test" / cat / "t_0.png"),
                   (shade, shade // 2, 200))
    return str(root)


def test_cli_generate_data_sdxl_tiny(toy_root, tmp_path, monkeypatch):
    """generate_data --model sdxl: guided SDXL expansion end-to-end through
    the CLI, dataset (dict embeds), driver, and PNG contract."""
    from distdiff_tpu.cli import generate_data as cli_gen

    monkeypatch.chdir(tmp_path)
    out = str(tmp_path / "out")
    stats = cli_gen.main([
        "-d", "breastmnist", "--data_root", toy_root, "--tiny",
        "--model", "sdxl",
        "--guidance_type", "transform_guidance", "--guidance_step", "4",
        "--guidance_period", "2", "--K", "2",
        "--num_images_per_prompt", "1", "--train_batch_size", "1",
        "--max_units", "8", "--output_dir", out, "--seed", "0",
        "--resolution", "32",
    ])
    assert stats["written"] > 0
    written = []
    for cat in CLASSES:
        cdir = os.path.join(out, cat)
        if os.path.isdir(cdir):
            written += [f for f in os.listdir(cdir) if "_expand_" in f]
    assert written, "no SDXL expansion PNGs written"
